"""Numerical constants shared across the framework.

Mirrors the reference's `util/constants.h:44-49` conventions where behavior
parity matters (epsilons, TMAX sentinel, preset colors used by the scene-file
grammar `scene/scenefile.h:18-62`).
"""

import numpy as np

# Ray-intersection epsilon (reference util/constants.h:45).
K_EPSILON = 7.0e-6
K_SMALLVALUE = 1.0e-7
K_HUGEVALUE = 1.0e10

# Miss sentinel. The reference uses FLT_MAX (util/constants.h:48); we keep a
# finite f32 value so comparisons and selects stay NaN-free under AD.
TMAX = np.float32(3.4028235e38)

PI = float(np.pi)
INV_PI = float(1.0 / np.pi)
TWO_PI = float(2.0 * np.pi)

# Shadow-ray robustness: the reference compares `t < distance - K_EPSILON`
# (trace.h:348) with an absolute epsilon that is too small for f32 at scene
# scale ~550; we use a relative guard as well.
SHADOW_REL_EPS = 1.0e-3

# Preset colors accepted by the scene grammar (scene/scenefile.h:18-62,
# util/constants.h:30-39).
PRESET_COLORS = {
    "RED": (1.0, 0.0, 0.0),
    "GREEN": (0.0, 1.0, 0.0),
    "BLUE": (0.0, 0.0, 1.0),
    "WHITE": (1.0, 1.0, 1.0),
    "BLACK": (0.0, 0.0, 0.0),
    "YELLOW": (1.0, 1.0, 0.0),
    "CYAN": (0.0, 1.0, 1.0),
    "PINK": (1.0, 0.0, 1.0),
    "GREY": (0.5, 0.5, 0.5),
    "MED_ORCHID": (0.729, 0.333, 0.827),
}

# Slightly-off vertical used to build stable bases for disks/env sampling
# (util/constants.h:27).
JITTERED_UP = (0.0072, 1.0, 0.0034)

# Named conductor IOR presets (materials.cpp:5-20).
METAL_PRESETS = {
    "GOLD": ((0.14282006, 0.37414363, 1.43944442), (3.90463543, 2.44763327, 2.13765264)),
    "SILVER": ((0.154935181, 0.116475478, 0.138087392), (4.81810093, 3.11561656, 2.1424017)),
    "BERYLLIUM": ((4.17617416, 3.1783011, 2.77819276), (3.82729554, 3.00373626, 2.86292768)),
    "CHROMIUM": ((4.36040831, 2.9105196, 1.65118635), (5.19538164, 4.22238398, 3.74699736)),
    "CESIUM": ((2.14034843, 1.69870293, 1.65889668), (0.0, 0.0, 0.0)),
    "COPPER": ((0.19999069, 0.92208463, 1.09987593), (3.90463543, 2.44763327, 2.13765264)),
    "MERCURY": ((2.39383841, 1.43696785, 0.907622635), (6.31419611, 4.36266136, 3.41453838)),
}
