"""Generate the golden-parity fixture scenes.

The reference's committed scene files predate its committed parser:
cornell_box.txt / example_scene.txt write materials in a legacy dialect
(SHADOWED / AMB_COLOR / DIFF_COLOR ...) that parseMatteEntry
(scene/scenefile.h:132-176) reads positionally as NAME / COLOR / SIGMA —
so the reference binary renders cornell with black "white" walls and the
ambient color names on the side walls. They also lack the film header
setupFilmAndCamera requires (buildscene.h:344-386 spins at EOF without
WINDOW_WIDTH).

Parity fixtures therefore are written in the dialect the parser actually
implements: this script emits

* parity_cornell.txt — the cornell_box.txt geometry (objects + camera
  verbatim) with its materials re-declared in the modern grammar and a
  256x256 film header;
* parity_test2.txt — test_scene2.txt (already modern dialect) with the
  film header prepended.

Both renderers consume the SAME generated files; the reference binary's
savestate.is raw accumulator is the golden.
"""

from __future__ import annotations

import os
import re

REF = os.environ.get("REF", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "scenes")

HEADER = """WINDOW_WIDTH 256
WINDOW_HEIGHT 256
IMAGE_WIDTH 256
IMAGE_HEIGHT 256
FOV 38.0
"""

CORNELL_MATERIALS = """
MATERIAL MATTE
NAME floor
COLOR 0.740064 0.742313 0.733934
SIGMA 0.0
END

MATERIAL MATTE
NAME ceiling
COLOR 0.740064 0.742313 0.733934
SIGMA 0.0
END

MATERIAL MATTE
NAME backwall
COLOR 0.740064 0.742313 0.733934
SIGMA 0.0
END

MATERIAL MATTE
NAME leftwall
COLOR 0.366046 0.0371827 0.0416385
SIGMA 0.0
END

MATERIAL MATTE
NAME rightwall
COLOR 0.162928 0.408903 0.0833759
SIGMA 0.0
END

MATERIAL EMISSIVE
NAME emissive1
COLOR 1 0.85 0.5
INTENSITY 90
END

END_MATERIALS
"""


SCALE = 1.0 / 548.8  # world scale -> ~unit box

_VEC_KEYS = ("POINT", "WIDTH", "HEIGHT", "V0", "V1", "V2", "CENTER",
             "CAMERA_POS", "LOOK_POINT")
_SCALAR_KEYS = ("RADIUS",)


def _rescale(text: str) -> str:
    """Scale all geometry to ~unit size. Radiometrically invariant (the
    area pdf's d^2/area conversion cancels the scale), but it puts the
    scene where the reference's ABSOLUTE K_EPSILON=7e-6 t-cull
    (util/constants.h:45) actually works: at the original |p|~550 scale
    the reference self-shadows its own box triangles (f32 hit points err
    by ~1e-2 >> 7e-6), which is deterministic acne, not MC noise."""
    out = []
    for line in text.splitlines():
        parts = line.split()
        if parts and parts[0] in _VEC_KEYS and len(parts) >= 4:
            try:
                vals = [float(x) * SCALE for x in parts[1:4]]
                line = f"{parts[0]} {vals[0]:.9g} {vals[1]:.9g} {vals[2]:.9g}"
            except ValueError:
                pass
        elif parts and parts[0] in _SCALAR_KEYS and len(parts) >= 2:
            try:
                line = f"{parts[0]} {float(parts[1]) * SCALE:.9g}"
            except ValueError:
                pass
        out.append(line)
    return "\n".join(out) + "\n"


def make_cornell() -> str:
    src = open(os.path.join(REF, "cornell_box.txt")).read()
    cam = "CAMERA_POS 278.0 273.0 800.0\nLOOK_POINT 278.0 273.0 0.0\n"
    # objects: everything from the first ENV_LIGHT on (the commented-out
    # sphere block rides along as ignored stray tokens, as in the original)
    objs = src[src.index("ENV_LIGHT"):]
    # Replace the original lamp construction — TWO COINCIDENT rects
    # (normals up/down) 0.8 world units under the ceiling — with one
    # down-facing lamp well below it. The coincident pair makes the
    # reference's good_paths ratio estimator (trace.h:528) diverge between
    # implementations: with the lamp 0.0015 units from the ceiling,
    # epsilon-level shadow decisions flip whether a near-lamp NEE event
    # counts, which changes the DIVISOR, not just the sum — that is
    # deterministic epsilon sensitivity, not Monte-Carlo noise.
    lamp_up = ("OBJECT RECTANGLE\nPOINT 213.0 548 -227.0\nWIDTH 130 0.0 0.0\n"
               "HEIGHT 0.0 0.0 -105\nMATERIAL emissive1\n")
    lamp_dn = ("OBJECT RECTANGLE\nPOINT 343 548 -227.0\nWIDTH -130 0.0 0.0\n"
               "HEIGHT 0.0 0.0 -105\nMATERIAL emissive1\n")
    single = ("OBJECT RECTANGLE\nPOINT 343 500 -227.0\nWIDTH -130 0.0 0.0\n"
              "HEIGHT 0.0 0.0 -105\nMATERIAL emissive1\n")
    assert lamp_up in objs and lamp_dn in objs
    # The lamp must be the LAST object: the reference's shadow loop
    # early-outs on the FIRST object with t < light_dist (intersect.h:
    # 487-498), and a shadow ray's endpoint lies ON the lamp itself, where
    # the lamp-rect t rounds below light_dist about half the time; with
    # the lamp ordered before an occluder, that early-out masks the real
    # occluder and the reference renders shadows at ~half strength —
    # per-sample f32 luck no reimplementation can reproduce. Lamp-last
    # ordering makes its early-out semantics equal to a true min.
    objs = objs.replace(lamp_up, "").replace(lamp_dn, "") + "\n" + single
    return HEADER + _rescale(cam + CORNELL_MATERIALS + "\n" + objs)


MIX_SCENE = """CAMERA_POS 0 1.2 4.2
LOOK_POINT 0 0.8 0

MATERIAL MATTE
NAME grey
COLOR 0.73 0.73 0.73
SIGMA 0.0
END

MATERIAL MATTE
NAME rough_blue
COLOR 0.2 0.3 0.7
SIGMA 20.0
END

MATERIAL PLASTIC
NAME red_plastic
KD 0.6 0.05 0.05
KS 0.4 0.4 0.4
ROUGHNESS 0.08
END

MATERIAL MIRROR
NAME chrome
COLOR 0.9 0.9 0.9
END

MATERIAL METAL
NAME gold
TYPE GOLD
ROUGHNESS 0.15
END

MATERIAL EMISSIVE
NAME lamp
COLOR 1 0.95 0.85
INTENSITY 12
END

END_MATERIALS

ENV_LIGHT
TYPE CONSTANT
COLOR WHITE
INTENSITY 0

OBJECT RECTANGLE
POINT -3 0 -3
WIDTH 6 0 0
HEIGHT 0 0 6
MATERIAL grey

OBJECT RECTANGLE
POINT -3 0 -2
WIDTH 6 0 0
HEIGHT 0 3.5 0
MATERIAL grey

OBJECT SPHERE
RADIUS 0.6
CENTER -1.4 1.0 0.2
PHI 3.14159
MIN_THETA 0
MAX_THETA 3.14159
MATERIAL red_plastic

OBJECT SPHERE
RADIUS 0.6
CENTER 0.0 1.0 -0.6
PHI 3.14159
MIN_THETA 0
MAX_THETA 3.14159
MATERIAL gold

OBJECT SPHERE
RADIUS 0.6
CENTER 1.4 1.0 0.2
PHI 3.14159
MIN_THETA 0
MAX_THETA 3.14159
MATERIAL chrome

OBJECT SPHERE
RADIUS 0.35
CENTER 0.0 1.6 0.9
PHI 3.14159
MIN_THETA 0
MAX_THETA 3.14159
MATERIAL rough_blue

OBJECT RECTANGLE
POINT -1.0 3.2 -1.0
WIDTH 2.0 0 0
HEIGHT 0 0 2.0
MATERIAL lamp
"""


def make_mix() -> str:
    """Mixed-material parity scene in the parser's own dialect: matte
    (Lambertian + Oren-Nayar), two-lobe plastic, mirror, conductor metal
    (GOLD preset, materials.cpp:5-20), one big area lamp at a sane
    distance. test_scene2.txt cannot serve here: it is the coffee scene
    and its OBJ meshes are not in the repo.

    All spheres FLOAT above the floor: the reference's sphere tests call
    acos((y-cy)/r) UNCLAMPED (sphere.cpp:57,111); near the poles f32
    rounding yields acos(>1)=NaN, the theta-clip comparison fails, and
    the sphere stops occluding — floor-CONTACT shadows (rays through
    both poles) leak ~half their light in the reference, a f32-luck
    artifact no reimplementation can reproduce deterministically.
    Floating spheres keep shadow chords equatorial where both renderers
    agree."""
    return HEADER + MIX_SCENE


PRIMS_SCENE = """CAMERA_POS 0 1.2 4.2
LOOK_POINT 0 0.8 0

MATERIAL MATTE
NAME grey
COLOR 0.73 0.73 0.73
SIGMA 0.0
END

MATERIAL MATTE
NAME red
COLOR 0.65 0.1 0.08
SIGMA 0.0
END

MATERIAL MATTE
NAME blue
COLOR 0.15 0.25 0.7
SIGMA 0.0
END

MATERIAL MATTE
NAME green
COLOR 0.15 0.55 0.2
SIGMA 0.0
END

MATERIAL EMISSIVE
NAME lamp
COLOR 1 0.95 0.85
INTENSITY 12
END

END_MATERIALS

ENV_LIGHT
TYPE CONSTANT
COLOR WHITE
INTENSITY 0

OBJECT RECTANGLE
POINT -3 0 -3
WIDTH 6 0 0
HEIGHT 0 0 6
MATERIAL grey

OBJECT RECTANGLE
POINT -3 0 -2
WIDTH 6 0 0
HEIGHT 0 3.5 0
MATERIAL grey

OBJECT TORUS
SWEPT_RADIUS 0.5
TUBE_RADIUS 0.15
PHI 3.14159
LOCATION -1.3 0.65 0.3
SCALE 1 1 1
ORIENTATION 0 0 0
MATERIAL red

OBJECT BOX
LENGTH 0.8
HEIGHT 0.8
WIDTH 0.8
LOCATION -0.4 0.3 -0.9
SCALE 1 1 1
ORIENTATION 0 0 0
MATERIAL green

OBJECT DISK
CENTER 1.4 1.2 0.2
NORMAL -0.4 0.3 1
RADIUS 0.5
MATERIAL blue

OBJECT RECTANGLE
POINT -1.0 3.2 -1.0
WIDTH 2.0 0 0
HEIGHT 0 0 2.0
MATERIAL lamp
"""


def make_prims() -> str:
    """Analytic-primitive parity scene: torus + instanced box + disk (the
    L1 shape families parity_cornell/parity_mix do not touch), all matte,
    one big lamp LAST (see make_mix for why).

    No OPENCYLINDER: the reference's cylinder direct lighting is ~2.3x
    above exact quadrature (verified 2026-08-18; our render matches the
    quadrature within MC noise) — its shadow ray starts exactly ON the
    quadric, the near root clears K_EPSILON by f32 luck most of the time
    (falsely self-occluding, shapes/generic.cpp:82-124), and the
    good-paths ratio estimator (trace.h:528) then divides by the reduced
    contributing count, inflating the mean by the failure rate. That is
    per-sample f32 luck no reimplementation can reproduce; the
    quadrature-anchored tests/test_quadrature.py cylinder case covers the
    shape instead."""
    return HEADER + PRIMS_SCENE


MESH_HEADER = """WINDOW_WIDTH 128
WINDOW_HEIGHT 128
IMAGE_WIDTH 128
IMAGE_HEIGHT 128
FOV 38.0
"""

MESH_SCENE = """CAMERA_POS 0 1.4 4.0
LOOK_POINT 0 0.7 0

MATERIAL MATTE
NAME floor
COLOR 0.72 0.72 0.72
SIGMA 0.0
END

MATERIAL MATTE
NAME ball
COLOR 0.25 0.4 0.75
SIGMA 0.0
END

MATERIAL EMISSIVE
NAME lamp
COLOR 1 0.95 0.85
INTENSITY 12
END

END_MATERIALS

ENV_LIGHT
TYPE CONSTANT
COLOR WHITE
INTENSITY 0

OBJECT RECTANGLE
POINT -4 0 -4
WIDTH 8 0 0
HEIGHT 0 0 8
MATERIAL floor

OBJECT MESH
FILE_NAME icosphere_small.obj
SMOOTH no
SCALING 0.8 0.8 0.8
LOCATION 0 0.9 0
ORIENTATION 0 0 0
MATERIAL ball

OBJECT RECTANGLE
POINT -1.0 3.2 -1.0
WIDTH 2.0 0 0
HEIGHT 0 0 2.0
MATERIAL lamp
"""


def make_mesh() -> str:
    """OBJECT MESH parity scene: flat-shaded icosphere_small.obj (320
    tris) over a matte floor, one lamp LAST (see make_mix). SMOOTH no:
    flat normals remove the vertex-normal-averaging order dependence.
    The headless reference HANGS nondeterministically on mesh scenes
    (an environment-dependent infinite loop in its render loop, see
    refbuild/run_ref_golden.sh) — the golden is captured by retrying
    until a run completes; the scene itself parses and renders fine.
    128x128 film: the reference runs single-threaded at -O0 and brute-
    forces 320 tris + rects; 256^2 x 256spp would exceed the retry
    harness timeout even on a healthy run."""
    return MESH_HEADER + MESH_SCENE


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "parity_cornell.txt"), "w") as f:
        f.write(make_cornell())
    with open(os.path.join(OUT, "parity_mix.txt"), "w") as f:
        f.write(make_mix())
    with open(os.path.join(OUT, "parity_prims.txt"), "w") as f:
        f.write(make_prims())
    with open(os.path.join(OUT, "parity_mesh.txt"), "w") as f:
        f.write(make_mesh())
    print("wrote", OUT + "/parity_cornell.txt", OUT + "/parity_mix.txt",
          OUT + "/parity_prims.txt", OUT + "/parity_mesh.txt")


if __name__ == "__main__":
    main()
