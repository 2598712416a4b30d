"""Generate the textured golden-parity fixture (VERDICT r4 item 4): the
texture pipeline anchored against the actual reference binary.

Exercises, image-level: u8 diffuse textures on a RECT (getTexColor wrap/
flip/round addressing, texture.cpp:27-86) and on a SMOOTH mesh (uv
interpolation + the [0,1] uv wrap, shapes/triangle.cpp:237-242), and a
texture (EXR) environment light (readRgba1 imagefile.h:11-34, radiance
lookup lights.cpp:233-248, the hardcoded rotate_y(-0.76) transform
buildscene.h:516, and the float-/255 getTexColor quirk texture.cpp:78 —
matched at capture/test time via CRAY_TEX_FLOAT_DIV255=1).

Deliberately NOT exercised: normal mapping. The reference's normal-map
application (getSmoothTriangleShadeRec, shapes/triangle.cpp:270-305) is
DEAD CODE in the shipped binary — its only call site sits inside the
commented-out SIMD block at intersect.h:15-21, and the live smooth-triangle
path (rayIntersectSmoothTriangle, shapes/triangle.cpp:218-254) never reads
the normal map. Our implementation follows the intended-but-unreachable
math with a documented remap deviation (integrator/wavefront.py).

Emits into scenes/:
  parity_tex_checker.ppm   8x8 u8 color checker (P6: the refbuild stb stub
                           reads PPM, the one format stb_image supports that
                           needs no vendored decoder)
  parity_tex_env.exr       16x32 HDR sky gradient + sun patch
  parity_tex_quad.obj      5x5-vertex gently-bumped quad grid, vt in [0,1]
  parity_textured.txt      the scene (lamp LAST: see tests/test_reference_
                           parity.py docstring on the shadow early-out)
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def make_checker(path):
    c0 = np.array([230, 60, 40], np.uint8)    # warm red
    c1 = np.array([240, 235, 220], np.uint8)  # off-white
    img = np.zeros((8, 8, 3), np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    img[(yy + xx) % 2 == 0] = c0
    img[(yy + xx) % 2 == 1] = c1
    from PIL import Image

    Image.fromarray(img).save(path)


def make_env(path):
    H, W = 16, 32
    img = np.zeros((H, W, 3), np.float32)
    # vertical gradient: bright cool top rows -> warm dim horizon -> dark
    t = np.linspace(0.0, 1.0, H)[:, None, None]
    top = np.array([1.0, 1.3, 1.8], np.float32)
    bot = np.array([0.35, 0.22, 0.12], np.float32)
    img[:] = top * (1 - t) + bot * t
    # sun patch (kept modest: the reference divides float texels by 255,
    # so the scene sets INTENSITY 220 to land ~unit radiance either way)
    img[4, 9] = (24.0, 20.0, 14.0)
    img[4, 10] = (18.0, 15.0, 10.0)
    from craytracer_tpu.io.exr import write_exr

    write_exr(path, img)


def make_quad(path, n=4, size=1.6, bump=0.12):
    """(n+1)^2-vertex quad grid in the xz plane with gentle sine bumps —
    smooth vertex normals vary across the surface, uv spans [0,1]^2."""
    lines = ["# parity_tex_quad: bumped quad grid"]
    for j in range(n + 1):
        for i in range(n + 1):
            u, v = i / n, j / n
            x = (u - 0.5) * size
            z = (v - 0.5) * size
            y = bump * np.sin(np.pi * u) * np.sin(np.pi * v)
            lines.append(f"v {x:.6f} {y:.6f} {z:.6f}")
    for j in range(n + 1):
        for i in range(n + 1):
            lines.append(f"vt {i / n:.6f} {j / n:.6f}")
    idx = lambda i, j: j * (n + 1) + i + 1
    for j in range(n):
        for i in range(n):
            a, b = idx(i, j), idx(i + 1, j)
            c, d = idx(i + 1, j + 1), idx(i, j + 1)
            lines.append(f"f {a}/{a} {b}/{b} {c}/{c}")
            lines.append(f"f {a}/{a} {c}/{c} {d}/{d}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


SCENE = """WINDOW_WIDTH 128
WINDOW_HEIGHT 128
IMAGE_WIDTH 128
IMAGE_HEIGHT 128
FOV 38.0
CAMERA_POS 0 1.1 3.6
LOOK_POINT 0 0.7 0

MATERIAL MATTE
NAME floor
COLOR 0.62 0.62 0.62
SIGMA 0.0
END

MATERIAL MATTE
NAME checker
TEXTURE parity_tex_checker.ppm
SIGMA 0.0
END

MATERIAL EMISSIVE
NAME lamp
COLOR 1 0.93 0.82
INTENSITY 9
END

END_MATERIALS

ENV_LIGHT
TYPE TEXTURE
COLOR parity_tex_env.exr
INTENSITY 220

OBJECT RECTANGLE
POINT -2 0 -2
WIDTH 4 0 0
HEIGHT 0 0 4
MATERIAL floor

OBJECT RECTANGLE
POINT -1.5 0 -1.4
WIDTH 3 0 0
HEIGHT 0 2 0
MATERIAL checker

OBJECT MESH
FILE_NAME parity_tex_quad.obj
SMOOTH yes
SCALING 1 1 1
LOCATION 0 0.25 0.6
ORIENTATION 0 0 0
MATERIAL checker

OBJECT RECTANGLE
POINT -0.5 2.4 -0.7
WIDTH 1 0 0
HEIGHT 0 0 1
MATERIAL lamp
"""


def main():
    make_checker(os.path.join(HERE, "parity_tex_checker.ppm"))
    make_env(os.path.join(HERE, "parity_tex_env.exr"))
    make_quad(os.path.join(HERE, "parity_tex_quad.obj"))
    with open(os.path.join(HERE, "parity_textured.txt"), "w") as f:
        f.write(SCENE)
    print("wrote parity_tex_{checker.ppm,env.exr,quad.obj} + parity_textured.txt")


if __name__ == "__main__":
    main()
