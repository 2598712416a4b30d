"""Generate the full-fidelity scale scene: OBJ + MTL with per-group
materials (textured matte, named-preset metals, glass, plastic,
emissive), a normal-mapped textured floor, and an HDR EXR environment
light — the San-Miguel-class demonstration the reference's gallery makes
(README.md:14-17; MTL parse objloader/objloader.h:487+, texture pipeline
texture.cpp:27-86, EXR env maps imagefile.h:11-34).

Emits into scenes/:
  fullscene.obj / fullscene.mtl   (~590k triangles, 8 material groups)
  fullscene_checker.png           floor diffuse (marble-ish checker)
  fullscene_noise.png             sphere diffuse (value-noise blotch)
  fullscene_normal.png            floor tangent-space normal map (ripples)
  fullscene_env.exr               lat-long sky gradient + sun (HDR)
  fullscene.txt                   scene file (MESH ... MATERIAL FROM_MTL)

Usage: python scenes/make_fullscene.py [--spheres 400]
"""

from __future__ import annotations

import argparse
import io
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))  # repo root for craytracer_tpu


def write_png(path, arr01):
    from PIL import Image

    Image.fromarray((np.clip(arr01, 0, 1) * 255).astype(np.uint8)).save(path)


def make_textures():
    # marble-ish checker: 512^2, checker of warm/cool stone + veins
    n = 512
    yy, xx = np.mgrid[0:n, 0:n] / n
    check = ((xx * 8).astype(int) + (yy * 8).astype(int)) % 2
    rng = np.random.default_rng(7)
    # smooth value noise for veins
    g = rng.random((33, 33))
    gi = np.clip((yy * 32), 0, 31.999)
    gj = np.clip((xx * 32), 0, 31.999)
    i0, j0 = gi.astype(int), gj.astype(int)
    fi, fj = gi - i0, gj - j0
    fi, fj = fi * fi * (3 - 2 * fi), fj * fj * (3 - 2 * fj)
    noise = (g[i0, j0] * (1 - fi) * (1 - fj) + g[i0 + 1, j0] * fi * (1 - fj)
             + g[i0, j0 + 1] * (1 - fi) * fj + g[i0 + 1, j0 + 1] * fi * fj)
    vein = 0.5 + 0.5 * np.sin((xx + noise * 0.6) * 40)
    base = np.where(check[..., None] == 1,
                    np.array([0.75, 0.72, 0.68]), np.array([0.35, 0.33, 0.38]))
    tex = base * (0.8 + 0.2 * vein[..., None])
    write_png(os.path.join(HERE, "fullscene_checker.png"), tex)

    # blotchy noise diffuse for matte spheres
    blotch = np.stack([0.9 - 0.5 * noise, 0.55 - 0.25 * noise ** 2,
                       0.35 + 0.3 * noise], axis=-1)
    write_png(os.path.join(HERE, "fullscene_noise.png"), blotch)

    # floor normal map: radial ripples, tangent space (0.5,0.5,1)-centered
    cx, cy = 0.5, 0.5
    r = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    h = 0.08 * np.sin(r * 80 + noise * 4)
    dhdx = np.gradient(h, axis=1) * n
    dhdy = np.gradient(h, axis=0) * n
    nrm = np.stack([-dhdx, -dhdy, np.ones_like(h)], axis=-1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    write_png(os.path.join(HERE, "fullscene_normal.png"), nrm * 0.5 + 0.5)


def make_env():
    """Lat-long HDR sky: horizon glow + blue gradient + a hot sun disk."""
    from craytracer_tpu.io.exr import write_exr

    H, W = 128, 256
    v = (np.arange(H) + 0.5) / H       # 0 top .. 1 bottom
    u = (np.arange(W) + 0.5) / W
    uu, vv = np.meshgrid(u, v)
    elev = (0.5 - vv) * np.pi           # +pi/2 up .. -pi/2 down
    sky_t = np.clip(np.sin(elev), 0, 1)
    img = (np.array([0.35, 0.55, 0.95])[None, None] * sky_t[..., None] ** 0.7
           + np.array([0.9, 0.55, 0.35])[None, None]
           * (np.exp(-np.abs(elev[..., None]) * 3.0)))
    # below-horizon: dim ground bounce
    img = np.where(elev[..., None] < 0,
                   np.array([0.18, 0.15, 0.12])[None, None]
                   * np.exp(elev[..., None] * 2), img)
    # sun at azimuth 0.3*2pi, elev 35deg
    sun_az, sun_el = 0.3 * 2 * np.pi, np.radians(35)
    az = uu * 2 * np.pi
    cosang = (np.sin(elev) * np.sin(sun_el)
              + np.cos(elev) * np.cos(sun_el) * np.cos(az - sun_az))
    # soft wide sun: bright but low-variance under uniform env NEE
    img = img + np.array([1.0, 0.9, 0.7])[None, None] * (
        60.0 * (cosang[..., None] > np.cos(np.radians(4.0)))
        + 10.0 * np.exp((cosang[..., None] - 1) * 25))
    write_exr(os.path.join(HERE, "fullscene_env.exr"), img.astype(np.float32))


MTL = """# full-fidelity bench materials
newmtl floor
Kd 0.8 0.8 0.8
map_Kd fullscene_checker.png
map_bump fullscene_normal.png

newmtl blotch
Kd 0.7 0.7 0.7
map_Kd fullscene_noise.png

newmtl GOLD
Kd 0.1 0.1 0.1
Ks 0.9 0.7 0.3
Ns 600
illum 3

newmtl SILVER
Kd 0.1 0.1 0.1
Ks 0.9 0.9 0.9
Ns 1200
illum 3

newmtl COPPER
Kd 0.1 0.1 0.1
Ks 0.9 0.5 0.35
Ns 300
illum 3

newmtl glass
Kd 0 0 0
Ks 0.9 0.9 0.9
Ni 1.5
d 0.1
illum 7

newmtl plastic_blue
Kd 0.1 0.2 0.6
Ks 0.5 0.5 0.5
Ns 90
illum 2

newmtl lamp
Kd 0 0 0
Ke 14 12 9
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spheres", type=int, default=380)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--xl", action="store_true",
                    help="San-Miguel-scale variant (VERDICT r4 item 3): "
                         "~2.7M triangles WITH the full material/texture "
                         "complement — sphere field at icosphere level 4 "
                         "(5120 tris each), boulders at level 6 (81920), "
                         "450 spheres; emits fullscene_xl.{obj,txt} "
                         "sharing fullscene.mtl + textures + env")
    args = ap.parse_args()

    from make_fixtures import icosphere

    prefix = "fullscene_xl" if args.xl else "fullscene"
    sph_level, bld_level = (4, 6) if args.xl else (3, 5)
    if args.xl and args.spheres == 380:
        args.spheres = 450

    make_textures()
    make_env()
    with open(os.path.join(HERE, "fullscene.mtl"), "w") as f:
        f.write(MTL)

    rng = np.random.default_rng(11)
    buf = io.StringIO()
    buf.write("mtllib fullscene.mtl\n")
    vbase = 1  # OBJ 1-indexed
    tbase = 1

    def emit(verts, faces, uvs, norms, group, mtl):
        nonlocal vbase, tbase
        np.savetxt(buf, verts, fmt="v %.5f %.5f %.5f")
        if uvs is not None:
            np.savetxt(buf, uvs, fmt="vt %.5f %.5f")
        if norms is not None:
            np.savetxt(buf, norms, fmt="vn %.4f %.4f %.4f")
        buf.write(f"g {group}\nusemtl {mtl}\n")
        f = faces + vbase
        if uvs is not None and norms is not None:
            t = faces + tbase
            rows = np.stack([f[:, 0], t[:, 0], f[:, 0], f[:, 1], t[:, 1],
                             f[:, 1], f[:, 2], t[:, 2], f[:, 2]], axis=1)
            np.savetxt(buf, rows, fmt="f %d/%d/%d %d/%d/%d %d/%d/%d")
            tbase += (uvs.shape[0])
        elif uvs is not None:
            t = faces + tbase
            rows = np.stack([f[:, 0], t[:, 0], f[:, 1], t[:, 1],
                             f[:, 2], t[:, 2]], axis=1)
            np.savetxt(buf, rows, fmt="f %d/%d %d/%d %d/%d")
            tbase += (uvs.shape[0])
        else:
            np.savetxt(buf, f, fmt="f %d %d %d")
        vbase += verts.shape[0]

    # ---- floor: 64x64 grid, 120x120 units, UV tiled 6x
    n = 64
    ext = 60.0
    g = np.linspace(-ext, ext, n + 1)
    gx, gz = np.meshgrid(g, g)
    fverts = np.stack([gx.ravel(), np.zeros(gx.size), gz.ravel()], axis=-1)
    fuv = np.stack([(gx.ravel() / ext + 1) * 3, (gz.ravel() / ext + 1) * 3],
                   axis=-1)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    a, b, c, d = (idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel(),
                  idx[1:, 1:].ravel(), idx[1:, :-1].ravel())
    ffaces = np.concatenate([np.stack([a, b, c], axis=-1),
                             np.stack([a, c, d], axis=-1)])
    emit(fverts, ffaces, fuv, None, "floor", "floor")

    # ---- sphere field
    v3, f3 = icosphere(sph_level)   # 1280 tris (5120 in --xl)
    v5, f5 = icosphere(bld_level)   # 20480 tris (81920 in --xl boulders)
    uv3 = np.stack([0.5 + np.arctan2(v3[:, 2], v3[:, 0]) / (2 * np.pi),
                    0.5 - np.arcsin(np.clip(v3[:, 1], -1, 1)) / np.pi], axis=-1)
    groups = ["blotch", "GOLD", "SILVER", "COPPER", "glass", "plastic_blue"]
    weights = [0.34, 0.13, 0.13, 0.12, 0.14, 0.14]
    count = args.spheres
    grid_n = int(np.ceil(np.sqrt(count)))
    step = 2 * (ext - 4) / grid_n
    k = 0
    for i in range(grid_n):
        for j in range(grid_n):
            if k >= count:
                break
            c = np.array([-(ext - 4) + (i + 0.5) * step + rng.normal(0, 0.5),
                          0.0,
                          -(ext - 4) + (j + 0.5) * step + rng.normal(0, 0.5)])
            s = 0.55 + rng.random() * 0.9
            c[1] = s  # resting on the floor
            mtl = groups[rng.choice(len(groups), p=weights)]
            emit(v3 * s + c, f3, uv3 if mtl == "blotch" else None,
                 v3 if mtl != "blotch" else None, f"s{k}", mtl)
            k += 1

    # ---- three big boulders (smooth, high-res)
    for bi, (bx, bz, bs, mtl) in enumerate(
            [(-18, -12, 6.0, "blotch"), (14, 6, 7.5, "GOLD"),
             (2, -25, 5.0, "glass")]):
        c = np.array([bx, bs * 0.8, bz])
        uv5 = np.stack([0.5 + np.arctan2(v5[:, 2], v5[:, 0]) / (2 * np.pi),
                        0.5 - np.arcsin(np.clip(v5[:, 1], -1, 1)) / np.pi],
                       axis=-1)
        emit(v5 * bs + c, f5, uv5 if mtl == "blotch" else None,
             v5 if mtl != "blotch" else None, f"boulder{bi}", mtl)

    # ---- two emissive lamp spheres
    for li, (lx, lz) in enumerate([(-8, 14), (22, -18)]):
        c = np.array([lx, 6.0, lz])
        emit(v3 * 1.8 + c, f3, None, None, f"lamp{li}", "lamp")

    with open(os.path.join(HERE, f"{prefix}.obj"), "w") as f:
        f.write(buf.getvalue())
    ntris = buf.getvalue().count("\nf ") + 1

    scene = f"""WINDOW_WIDTH {args.size}
WINDOW_HEIGHT {args.size}
IMAGE_WIDTH {args.size}
IMAGE_HEIGHT {args.size}
FOV 55.0
CAMERA_POS -42 30 55
LOOK_POINT 6 0 -8

MATERIAL MATTE
NAME unused
COLOR 0.5 0.5 0.5
SIGMA 0.0
END

END_MATERIALS

ENV_LIGHT
TYPE TEXTURE
COLOR fullscene_env.exr
INTENSITY 1.0
IMPORTANCE yes

OBJECT MESH
FILE_NAME {prefix}.obj
SMOOTH yes
SCALING 1 1 1
LOCATION 0 0 0
ORIENTATION 0 0 0
MATERIAL FROM_MTL
"""
    with open(os.path.join(HERE, f"{prefix}.txt"), "w") as f:
        f.write(scene)
    print(f"wrote {prefix}.obj (~{ntris} face rows), {prefix}.txt, "
          f"textures, env EXR")


if __name__ == "__main__":
    main()
