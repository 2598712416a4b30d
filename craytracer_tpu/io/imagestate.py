"""Progressive-render checkpoint/resume.

The reference's image-state file stores (spp, dims, raw float accumulator)
(imagestate.h:5-43, resumed via `-s` at main.cpp:195-254). Ours is the same
concept as an .npz pytree: accumulator + spp + RNG seed, so a render can be
stopped and resumed bit-identically (the counter-based sampler needs no
stream state).
"""

from __future__ import annotations

import numpy as np


def save_image_state(path: str, accum: np.ndarray, spp: int, seed: int):
    np.savez(path, accum=np.asarray(accum, np.float32), spp=np.int64(spp),
             seed=np.int64(seed))


def load_image_state(path: str):
    d = np.load(path if path.endswith(".npz") else path + ".npz")
    return d["accum"], int(d["spp"]), int(d["seed"])


def ppm_to_image_state(ppm_path: str, spp: int = 1):
    """Reconstruct an accumulator from a tone-mapped PPM
    (ppmToImageState, main.cpp:169-184): invert gamma + the exposure map
    and scale by spp. Lossy (the tone map clips), but lets a render resume
    from an image whose raw state was lost."""
    from craytracer_tpu.io.image import read_ppm

    img = read_ppm(ppm_path).astype(np.float32) / 255.0
    # invert tone_map: r = (1 - exp(-2 L))^(1/2.2)
    lin = np.clip(1.0 - np.power(img, 2.2), 1e-6, 1.0)
    radiance = -np.log(lin) / 2.0
    return (radiance.reshape(-1, 3) * spp).astype(np.float32)


def read_reference_is(path: str):
    """Read the reference's native `savestate.is` (imagestate.h:5-20):
    ASCII "spp\\n" "width height\\n" followed by width*height*3 raw f32.
    Returns (accum [H*W, 3] float32 SUM over spp, spp, width, height)."""
    with open(path, "rb") as f:
        data = f.read()
    nl1 = data.index(b"\n")
    nl2 = data.index(b"\n", nl1 + 1)
    spp = int(data[:nl1])
    width, height = (int(x) for x in data[nl1 + 1:nl2].split())
    accum = np.frombuffer(data[nl2 + 1:], np.float32,
                          count=width * height * 3).reshape(-1, 3)
    return accum.copy(), spp, width, height


def write_reference_is(path: str, accum: np.ndarray, spp: int,
                       width: int, height: int):
    """Write the reference's `savestate.is` format so a render made here
    can seed the reference binary's `-s` resume path (main.cpp:195-254)."""
    accum = np.ascontiguousarray(np.asarray(accum, np.float32).reshape(-1))
    if accum.size != width * height * 3:
        raise ValueError("accumulator size does not match dimensions")
    with open(path, "wb") as f:
        f.write(f"{spp}\n{width} {height}\n".encode())
        f.write(accum.tobytes())
