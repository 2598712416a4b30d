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
