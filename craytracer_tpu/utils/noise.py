"""Lattice value noise + turbulence + fBm, vectorized.

Re-implements the reference's procedural noise (noise.cpp:24-258): a
256-entry permutation table hashing lattice coordinates into a random value
table, trilinear or tricubic (Catmull-Rom) interpolation, and the fractal
sums. The reference wires this to nothing by default (SURVEY.md §2 #22 —
"dead-ish feature"); here it is usable as a procedural texture source.

All functions take `[..., 3]` points and broadcast.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

TABLE_SIZE = 256
MASK = TABLE_SIZE - 1


def make_tables(seed: int = 0):
    """(perm_table[256] int32, value_table[256] f32 in [-1, 1])."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(TABLE_SIZE).astype(np.int32)
    values = (rng.random(TABLE_SIZE) * 2.0 - 1.0).astype(np.float32)
    return jnp.asarray(perm), jnp.asarray(values)


_DEFAULT_PERM, _DEFAULT_VALUES = None, None


def _tables(perm, values):
    global _DEFAULT_PERM, _DEFAULT_VALUES
    if perm is None or values is None:
        if _DEFAULT_PERM is None:
            _DEFAULT_PERM, _DEFAULT_VALUES = make_tables(0)
        return _DEFAULT_PERM, _DEFAULT_VALUES
    return perm, values


def _lattice(ix, iy, iz, perm, values):
    """value_table[perm[ix + perm[iy + perm[iz]]]] (noise.cpp:8-17)."""
    p = lambda a: jnp.take(perm, a & MASK)
    return jnp.take(values, p(ix + p(iy + p(iz))))


def value_noise_linear(p, perm=None, values=None):
    """Trilinear lattice noise (linNoise, noise.cpp)."""
    perm, values = _tables(perm, values)
    ip = jnp.floor(p).astype(jnp.int32)
    f = p - jnp.floor(p)
    ix, iy, iz = ip[..., 0], ip[..., 1], ip[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def lat(dx, dy, dz):
        return _lattice(ix + dx, iy + dy, iz + dz, perm, values)

    c000, c100 = lat(0, 0, 0), lat(1, 0, 0)
    c010, c110 = lat(0, 1, 0), lat(1, 1, 0)
    c001, c101 = lat(0, 0, 1), lat(1, 0, 1)
    c011, c111 = lat(0, 1, 1), lat(1, 1, 1)
    x00 = c000 + fx * (c100 - c000)
    x10 = c010 + fx * (c110 - c010)
    x01 = c001 + fx * (c101 - c001)
    x11 = c011 + fx * (c111 - c011)
    y0 = x00 + fy * (x10 - x00)
    y1 = x01 + fy * (x11 - x01)
    return y0 + fz * (y1 - y0)


def _catmull_rom(t, k0, k1, k2, k3):
    """Four-knot spline (fourKnotSpline, noise.cpp SSE path)."""
    c3 = -0.5 * k0 + 1.5 * k1 - 1.5 * k2 + 0.5 * k3
    c2 = k0 - 2.5 * k1 + 2.0 * k2 - 0.5 * k3
    c1 = 0.5 * (-k0 + k2)
    c0 = k1
    return ((c3 * t + c2) * t + c1) * t + c0


def value_noise_cubic(p, perm=None, values=None):
    """Tricubic lattice noise (cubicNoise, noise.cpp), clipped to [-1, 1]."""
    perm, values = _tables(perm, values)
    ip = jnp.floor(p).astype(jnp.int32)
    f = p - jnp.floor(p)
    ix, iy, iz = ip[..., 0], ip[..., 1], ip[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    zs = []
    for dz in (-1, 0, 1, 2):
        ys = []
        for dy in (-1, 0, 1, 2):
            xs = [
                _lattice(ix + dx, iy + dy, iz + dz, perm, values)
                for dx in (-1, 0, 1, 2)
            ]
            ys.append(_catmull_rom(fx, *xs))
        zs.append(_catmull_rom(fy, *ys))
    return jnp.clip(_catmull_rom(fz, *zs), -1.0, 1.0)


def turbulence(p, num_octaves: int = 3, perm=None, values=None,
               noise_fn=value_noise_linear):
    """sum |noise(2^i p)| / 2^i, normalized (turbulenceNoise, noise.cpp)."""
    fs_max = sum(0.5 ** i for i in range(num_octaves))
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    amp = 1.0
    freq = 1.0
    for _ in range(num_octaves):
        acc = acc + amp * jnp.abs(noise_fn(p * freq, perm, values))
        amp *= 0.5
        freq *= 2.0
    return acc / fs_max


def fbm(p, num_octaves: int = 3, gain: float = 0.5, lacunarity: float = 2.0,
        perm=None, values=None, noise_fn=value_noise_linear):
    """Fractal Brownian motion mapped to [0, 1] (fBm, noise.cpp:243-258)."""
    fs_max = sum(gain ** i for i in range(num_octaves))
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    amp = 1.0
    freq = 1.0
    for _ in range(num_octaves):
        acc = acc + amp * noise_fn(p * freq, perm, values)
        amp *= gain
        freq *= lacunarity
    return (acc + fs_max) / (2.0 * fs_max)
