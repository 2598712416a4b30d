"""Sample-space warps, matching the reference's mappings.

`map_to_disk_polar` / `map_to_hemisphere_cosine` mirror `mapSampleToDisk` /
`mapSampleToHemisphere` (sampling.cpp:606-620): polar disk map (phi = 2 pi u0,
r = sqrt(u1)) lifted to the cosine-weighted hemisphere. The concentric
(Shirley) map mirrors `mapSamplesToDisk` (sampling.cpp:354-409) used for lens
sample tables.
"""

from __future__ import annotations

import jax.numpy as jnp

from craytracer_tpu.constants import PI, TWO_PI


def map_to_disk_polar(u):
    """[..., 2] uniforms -> [..., 2] points on the unit disk (polar warp)."""
    phi = TWO_PI * u[..., 0]
    r = jnp.sqrt(u[..., 1])
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def map_to_disk_concentric(u):
    """Shirley's concentric warp (lower distortion), branchless."""
    ox = 2.0 * u[..., 0] - 1.0
    oy = 2.0 * u[..., 1] - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    sx = jnp.where(jnp.abs(ox) < 1e-12, 1e-12, ox)
    sy = jnp.where(jnp.abs(oy) < 1e-12, 1e-12, oy)
    r = jnp.where(use_x, jnp.abs(ox), jnp.abs(oy))
    theta = jnp.where(use_x, (PI / 4.0) * (oy / sx), (PI / 2.0) - (PI / 4.0) * (ox / sy))
    r = jnp.where(zero, 0.0, r)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def map_to_hemisphere_cosine(u):
    """[..., 2] uniforms -> [..., 3] cosine-weighted local directions (z-up).
    pdf = cos(theta) / pi."""
    d = map_to_disk_polar(u)
    z = jnp.sqrt(jnp.maximum(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2, 1e-12))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def map_to_cos_power(u, e):
    """Phong-lobe warp (mapSampleWithCosPower, sampling.cpp:627-637)."""
    phi = TWO_PI * u[..., 0]
    cos_t = jnp.power(1.0 - jnp.abs(u[..., 1]), 1.0 / (e + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
