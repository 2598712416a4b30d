"""Texture lookups over the packed texel pool.

The reference does nearest-neighbor sampling with mirror wrapping
(getTexColor, texture.cpp:27-86). A bilinear variant is provided for
differentiable texture optimization (nearest has zero gradient w.r.t. uv but
full gradient w.r.t. texels either way).
"""

from __future__ import annotations

import jax.numpy as jnp

from craytracer_tpu.ops.gather import take_rows
from craytracer_tpu.scene.types import TexturePack


def _mirror(x):
    """Mirror-wrap a coordinate in texel units into [0, 1)."""
    m = jnp.mod(x, 2.0)
    return jnp.where(m > 1.0, 2.0 - m, m)


def tex_lookup_nearest(pack: TexturePack, tex_id, uv):
    """[N] tex ids (-1 allowed; returns junk there, caller masks), [N,2] uv
    -> [N,3] texels."""
    tid = jnp.maximum(tex_id, 0)
    w, h, off = take_rows(tid, (pack.width, pack.height, pack.offset))
    u = _mirror(uv[..., 0])
    v = _mirror(uv[..., 1])
    x = jnp.clip((u * w.astype(uv.dtype)).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h.astype(uv.dtype)).astype(jnp.int32), 0, h - 1)
    return jnp.take(pack.texels, off + y * w + x, axis=0)


def tex_lookup_bilinear(pack: TexturePack, tex_id, uv):
    tid = jnp.maximum(tex_id, 0)
    w, h, off = take_rows(tid, (pack.width, pack.height, pack.offset))
    u = _mirror(uv[..., 0]) * w.astype(uv.dtype) - 0.5
    v = _mirror(uv[..., 1]) * h.astype(uv.dtype) - 0.5
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        return jnp.take(pack.texels, off + yi * w + xi, axis=0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )
