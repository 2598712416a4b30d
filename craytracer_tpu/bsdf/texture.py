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


def _ref_wrap(x):
    """getTexColor's coordinate wrap (texture.cpp:29-40): negatives are
    reflected (|x|), coordinates past 1 fold back as 1 - frac(x)."""
    x = jnp.abs(x)
    return jnp.where(x > 1.0, 1.0 - (x - jnp.floor(x)), x)


def nearest_texel_xy(w, h, u, v):
    """Reference-exact nearest texel addressing (getTexColor,
    texture.cpp:27-73): wrap, flip v (v_float = 1 - v before scaling),
    round-half-down ((int)x + 1 only when frac > 0.5), then modulo.
    The modulo makes row 0 cover slivers of BOTH poles — preserved, it is
    image-visible at texel scale. Returns (x, y) int32."""
    uf = _ref_wrap(u) * w.astype(u.dtype)
    vf = (1.0 - _ref_wrap(v)) * h.astype(v.dtype)
    xi = jnp.floor(uf)
    xi = jnp.where(uf - xi > 0.5, xi + 1.0, xi).astype(jnp.int32) % w
    yi = jnp.floor(vf)
    yi = jnp.where(vf - yi > 0.5, yi + 1.0, yi).astype(jnp.int32) % h
    return xi, yi


def tex_lookup_nearest(pack: TexturePack, tex_id, uv):
    """[N] tex ids (-1 allowed; returns junk there, caller masks), [N,2] uv
    -> [N,3] texels. Bit-faithful to getTexColor's addressing (wrap, v
    flip, rounding) — the float-/255 quirk alone stays a documented
    deviation (io/teximage.py)."""
    tid = jnp.maximum(tex_id, 0)
    w, h, off = take_rows(tid, (pack.width, pack.height, pack.offset))
    x, y = nearest_texel_xy(w, h, uv[..., 0], uv[..., 1])
    return jnp.take(pack.texels, off + y * w + x, axis=0)


def tex_lookup_bilinear(pack: TexturePack, tex_id, uv):
    """Beyond-reference smooth variant for texture optimization. Texel
    centers sit at INTEGER coordinates of the same wrapped/flipped grid as
    the nearest lookup, so both sample the same orientation (nearest is
    the round of this interpolant's argument)."""
    tid = jnp.maximum(tex_id, 0)
    w, h, off = take_rows(tid, (pack.width, pack.height, pack.offset))
    u = _ref_wrap(uv[..., 0]) * w.astype(uv.dtype)
    v = (1.0 - _ref_wrap(uv[..., 1])) * h.astype(uv.dtype)
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
