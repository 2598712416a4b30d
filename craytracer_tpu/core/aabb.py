"""Batched AABB ops (slab test) — reference `aabb.cpp:89` re-shaped for SoA.

Boxes are (mins[..., 3], maxs[..., 3]); rays are (origin[..., 3], inv_dir[..., 3]).
The slab test is fully branchless and handles inf inv_dir (axis-parallel rays)
the IEEE way, matching the robust-slab convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def ray_aabb(origin, inv_dir, box_min, box_max, t_min=0.0, t_max=jnp.inf):
    """Returns (hit, t_near, t_far). Shapes broadcast across leading dims."""
    t0 = (box_min - origin) * inv_dir
    t1 = (box_max - origin) * inv_dir
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_max)
    return t_near <= t_far, t_near, t_far


def union(mins_a, maxs_a, mins_b, maxs_b):
    return jnp.minimum(mins_a, mins_b), jnp.maximum(maxs_a, maxs_b)


def contains(box_min, box_max, p):
    return jnp.all((p >= box_min) & (p <= box_max), axis=-1)
