"""Ray reordering for traversal coherence (trip-count reduction).

The reference traverses rays one CPU thread at a time, so ray order is
irrelevant there (intersect.h:61-194 walks each ray independently). On
TPU the cost model is different: the Pallas traversal kernel
(accel/pallas_bvh4.py) runs one while-loop PER RAY BLOCK, so a block's
wall time is its own worst lane's node-visit count. Secondary wavefront
rays arrive shuffled (diffuse bounces, NEE toward scattered lights) and
every block inherits the global worst case; sorting rays so that each
block holds spatially/directionally coherent rays lowers the per-block
max — the classic wavefront-tracing compaction/ordering step (Garanzha
& Loop style key = quantized origin Morton + direction octant).

The monolithic XLA while_loop traversal (accel/bvh4.py) runs ONE loop
over the whole batch, whose trip count is the global max — ordering
cannot help it. Sorting is therefore wired only to the Pallas path.

Everything here is jit-safe: keys are computed from batch statistics
(origin min/max), the permutation is one argsort, and results scatter
back to ray order, so callers see a pure drop-in traversal.
"""

from __future__ import annotations

import jax.numpy as jnp


def _part1by2(x):
    """Spread the low 10 bits of x so consecutive bits land 3 apart."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton3(q):
    """[N,3] uint32 (each < 2^10) -> [N] interleaved 30-bit Morton code."""
    return (_part1by2(q[:, 0])
            | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))


def ray_key(o, d, pos_bits: int = 6, dir_major: bool = False):
    """Coherence sort key per ray.

    pos_bits quantization of origin inside the batch's own AABB (adapts
    to whatever surface the bounce scattered from), Morton-interleaved;
    direction octant as the 3-bit tiebreak. dir_major flips the nesting
    (octant first) — better when the scene is small and direction
    divergence dominates traversal order.
    """
    # ESCAPE rays (retired wavefront lanes parked at |o| ~ 3e18,
    # integrator/wavefront.py) must not stretch the batch AABB: quantize
    # against the box of REAL origins only; escapes all land in the top
    # cell together (they retire on their first round anyway).
    real = (jnp.abs(o) < 1.0e17).all(axis=1)
    big = jnp.where(real[:, None], o, -jnp.inf)
    small = jnp.where(real[:, None], o, jnp.inf)
    lo = jnp.min(small, axis=0)
    hi = jnp.max(big, axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    scale = (1 << pos_bits) / jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((jnp.clip(o, lo, hi) - lo) * scale).astype(jnp.uint32), 0,
                 (1 << pos_bits) - 1)
    # quantized axes promoted to the Morton bit positions: with
    # pos_bits<10 shift up so the most significant quantization bit sits
    # at Morton bit 3*pos_bits (keeps keys dense, order unchanged)
    code = morton3(q)
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    if dir_major:
        return (octant << (3 * pos_bits)) | code
    return (code << 3) | octant


def sorted_traversal(traverse_fn, o, d, pos_bits: int = 6,
                     dir_major: bool = False):
    """Run traverse_fn(o, d) -> (t, tri) with rays in coherence order.

    Results are scattered back to the caller's ray order, so this is a
    pure drop-in. Costs one argsort + two gathers + two scatters — pays
    for itself only when the traversal backend has per-block loop trip
    counts (the Pallas kernel); see module docstring.
    """
    n = o.shape[0]
    perm = jnp.argsort(ray_key(o, d, pos_bits, dir_major))
    t_s, tri_s = traverse_fn(jnp.take(o, perm, axis=0),
                             jnp.take(d, perm, axis=0))
    t = jnp.zeros((n,), t_s.dtype).at[perm].set(t_s)
    tri = jnp.zeros((n,), tri_s.dtype).at[perm].set(tri_s)
    return t, tri
