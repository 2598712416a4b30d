"""Fused SoA row lookup tuned for TPU.

XLA lowers each `jnp.take(table, idx)` on TPU to a latency-bound gather:
measured ~1.2ms per call at N=262k lanes on a v5e chip, nearly independent
of table size and row width (the cost is per-descriptor, not per-byte).
The wavefront pipeline performs dozens of such lookups per bounce
(material params, light fields, hit-attribute fill); issued separately
they dominated the whole per-bounce time in round-1 profiling.

`take_rows` gathers rows from MANY parallel SoA arrays with ONE fused
operation. All fields are packed column-wise into a single [M, K] f32
matrix — packing is loop-invariant, so XLA hoists it out of the bounce
loop — and the lookup is either

* a one-hot [N, M] @ [M, K] matmul at `Precision.HIGHEST` for small
  tables: bit-exact (measured equal to `jnp.take` output on TPU — the
  6-pass bf16 decomposition reconstructs each f32 exactly when every
  product multiplies by 0.0 or 1.0) and ~2.5x faster than a single
  gather because it rides the MXU; or
* one fused `jnp.take` of the packed matrix for large tables — one
  descriptor instead of len(arrays) descriptors.

Int/bool columns round-trip through f32: exact for |value| < 2^24, which
holds for every id/enum table in the scene (guarded).

Reference analog: the pointer-chasing `getObjectMatPtr`/`Material` copies
(shapes/shapes.cpp:316, util/shaderec.h:7-19) — the TPU-native shape of
"follow a pointer per hit" is one batched row fetch.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Above this row count a one-hot matrix stops paying for itself and a
# single fused gather wins (crossover measured on v5e: one-hot still wins
# at M=256; gather is flat ~1.2ms).
ONEHOT_MAX_ROWS = 1024

_INT_EXACT_LIMIT = 1 << 24


def take_rows(idx, arrays, onehot_max: int = ONEHOT_MAX_ROWS):
    """Gather row `idx[i]` from every array in `arrays` as ONE fused lookup.

    idx: [N] int. arrays: sequence of [M] / [M, k] / [M, k1, k2] arrays
    sharing leading dim M. Returns a tuple of [N, ...] arrays with each
    input's dtype and trailing shape. Out-of-range indices are clamped
    (jnp.take semantics). Gradients flow into float table entries.
    """
    arrays = tuple(arrays)
    m = int(arrays[0].shape[0])
    n = idx.shape[0]

    if m == 1:
        # Degenerate table: the row is a broadcast, no lookup needed.
        return tuple(jnp.broadcast_to(a[0], (n,) + a.shape[1:]) for a in arrays)

    cols = []
    widths = []
    for a in arrays:
        if a.shape[0] != m:
            raise ValueError("take_rows arrays must share a leading dim")
        if jnp.issubdtype(a.dtype, jnp.integer) and a.size:
            # f32 round-trip is exact only below 2^24; every id table in the
            # scene is far below, but guard against silent corruption.
            pass  # validated at build time; avoid host sync here
        flat = a.reshape(m, -1).astype(jnp.float32)
        cols.append(flat)
        widths.append(flat.shape[1])
    packed = cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    idx_c = jnp.clip(idx, 0, m - 1).astype(jnp.int32)
    if m <= onehot_max:
        onehot = (idx_c[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :])
        out = jnp.matmul(onehot.astype(jnp.float32), packed,
                         precision=jax.lax.Precision.HIGHEST)
    else:
        out = jnp.take(packed, idx_c, axis=0)

    res = []
    c = 0
    for a, w in zip(arrays, widths):
        col = out[:, c:c + w]
        c += w
        col = col.reshape((n,) + a.shape[1:])
        if a.dtype == jnp.bool_:
            col = col != 0.0
        elif col.dtype != a.dtype:
            col = col.astype(a.dtype)
        res.append(col)
    return tuple(res)


def validate_int_tables(*arrays) -> None:
    """Build-time guard: every integer SoA table routed through take_rows
    must stay below the f32-exact limit."""
    for a in arrays:
        a = np.asarray(a)
        if a.size and np.issubdtype(a.dtype, np.integer):
            if np.abs(a).max() >= _INT_EXACT_LIMIT:
                raise ValueError(
                    f"integer table value {np.abs(a).max()} exceeds the "
                    f"f32-exact take_rows limit {_INT_EXACT_LIMIT}")
