"""Mask compaction: variable-count FracMinHash survivors on a static-shape machine.

The reference GPU path writes survivors into fixed per-thread slot arrays and
silently drops overflow (reference:src/sketch_cuda.rs:136-138,
reference:src/cuda_kernel.cu:316). We instead compact exactly with a
cumsum + scatter into a capacity buffer and RETURN THE TRUE COUNT, so the
host can detect capacity overflow and retry with a larger cap — no silent
data loss.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from hypergen_tpu.ops.u64 import U64


def compact_masked(h: U64, keep: jnp.ndarray, cap: int) -> Tuple[U64, jnp.ndarray]:
    """Gather kept entries of a flat hash vector into a [cap] buffer.

    h: U64 [..., P]; keep: bool [..., P]. Leading dims are treated as batch:
    compaction is per trailing axis. Returns (out: U64 [..., cap],
    count: int32 [...]) where out[..., :count] are the kept hashes in
    position order and the rest are zeros. If count > cap the first cap
    survivors are kept (caller must check count <= cap for exactness).
    """
    keep_i = keep.astype(jnp.int32)
    pos = jnp.cumsum(keep_i, axis=-1) - 1  # target slot for each kept entry
    idx = jnp.where(keep, pos, cap)  # out-of-bounds -> dropped
    batch_shape = h.lo.shape[:-1]
    out_hi = jnp.zeros(batch_shape + (cap,), dtype=jnp.uint32)
    out_lo = jnp.zeros(batch_shape + (cap,), dtype=jnp.uint32)
    # scatter along the last axis with drop semantics
    out_hi = _scatter_last(out_hi, idx, h.hi)
    out_lo = _scatter_last(out_lo, idx, h.lo)
    count = jnp.sum(keep_i, axis=-1)
    return U64(out_hi, out_lo), count


def _scatter_last(out: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray) -> jnp.ndarray:
    if out.ndim == 1:
        return out.at[idx].set(val, mode="drop")
    # build full index grids for leading axes
    lead = jnp.indices(idx.shape, dtype=jnp.int32)[:-1]
    return out.at[tuple(lead) + (idx,)].set(val, mode="drop")
