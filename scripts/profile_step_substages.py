"""Sub-stage device-time split of the sketch step (differencing method).

The full step measured ~40 ms for B=8 x 4.19 Mbp while the Pallas hash
kernel alone is ~10 ms — this script attributes the rest by timing chained
prefixes of the pipeline:

  P0: unpack packed2 + runs->valid mask          (HBM-bound elementwise)
  P1: P0 + hash kernel                           (the Pallas kernel)
  P2: P1 + block_extract survivors               (masked-max extraction)
  P3: P2 + sort/dedup/compact                    (the HashSet equivalent)
  P4: full step (= P3 + encode + norm)           (encode measured ~0.4 ms)

Each prefix ends in a sum-reduce to keep outputs scalar. Differencing two
chain lengths cancels relay fixed costs (see profile_device_time.py).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_device_time import _per_iter, _rand_u32
from hypergen_tpu.io.fastx import INVALID
from hypergen_tpu.models.sketcher import (
    _dedup_sorted_batched, _valid_from_runs,
)
from hypergen_tpu.ops.compact import block_extract, compact_masked
from hypergen_tpu.ops.encode import encode_hv, hv_norm2_i32, hv_to_i16
from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17
K, SCALED, D = 21, 1500, 4096
L_EXT = NC * C + K - 1
L_PAD = -(-L_EXT // 8) * 8
THR = fracminhash_threshold(SCALED)
ENC_CAP = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256

RUNS = np.zeros((B, 512, 2), np.int32)
RUNS[:, 0] = (L_EXT, L_PAD)


def _stage_fn(depth):
    runs_c = jnp.asarray(RUNS)
    n_bytes = L_PAD // 4
    n_words = -(-n_bytes // 4)

    def prefix(p2):
        shifts2 = np.arange(4, dtype=np.uint8) * 2
        b = (p2[..., None] >> shifts2) & np.uint8(3)
        b = b.reshape(b.shape[:-2] + (-1,))
        valid = _valid_from_runs(runs_c, L_PAD)
        codes = jnp.where(valid, b, np.uint8(INVALID))[:, :L_EXT]
        chunks = jnp.stack(
            [codes[:, c * C : c * C + C + K - 1] for c in range(NC)], axis=1
        ).reshape(B * NC, C + K - 1)
        if depth == 0:
            return jnp.sum(chunks.astype(jnp.int32))
        h, keep = hash_chunks_pallas(
            chunks, K, 123, THR, canonical=True, method="t1ha2", cells=4096
        )
        if depth == 1:
            return jnp.sum(h.lo.astype(jnp.int32)) + jnp.sum(
                keep.astype(jnp.int32)
            )
        h = U64(h.hi.reshape(B, NC * C), h.lo.reshape(B, NC * C))
        keep = keep.reshape(B, NC * C)
        flat, _, bc = block_extract(h, keep, 512, 8)
        if depth == 2:
            return jnp.sum(flat.lo.astype(jnp.int32)) + jnp.sum(bc)
        sorted_h, unique = _dedup_sorted_batched(flat)
        enc, n_hashes = compact_masked(sorted_h, unique, ENC_CAP)
        if depth == 3:
            return jnp.sum(enc.lo.astype(jnp.int32)) + jnp.sum(n_hashes)
        valid_e = (
            jax.lax.broadcasted_iota(jnp.int32, (B, ENC_CAP), 1)
            < n_hashes[:, None]
        )
        hv32 = encode_hv(enc, valid_e, D, block=512)
        hv16 = hv_to_i16(hv32)
        return jnp.sum(hv32) + jnp.sum(hv_norm2_i32(hv16))

    def make_fn(R):
        def chained(seeds):
            def body(carry, seed):
                p2 = (
                    _rand_u32(seed, (B, n_words))
                    .view(jnp.uint8)
                    .reshape(B, n_words * 4)[:, :n_bytes]
                )
                return carry + prefix(p2), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    return make_fn


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    names = ["P0 unpack+valid", "P1 +hash", "P2 +extract", "P3 +dedup",
             "P4 full"]
    prev = 0.0
    for depth, name in enumerate(names):
        dt, t1, t2 = _per_iter(_stage_fn(depth), f"s{depth}")
        print(f"{name}: {dt*1e3:7.1f} ms cumulative "
              f"(+{(dt-prev)*1e3:6.1f} ms)  [t={t1:.3f}/{t2:.3f}s]")
        prev = dt
