"""Packed-kernel loop unroll measurement (r4 candidate #1).

The rolling kernel round-trips ~(4 + 2*ceil(k/4)) VMEM state rows per
position; unrolling the fori_loop keeps state in registers across `unroll`
positions, amortizing the load/store plus trip-count overhead. Chained-scan
differencing at the production shape (see profile_device_time.py).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

import profile_device_time as pdt
from profile_device_time import _per_iter, _rand_u32
from hypergen_tpu.models.sketcher import packed_row_words
from hypergen_tpu.ops.pallas.hash_kernel import hash_packed_rows_pallas
from hypergen_tpu.params import fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17
K, SCALED = 21, 1500
W = packed_row_words(NC, C)
THR = fracminhash_threshold(SCALED)


def _fn(unroll):
    def make_fn(R):
        def chained(seeds):
            n_pos = jnp.full((B,), NC * C, jnp.int32)

            def body(carry, seed):
                pw = _rand_u32(seed, (B, W))
                h, pos, valid, cm = hash_packed_rows_pallas(
                    pw, n_pos, NC, C, K, 123, THR, cells=4096, cap=4,
                    unroll=unroll,
                )
                return carry + jnp.sum(h.lo.astype(jnp.int32)) + jnp.sum(cm), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    return make_fn


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    pdt.R1, pdt.R2 = 4, 20
    unrolls = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    for ur in unrolls:
        dt, t1, t2 = _per_iter(_fn(ur), f"u{ur}")
        bp = B * NC * C
        print(f"unroll={ur}: {dt*1e3:6.2f} ms -> {bp/dt/1e6:.0f} Mbp/s "
              f"[t={t1:.3f}/{t2:.3f}s]")
