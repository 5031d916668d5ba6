"""Packed-kernel cell-count sweep (r4: halo-overhead vs lane-ILP tradeoff).

Each cell hashes T = lsub + k - 1 positions to produce lsub outputs, so the
k-1 halo is pure duplicated work: overhead (k-1)/T = 38% at lsub=32
(cells=4096), 24% at lsub=64, 14% at lsub=128. cells=4096 was picked in r1
for lane ILP (4 vregs/op) *before* the unroll change amortized the VMEM
state round-trips; if the kernel is truly VPU-issue-bound, fewer total
hash evaluations should now dominate. Chained-scan differencing at the
production shape. Usage: profile_kernel_cells.py [cells...]
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


def _fn(cells, cap):
    def make_fn(R):
        def chained(seeds):
            n_pos = jnp.full((B,), NC * C, jnp.int32)

            def body(carry, seed):
                pw = _rand_u32(seed, (B, W))
                h, pos, valid, cm = hash_packed_rows_pallas(
                    pw, n_pos, NC, C, K, 123, THR, cells=cells, cap=cap,
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
    cells_list = [int(a) for a in sys.argv[1:]] or [4096, 2048, 1024]
    for cells in cells_list:
        lsub = C // cells
        # keep expected per-cell survivors ~constant margin: mean lsub/scaled
        cap = max(4, -(-6 * lsub // SCALED) + 3)
        T = lsub + K - 1
        dt, t1, t2 = _per_iter(_fn(cells, cap), f"c{cells}")
        bp = B * NC * C
        print(f"cells={cells:5d} (lsub={lsub:3d}, T={T:3d}, cap={cap}): "
              f"{dt*1e3:6.2f} ms -> {bp/dt/1e6:.0f} Mbp/s "
              f"[t={t1:.3f}/{t2:.3f}s]", flush=True)
