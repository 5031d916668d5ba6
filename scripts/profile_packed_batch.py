"""Full packed-step device time vs batch size B (r4 candidate #1b).

Does per-program-iteration fixed work (pallas_call setup, sort/encode glue,
small-op latencies) amortize at larger B? Chained-scan differencing cancels
dispatch/fetch; what remains is pure device time per step, so Gbp/s here is
the per-chip ceiling for each B. Usage: profile_packed_batch.py [B...]
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
from hypergen_tpu.models.sketcher import (
    make_sketch_step, packed_be_cap_default, packed_row_words,
)
from hypergen_tpu.params import fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

NC, C = 32, 1 << 17
K, SCALED, D = 21, 1500, 4096
W = packed_row_words(NC, C)
ENC_CAP = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
BE_CAP = packed_be_cap_default(C, SCALED)


def _fn(B):
    step = make_sketch_step(
        ksize=K, seed=123, threshold=fracminhash_threshold(SCALED), hv_d=D,
        batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=4,
        enc_cap=ENC_CAP, encode_block=512, extract_block=512,
        use_pallas=True, validity="packed", jit_compile=False,
        packed_be_cap=BE_CAP,
    )
    runs = np.full((B, 512, 2), np.int32(0x7FFFFFFF), np.int32)
    n_pos = np.full(B, NC * C, np.int32)

    def make_fn(R):
        def chained(seeds):
            runs_c = jnp.asarray(runs)
            n_pos_c = jnp.asarray(n_pos)

            def body(carry, seed):
                p2w = _rand_u32(seed, (B, W))
                out = step(p2w, runs_c, n_pos_c)
                return carry + jnp.sum(out.astype(jnp.int32)), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    return make_fn


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    pdt.R1, pdt.R2 = 4, 20
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    for B in batches:
        dt, t1, t2 = _per_iter(_fn(B), f"pb{B}")
        bp = B * NC * C
        print(f"B={B:3d}: {dt*1e3:7.2f} ms/step -> {bp/dt/1e6:6.0f} Mbp/s "
              f"({dt/B*1e3:.2f} ms/genome) [t={t1:.3f}/{t2:.3f}s]",
              flush=True)
