"""Sub-stage device-time attribution for the fused packed sketch step.

Uses make_sketch_step's probe hooks, so the measured prefixes are EXACTLY
the production pipeline: hash (gather+kernel), extract (+plane-split
block_extract + run postfilter), dedup (+sort), full (+compact scatter +
encode + norm + meta). Chained-scan differencing as in
profile_device_time.py. Usage: profile_packed_substages.py [depth...]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_device_time import _per_iter, _rand_u32
from hypergen_tpu.models.sketcher import (
    make_sketch_step, packed_be_cap_default, packed_row_words,
)
from hypergen_tpu.params import fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17
K, SCALED, D = 21, 1500, 4096
W = packed_row_words(NC, C)
ENC_CAP = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
BE_CAP = packed_be_cap_default(C, SCALED)

RUNS = np.full((B, 512, 2), np.int32(0x7FFFFFFF), np.int32)
N_POS = np.full(B, NC * C, np.int32)

PROBES = ["hash", "extract_pre", "extract", "dedup", None]
NAMES = ["hash (relayout+kernel)", "+extract (no filter)", "+run postfilter",
         "+dedup sort",
         "full (+prefix encode+norm)"]


def _stage_fn(depth):
    step = make_sketch_step(
        ksize=K, seed=123, threshold=fracminhash_threshold(SCALED), hv_d=D,
        batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=4,
        enc_cap=ENC_CAP, encode_block=512, extract_block=512,
        use_pallas=True, validity="packed", jit_compile=False,
        packed_be_cap=BE_CAP, probe=PROBES[depth],
    )

    def make_fn(R):
        def chained(seeds):
            runs_c = jnp.asarray(RUNS)
            n_pos_c = jnp.asarray(N_POS)

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
    only = [int(a) for a in sys.argv[1:]] or list(range(len(NAMES)))
    for depth in only:
        dt, t1, t2 = _per_iter(_stage_fn(depth), f"q{depth}")
        print(f"{NAMES[depth]}: {dt*1e3:7.1f} ms cumulative  "
              f"[t={t1:.3f}/{t2:.3f}s]")
