"""A/B the HV encode paths on chip: CSA column counters vs expand-and-sum.

Both are bit-identical (tests/test_ops_parity.py pins it); this measures
which is faster at the production shape (B=8, enc_cap survivors of a
4.19 Mbp genome, D=4096, block=512). Chained-scan differencing as in
profile_device_time.py; A/B/B/A ordering so relay weather hits both arms.

Usage: python scripts/profile_encode_csa.py [reps_per_arm]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_device_time import _per_iter, _rand_u32, B, NC, C, SCALED, D
from hypergen_tpu.ops.encode import encode_hv
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

N_HASHES = NC * C // SCALED
ENC_CAP = -(-(2 * N_HASHES + 512) // 256) * 256  # production 2x ladder base
VALID = np.broadcast_to(
    np.arange(ENC_CAP)[None, :] < N_HASHES, (B, ENC_CAP)
).copy()


def _arm(csa: bool, tag: str):
    def make_fn(R):
        def chained(seeds):
            v = jnp.asarray(VALID)

            def body(carry, seed):
                hi = _rand_u32(seed, (B, ENC_CAP))
                lo = _rand_u32(seed + jnp.uint32(7777), (B, ENC_CAP))
                hv = encode_hv(U64(hi, lo), v, D, block=512, csa=csa)
                return carry + jnp.sum(hv), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    dt, t1, t2 = _per_iter(make_fn, tag)
    print(f"encode[csa={csa}] ({tag}): {dt*1e3:6.2f} ms/iter "
          f"(t={t1:.3f}/{t2:.3f}s)  {B/dt:6.0f} genomes/s")
    return dt


if __name__ == "__main__":
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(f"backend: {jax.default_backend()}  "
          f"shape: B={B} cap={ENC_CAP} (n={N_HASHES}) D={D} block=512")
    results = {True: [], False: []}
    order = ([True, False] + [False, True]) * ((reps + 1) // 2)
    for csa in order[: 2 * reps]:
        results[csa].append(_arm(csa, f"e{'c' if csa else 'x'}"))
    for csa, ds in results.items():
        ms = ", ".join(f"{d*1e3:.2f}" for d in ds)
        print(f"csa={csa}: [{ms}] ms  median {np.median(ds)*1e3:.2f}")
