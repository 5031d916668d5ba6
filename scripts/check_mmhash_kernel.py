"""mmhash Pallas branch: real-TPU Mosaic compile + parity vs XLA path."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.kmers import hash_kmer_positions
from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
from hypergen_tpu.params import fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
rng = np.random.default_rng(1)
k, thr = 21, fracminhash_threshold(100)
C = 1 << 14
codes = rng.integers(0, 5, size=(4, C + k - 1)).astype(np.uint8)
for method in ("mmhash",):
    for canonical in (True, False):
        h_x, keep_x = jax.device_get(hash_kmer_positions(
            jnp.asarray(codes), k, 123, thr, canonical=canonical,
            method=method))
        h_p, keep_p = jax.device_get(hash_chunks_pallas(
            jnp.asarray(codes), k, 123, thr, canonical=canonical,
            method=method, cells=4096))
        assert (np.asarray(keep_p) == np.asarray(keep_x)).all()
        hp, hx = u.to_np_u64(h_p), u.to_np_u64(h_x)
        assert (hp[keep_p] == hx[keep_x]).all()
        print(f"{method} canonical={canonical}: parity OK "
              f"({int(np.asarray(keep_x).sum())} survivors)", flush=True)

