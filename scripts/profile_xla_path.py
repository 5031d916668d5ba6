"""Time the use_pallas=False (pure-XLA) sketch step for comparison with the
Pallas kernel path (same harness shape as profile_devput.py)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import make_sketch_step, pack_codes, split_step_output
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
NC, C = 32, 1 << 17
K = P.ksize
L_ext = NC * C + K - 1
L_pad = -(-L_ext // 8) * 8
rng = np.random.default_rng(3)
enc_cap = -(-(3 * (NC * C // P.scaled) + 512) // 256) * 256

for B in (8, 32):
    step = make_sketch_step(
        ksize=K, seed=P.seed, threshold=fracminhash_threshold(P.scaled),
        hv_d=P.hv_d, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
        enc_cap=enc_cap, encode_block=512, extract_block=512, use_pallas=False,
    )
    N = 3
    ins = []
    for _ in range(N + 1):  # [0] is warmup-only (relay result cache)
        p2 = np.empty((B, L_pad // 4), np.uint8)
        pv = np.empty((B, L_pad // 8), np.uint8)
        for i in range(B):
            p2[i], pv[i] = pack_codes(
                rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
            )
        ins.append((p2, pv))
    out = step(jax.device_put(ins[0][0]), jax.device_put(ins[0][1]))
    jax.device_get(out)
    ins = ins[1:]

    t0 = time.monotonic()
    for p2, pv in ins:
        d2 = jax.device_put(p2)
        dv = jax.device_put(pv)
        hv, meta = split_step_output(jax.device_get(step(d2, dv)))
    dt = (time.monotonic() - t0) / N
    print(f"B={B:3d} XLA-path      : {dt*1e3:8.1f} ms/dispatch -> "
          f"{B/dt:7.1f} genomes/s", flush=True)
