"""How does end-to-end per-dispatch cost scale with batch size B?"""

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
rng = np.random.default_rng(2)
enc_cap = -(-(3 * (NC * C // P.scaled) + 512) // 256) * 256

for B in (8, 16, 32, 64):
    step = make_sketch_step(
        ksize=K, seed=P.seed, threshold=fracminhash_threshold(P.scaled),
        hv_d=P.hv_d, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
        enc_cap=enc_cap, encode_block=512, extract_block=512, use_pallas=True,
    )
    N = 3
    ins = []
    for _ in range(N + 1):  # +1: warmup input excluded from timing (relay
        # caches (executable, inputs) -> result; replays are free)
        p2 = np.empty((B, L_pad // 4), np.uint8)
        pv = np.empty((B, L_pad // 8), np.uint8)
        for i in range(B):
            p2[i], pv[i] = pack_codes(
                rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
            )
        ins.append((p2, pv))
    out = step(jnp.asarray(ins[0][0]), jnp.asarray(ins[0][1]))
    jax.device_get(out)  # compile + settle
    ins = ins[1:]
    t0 = time.monotonic()
    for p2, pv in ins:
        hv, meta = split_step_output(
            jax.device_get(step(jnp.asarray(p2), jnp.asarray(pv)))
        )
    dt = (time.monotonic() - t0) / N
    print(f"B={B:3d}: {dt*1e3:8.1f} ms/dispatch -> {B/dt:7.1f} genomes/s "
          f"(mean n_hashes {meta[:,1].mean():.0f})", flush=True)
