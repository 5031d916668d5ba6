"""Is the relay cost in H2D upload or D2H array fetch? Isolate each."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import make_sketch_step, pack_codes
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
B, NC, C = 8, 32, 1 << 17
K = P.ksize
L_ext = NC * C + K - 1
L_pad = -(-L_ext // 8) * 8
rng = np.random.default_rng(5)
ENC_CAP = -(-(3 * (NC * C // P.scaled) + 512) // 256) * 256

step = make_sketch_step(
    ksize=K, seed=P.seed, threshold=fracminhash_threshold(P.scaled),
    hv_d=P.hv_d, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
    enc_cap=ENC_CAP, encode_block=512, extract_block=512, use_pallas=True,
)
scalar = jax.jit(lambda a, b: step(a, b).astype(jnp.int32).sum())

N = 3
ins = []
for _ in range(N + 1):
    p2 = np.empty((B, L_pad // 4), np.uint8)
    pv = np.empty((B, L_pad // 8), np.uint8)
    for i in range(B):
        p2[i], pv[i] = pack_codes(
            rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
        )
    ins.append((p2, pv))

dev = [(jax.device_put(a), jax.device_put(b)) for a, b in ins]
float(scalar(*dev[0]))
jax.device_get(step(*dev[0]))

# A: resident args -> scalar fetch (execution + minimal D2H)
t0 = time.monotonic()
for d in dev[1:]:
    float(scalar(*d))
print(f"A resident->scalar : {(time.monotonic()-t0)/N*1e3:8.1f} ms")

# B: resident args -> full [8,4104] i16 fetch
t0 = time.monotonic()
for d in dev[1:]:
    np.asarray(step(*d))
print(f"B resident->array  : {(time.monotonic()-t0)/N*1e3:8.1f} ms")

# C: fresh numpy args -> scalar fetch (upload + execution)
t0 = time.monotonic()
for a, b in ins[1:]:
    float(scalar(jnp.asarray(a), jnp.asarray(b)))
print(f"C fresh->scalar    : {(time.monotonic()-t0)/N*1e3:8.1f} ms")

# D: uploads alone, forced (device_put + tiny use to defeat laziness)
use = jax.jit(lambda a, b: (a[0, 0].astype(jnp.int32)
                            + b[0, 0].astype(jnp.int32)))
t0 = time.monotonic()
for a, b in ins[1:]:
    da, db = jax.device_put(a), jax.device_put(b)
    float(use(da, db))
print(f"D upload+touch     : {(time.monotonic()-t0)/N*1e3:8.1f} ms")
