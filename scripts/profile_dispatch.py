"""Isolate relay costs: H2D, dispatch-on-resident-args, D2H, end-to-end.

Run alone (no concurrent load). Distinct inputs per repetition defeat the
relay's (executable, inputs) result cache.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import make_sketch_step, pack_codes, split_step_output
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
B, NC, C = 8, 32, 1 << 17
K = P.ksize
L_ext = NC * C + K - 1
L_pad = -(-L_ext // 8) * 8
rng = np.random.default_rng(1)
N = 6

enc_cap = -(-(3 * (NC * C // P.scaled) + 512) // 256) * 256
step = make_sketch_step(
    ksize=K, seed=P.seed, threshold=fracminhash_threshold(P.scaled),
    hv_d=P.hv_d, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
    enc_cap=enc_cap, encode_block=512, extract_block=512, use_pallas=True,
)

print("building inputs...")
host_in = []
for _ in range(N):
    p2 = np.empty((B, L_pad // 4), np.uint8)
    pv = np.empty((B, L_pad // 8), np.uint8)
    for i in range(B):
        p2[i], pv[i] = pack_codes(
            rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
        )
    host_in.append((p2, pv))

# warmup compile
out = step(jnp.asarray(host_in[0][0]), jnp.asarray(host_in[0][1]))
jax.block_until_ready(out)

# --- H2D only -------------------------------------------------------------
t0 = time.monotonic()
dev_in = []
for p2, pv in host_in:
    dev_in.append((jax.device_put(p2), jax.device_put(pv)))
jax.block_until_ready(dev_in)
t_h2d = (time.monotonic() - t0) / N
print(f"H2D per batch ({(host_in[0][0].nbytes+host_in[0][1].nbytes)/1e6:.1f} MB): "
      f"{t_h2d*1e3:.1f} ms")

# --- dispatch+compute on resident args, serialized ------------------------
t0 = time.monotonic()
for d2, dv in dev_in:
    out = step(d2, dv)
    jax.block_until_ready(out)
t_step = (time.monotonic() - t0) / N
print(f"step on resident args (serialized): {t_step*1e3:.1f} ms")

# --- same but pipelined (async dispatch) -----------------------------------
t0 = time.monotonic()
outs = [step(d2, dv) for d2, dv in dev_in]
jax.block_until_ready(outs)
t_pipe = (time.monotonic() - t0) / N
print(f"step on resident args (pipelined): {t_pipe*1e3:.1f} ms")

# --- D2H of outputs ---------------------------------------------------------
t0 = time.monotonic()
for o in outs:
    jax.device_get(o)
t_d2h = (time.monotonic() - t0) / N
print(f"D2H per batch (fused [B, D+8] i16): {t_d2h*1e3:.1f} ms")

# --- full end-to-end as the Sketcher does it -------------------------------
t0 = time.monotonic()
for p2, pv in host_in:
    out = step(jnp.asarray(p2), jnp.asarray(pv))
    jax.device_get(out)
t_e2e = (time.monotonic() - t0) / N
print(f"end-to-end serialized: {t_e2e*1e3:.1f} ms -> {B/t_e2e:.1f} genomes/s")

# pipelined end-to-end, window 3
import collections
win = collections.deque()
t0 = time.monotonic()
for rep in range(2):
    for p2, pv in host_in:
        win.append(step(jnp.asarray(p2), jnp.asarray(pv)))
        if len(win) >= 3:
            jax.device_get(win.popleft())
while win:
    jax.device_get(win.popleft())
t_p = (time.monotonic() - t0) / (2 * N)
print(f"end-to-end pipelined: {t_p*1e3:.1f} ms -> {B/t_p:.1f} genomes/s")
