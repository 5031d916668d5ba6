"""Isolate relay costs: H2D, dispatch-on-resident-args, D2H, end-to-end.

SUPERSEDED for device-time attribution by profile_device_time.py
(chained-scan differencing): through the relay, block_until_ready is a
no-op and any real fetch costs ~150 ms, so the per-section numbers here
are enqueue+fetch ballparks, NOT device time. Still useful for H2D/D2H
byte-rate estimates and the serialized-vs-pipelined end-to-end contrast.
Run alone (no concurrent load). Distinct inputs per repetition defeat the
relay's (executable, inputs) result cache — the warmup input is never
re-timed.
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
for _ in range(N + 1):  # [0] is warmup-only
    p2 = np.empty((B, L_pad // 4), np.uint8)
    pv = np.empty((B, L_pad // 8), np.uint8)
    for i in range(B):
        p2[i], pv[i] = pack_codes(
            rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
        )
    host_in.append((p2, pv))

# warmup compile (real fetch: block_until_ready is a relay no-op)
jax.device_get(step(jnp.asarray(host_in[0][0]), jnp.asarray(host_in[0][1])))
host_in = host_in[1:]

# --- H2D only -------------------------------------------------------------
t0 = time.monotonic()
dev_in = []
for p2, pv in host_in:
    dev_in.append((jax.device_put(p2), jax.device_put(pv)))
jax.block_until_ready(dev_in)
t_h2d = (time.monotonic() - t0) / N
print(f"H2D per batch ({(host_in[0][0].nbytes+host_in[0][1].nbytes)/1e6:.1f} MB): "
      f"{t_h2d*1e3:.1f} ms")

# --- dispatch+compute on resident args, serialized (incl. one-row fetch:
# the only real sync through the relay) ------------------------------------
t0 = time.monotonic()
for d2, dv in dev_in:
    out = step(d2, dv)
    jax.device_get(out[0, 0])
t_step = (time.monotonic() - t0) / N
print(f"step on resident args (serialized, +scalar fetch): {t_step*1e3:.1f} ms")

# --- same but pipelined (async dispatch, one fetch at the end) --------------
t0 = time.monotonic()
outs = [step(d2, dv) for d2, dv in dev_in]
jax.device_get(outs[-1][0, 0])
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

# pipelined end-to-end, window 3 (single pass: a second pass over the same
# inputs would be served from the relay result cache)
import collections
win = collections.deque()
t0 = time.monotonic()
for p2, pv in host_in:
    win.append(step(jnp.asarray(p2), jnp.asarray(pv)))
    if len(win) >= 3:
        jax.device_get(win.popleft())
while win:
    jax.device_get(win.popleft())
t_p = (time.monotonic() - t0) / N
print(f"end-to-end pipelined: {t_p*1e3:.1f} ms -> {B/t_p:.1f} genomes/s")
