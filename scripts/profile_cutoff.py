"""Attribute full-step time by cutting the pipeline at successive stages."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import (
    _dedup_sorted_batched, _unpack_codes, pack_codes,
)
from hypergen_tpu.ops.compact import block_extract, compact_masked
from hypergen_tpu.ops.encode import encode_hv, hv_norm2_i32, hv_to_i16
from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
B, NC, C = 8, 32, 1 << 17
K = P.ksize
THRESH = fracminhash_threshold(P.scaled)
L_ext = NC * C + K - 1
L_pad = -(-L_ext // 8) * 8
rng = np.random.default_rng(4)
ENC_CAP = -(-(3 * (NC * C // P.scaled) + 512) // 256) * 256


def upto(stage):
    def step(packed2, packedv):
        codes = _unpack_codes(packed2, packedv)[:, :L_ext]
        chunks = jnp.stack(
            [codes[:, c * C : c * C + C + K - 1] for c in range(NC)], axis=1
        ).reshape(B * NC, C + K - 1)
        if stage == "unpack":
            return chunks.astype(jnp.int32).sum()
        h, keep = hash_chunks_pallas(chunks, K, P.seed, THRESH)
        if stage == "hash":
            return (h.lo.astype(jnp.int32) & 1).sum() + keep.sum()
        h = U64(h.hi.reshape(B, NC * C), h.lo.reshape(B, NC * C))
        keep = keep.reshape(B, NC * C)
        flat, _, bc = block_extract(h, keep, 512, 8)
        if stage == "extract":
            return (flat.lo.astype(jnp.int32) & 1).sum() + bc.sum()
        sorted_h, unique = _dedup_sorted_batched(flat)
        if stage == "sort":
            return (sorted_h.lo.astype(jnp.int32) & 1).sum() + unique.sum()
        enc, n_hashes = compact_masked(sorted_h, unique, ENC_CAP)
        if stage == "compact":
            return (enc.lo.astype(jnp.int32) & 1).sum() + n_hashes.sum()
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (B, ENC_CAP), 1)
            < n_hashes[:, None]
        )
        hv32 = encode_hv(enc, valid, P.hv_d, block=512)
        return hv_norm2_i32(hv_to_i16(hv32)).sum()

    return jax.jit(step)


ins = []
for _ in range(4):  # [0] is compile warmup only: the relay caches
    # (executable, inputs) -> result, so re-timing it would be a free hit
    p2 = np.empty((B, L_pad // 4), np.uint8)
    pv = np.empty((B, L_pad // 8), np.uint8)
    for i in range(B):
        p2[i], pv[i] = pack_codes(
            rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
        )
    ins.append((jax.device_put(p2), jax.device_put(pv)))

prev = 0.0
for stage in ("unpack", "hash", "extract", "sort", "compact", "encode"):
    fn = upto(stage)
    float(fn(*ins[0]))  # compile
    t0 = time.monotonic()
    for p2, pv in ins[1:]:
        float(fn(p2, pv))  # scalar fetch forces execution
    dt = (time.monotonic() - t0) / 3
    print(f"upto {stage:8s}: {dt*1e3:8.1f} ms  (+{(dt-prev)*1e3:7.1f} ms)",
          flush=True)
    prev = dt
