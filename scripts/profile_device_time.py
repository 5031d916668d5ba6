"""Tunnel-free device-time profile: chained steps + differencing.

The axon relay adds ~30 ms dispatch + ~150 ms fetch per executable AND
caches (executable, inputs) -> result, so a single dispatch+fetch timing of
repeated inputs measures the tunnel (or nothing at all). This script times
programs that:

  1. run R iterations of a stage entirely on device (lax.scan), with the
     iteration inputs GENERATED ON DEVICE from a tiny per-run seed array
     (distinct every repetition -> no relay cache hits, no H2D upload bias),
  2. fetch ONE scalar,
  3. are measured at two chain lengths R1 < R2; the difference
     (t_R2 - t_R1) / (R2 - R1) cancels every fixed cost — dispatch, fetch,
     relay queueing — leaving pure device time per iteration.

Stages at the production operating point (B=8 genomes x 4.19 Mbp, k=21,
scaled=1500, D=4096): full sketch step, Pallas hash kernel, HV encode,
search int16 dot matmul.

Run on the real chip:  python scripts/profile_device_time.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17  # 8 genomes x 4.19 Mbp
K, SCALED, D = 21, 1500, 4096
R1, R2 = 2, 8
REPS = 2


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """Cheap murmur-style avalanche on uint32 (device-side data gen)."""
    x = (x + jnp.uint32(0x9E3779B1)) * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 13)


def _rand_u32(seed: jnp.ndarray, shape) -> jnp.ndarray:
    n = int(np.prod(shape))
    i = jax.lax.iota(jnp.uint32, n)
    return _mix32(i + seed * jnp.uint32(2654435761)).reshape(shape)


def _time_fn(fn, seeds_list):
    """Median wall time over distinct-seed runs (first run = compile).

    NB: on the axon relay only an actual D2H fetch synchronizes —
    block_until_ready returns immediately — so the scalar is device_get'd.
    """
    jax.device_get(fn(seeds_list[0]))
    ts = []
    for seeds in seeds_list[1:]:
        t0 = time.monotonic()
        jax.device_get(fn(seeds))
        ts.append(time.monotonic() - t0)
    return float(np.median(ts))


def _per_iter(make_fn, tag):
    """Device seconds per iteration via R2-R1 differencing."""
    base = np.uint32(int.from_bytes(tag.encode()[:3], "little"))
    times = {}
    for R in (R1, R2):
        fn = jax.jit(make_fn(R))
        seeds_list = [
            jnp.asarray(
                base + np.arange(R, dtype=np.uint32) + np.uint32(1000 * r)
            )
            for r in range(REPS + 1)
        ]
        times[R] = _time_fn(fn, seeds_list)
    dt = (times[R2] - times[R1]) / (R2 - R1)
    return dt, times[R1], times[R2]


def sketch_step_device_time(NC: int = NC):
    from hypergen_tpu.models.sketcher import make_sketch_step
    from hypergen_tpu.params import SketchParams, fracminhash_threshold

    p = SketchParams()
    L_ext = NC * C + K - 1
    L_pad = -(-L_ext // 8) * 8
    enc_cap = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
    step = make_sketch_step(
        ksize=K, seed=p.seed, threshold=fracminhash_threshold(SCALED),
        hv_d=D, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
        enc_cap=enc_cap, encode_block=512, extract_block=512,
        use_pallas=True, validity="runs", jit_compile=False,
    )
    runs = np.zeros((B, 512, 2), np.int32)
    runs[:, 0] = (L_ext, L_pad)  # only the tail-padding run is invalid

    def make_fn(R):
        def chained(seeds):
            runs_c = jnp.asarray(runs)

            n_bytes = L_pad // 4
            n_words = -(-n_bytes // 4)

            def body(carry, seed):
                p2 = (
                    _rand_u32(seed, (B, n_words))
                    .view(jnp.uint8)
                    .reshape(B, n_words * 4)[:, :n_bytes]
                )
                out = step(p2, runs_c)
                return carry + jnp.sum(out.astype(jnp.int32)), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    dt, t1, t2 = _per_iter(make_fn, "skt")
    bp = B * NC * C
    print(f"sketch step: {dt*1e3:.1f} ms/step device-only "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> "
          f"{B/dt:.1f} genomes/s/chip, {bp/dt/1e6:.0f} Mbp/s")
    return {"sketch_ms": dt * 1e3, "genomes_per_s": B / dt,
            "mbp_per_s": bp / dt / 1e6}


def sketch_step_packed_device_time(NC: int = NC):
    """Device time of the fused packed step (kernel does unpack+hash+compact;
    validity repaired by the sparse run postfilter)."""
    from hypergen_tpu.models.sketcher import (
        make_sketch_step, packed_be_cap_default, packed_row_words,
    )
    from hypergen_tpu.params import SketchParams, fracminhash_threshold

    p = SketchParams()
    enc_cap = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
    be_cap = packed_be_cap_default(C, SCALED)
    step = make_sketch_step(
        ksize=K, seed=p.seed, threshold=fracminhash_threshold(SCALED),
        hv_d=D, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=4,
        enc_cap=enc_cap, encode_block=512, extract_block=512,
        use_pallas=True, validity="packed", jit_compile=False,
        packed_be_cap=be_cap,
    )
    W = packed_row_words(NC, C)
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

    dt, t1, t2 = _per_iter(make_fn, "pkt")
    bp = B * NC * C
    print(f"packed step: {dt*1e3:.1f} ms/step device-only "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> "
          f"{B/dt:.1f} genomes/s/chip, {bp/dt/1e6:.0f} Mbp/s")
    return {"sketch_ms": dt * 1e3, "genomes_per_s": B / dt,
            "mbp_per_s": bp / dt / 1e6}


def packed_hash_stage_device_time(NC: int = NC):
    """Device time of the packed step's hash stage alone (relayout +
    fused Pallas kernel, via the probe hook) — the VPU speed-of-light
    numerator: the kernel is issue-bound at ~T1HA2_VPU_OPS_PER_POSITION
    u64-emulation vector ops per k-mer position."""
    from hypergen_tpu.models.sketcher import (
        make_sketch_step, packed_be_cap_default, packed_row_words,
    )
    from hypergen_tpu.params import SketchParams, fracminhash_threshold

    p = SketchParams()
    enc_cap = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
    be_cap = packed_be_cap_default(C, SCALED)
    step = make_sketch_step(
        ksize=K, seed=p.seed, threshold=fracminhash_threshold(SCALED),
        hv_d=D, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=4,
        enc_cap=enc_cap, encode_block=512, extract_block=512,
        use_pallas=True, validity="packed", jit_compile=False,
        packed_be_cap=be_cap, probe="hash",
    )
    W = packed_row_words(NC, C)
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

    dt, t1, t2 = _per_iter(make_fn, "phs")
    bp = B * NC * C
    print(f"packed hash stage: {dt*1e3:.1f} ms "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> {bp/dt/1e6:.0f} Mbp/s")
    return {"hash_ms": dt * 1e3, "mbp_per_s": bp / dt / 1e6,
            "positions_per_s": bp / dt}


def hash_kernel_device_time():
    from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
    from hypergen_tpu.params import fracminhash_threshold

    n_rows = B * NC
    thr = fracminhash_threshold(SCALED)
    L = C + K - 1
    L4 = -(-L // 4) * 4

    def make_fn(R):
        def chained(seeds):
            def body(carry, seed):
                codes = (
                    _rand_u32(seed, (n_rows, L4 // 4))
                    .view(jnp.uint8)
                    .reshape(n_rows, L4)[:, :L]
                ) & jnp.uint8(3)
                h, keep = hash_chunks_pallas(
                    codes, K, 123, thr, canonical=True, method="t1ha2",
                    cells=4096,
                )
                return carry + jnp.sum(keep.astype(jnp.int32)) + jnp.sum(
                    h.lo.astype(jnp.int32)
                ), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    dt, t1, t2 = _per_iter(make_fn, "hsh")
    bp = n_rows * C
    print(f"hash kernel: {dt*1e3:.1f} ms/iter device-only "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> {bp/dt/1e6:.0f} Mbp/s")
    return {"hash_ms": dt * 1e3, "mbp_per_s": bp / dt / 1e6}


def encode_device_time():
    from hypergen_tpu.ops.encode import encode_hv
    from hypergen_tpu.ops.u64 import U64

    n_hashes = NC * C // SCALED  # survivors per 4 Mbp genome (~2796)
    enc_cap = -(-(3 * n_hashes + 512) // 256) * 256
    valid = np.arange(enc_cap)[None, :] < n_hashes
    valid = np.broadcast_to(valid, (B, enc_cap)).copy()

    def make_fn(R):
        def chained(seeds):
            v = jnp.asarray(valid)

            def body(carry, seed):
                hi = _rand_u32(seed, (B, enc_cap))
                lo = _rand_u32(seed + jnp.uint32(7777), (B, enc_cap))
                hv = encode_hv(U64(hi, lo), v, D, block=512)
                return carry + jnp.sum(hv), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    dt, t1, t2 = _per_iter(make_fn, "enc")
    words = B * n_hashes * (D // 64)
    print(f"encode: {dt*1e3:.1f} ms/iter ({B} genomes x {n_hashes} hashes) "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> "
          f"{B/dt:.0f} genomes/s, {words/dt/1e6:.0f} M wyrng-words/s")
    return {"encode_ms": dt * 1e3, "genomes_per_s": B / dt}


def search_matmul_device_time(mode=True):
    """mode True = 4-pass int8 split (any int16); "small" = 3-pass
    Karatsuba split (|v| <= SMALL_SPLIT_MAX, the production default for
    bacterial-scale HVs)."""
    from hypergen_tpu.ops.ani import dot_i16_exact

    M, N = 8192, 2048

    def make_fn(R):
        def chained(seeds):
            db = (
                _rand_u32(jnp.uint32(42), (M, D // 2))
                .view(jnp.int16)
                .reshape(M, D)
            ) >> 9  # int16 values in ~[-64, 64)

            def body(carry, seed):
                q = (
                    _rand_u32(seed, (N, D // 2)).view(jnp.int16).reshape(N, D)
                ) >> 9
                dot = dot_i16_exact(db, q, use_mxu=mode)
                return carry + jnp.sum(dot), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    dt, t1, t2 = _per_iter(make_fn, "dot" if mode is True else "dts")
    # exact i16 dot = 4 (or 3 for "small") int8 matmuls of 2*M*N*D ops each
    passes = 3 if mode == "small" else 4
    ops = 2 * passes * M * N * D
    print(f"search dot[{mode}]: {dt*1e3:.2f} ms/iter [{M}x{D}]@[{D}x{N}] "
          f"(t{R1}={t1:.3f}s t{R2}={t2:.3f}s) -> "
          f"{ops/dt/1e12:.1f} int8-TOP/s, {M*N/dt/1e6:.0f} M pairs/s")
    return {"dot_ms": dt * 1e3, "int8_tops": ops / dt / 1e12,
            "pairs_per_s": M * N / dt}


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    search_matmul_device_time()
    encode_device_time()
    hash_kernel_device_time()
    sketch_step_device_time()
