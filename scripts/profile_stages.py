"""Per-stage TPU profiling: where does sketch time go?

Times each device stage of the sketch pipeline separately with distinct
inputs per repeat (the axon relay caches (executable, inputs) -> result)
and forced scalar fetches. Run on the real TPU backend:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_stages.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import make_sketch_step, pack_codes, split_step_output
from hypergen_tpu.ops.compact import block_extract
from hypergen_tpu.ops.encode import encode_hv
from hypergen_tpu.ops.kmers import hash_kmer_positions
from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
THRESH = fracminhash_threshold(P.scaled)
K, SEED, D = P.ksize, P.seed, P.hv_d
B = 8
C = 1 << 17
GENOME_BP = 4_000_000
NC = 32  # 32*131072 = 4.19 Mpos bucket for a 4 Mbp genome
REPS = 6

rng = np.random.default_rng(0)


def _sync(out):
    # block_until_ready is a NO-OP through the axon relay (CLAUDE.md):
    # only a real fetch synchronizes, so pull one scalar out
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def timeit(name, fn, inputs, n=REPS):
    # warmup on inputs[0]; each remaining input is timed EXACTLY ONCE (the
    # relay caches (executable, inputs) -> result, so any replay is free)
    del n
    _sync(fn(*inputs[0]))
    timed = inputs[1:]
    assert timed, "need >= 2 inputs (first is warmup-only)"
    t0 = time.monotonic()
    for args in timed:
        _sync(fn(*args))
    dt = (time.monotonic() - t0) / len(timed)
    print(f"{name:40s} {dt*1e3:9.1f} ms   {B*GENOME_BP/dt/1e6:8.1f} Mbp/s-batch")
    return dt


def fresh_packed(n):
    outs = []
    L_ext = NC * C + K - 1
    L_pad = -(-L_ext // 8) * 8
    for _ in range(n):
        p2 = np.empty((B, L_pad // 4), np.uint8)
        pv = np.empty((B, L_pad // 8), np.uint8)
        for i in range(B):
            codes = rng.integers(0, 4, size=GENOME_BP, dtype=np.uint8)
            p2[i], pv[i] = pack_codes(codes, L_pad)
        outs.append((p2, pv))
    return outs


def fresh_chunks(n):
    outs = []
    for _ in range(n):
        outs.append(
            (jnp.asarray(rng.integers(0, 4, size=(B * NC // 4, C + K - 1), dtype=np.uint8)),)
        )
    return outs


def main():
    print(f"backend={jax.default_backend()}  B={B} NC={NC} C={C} "
          f"({B} x {NC*C/1e6:.1f} Mpos)")

    # --- 0. H2D transfer of the packed batch -------------------------------
    packed = fresh_packed(3)
    def h2d(p2, pv):
        return jax.device_put(p2), jax.device_put(pv)
    timeit("h2d packed batch", h2d, packed, n=3)

    # --- 1. pallas hash kernel alone (quarter batch to bound VMEM) ---------
    chunks = fresh_chunks(3)
    def pal(ch):
        h, keep = hash_chunks_pallas(ch, K, SEED, THRESH)
        return h.lo[0, 0] + keep[0, 0]
    dt = timeit(f"pallas hash kernel ({B*NC//4} chunks)", jax.jit(pal), chunks, n=4)
    print(f"    -> full-genome-batch equivalent: {4*dt*1e3:9.1f} ms "
          f"({B*GENOME_BP/(4*dt)/1e6:.1f} Mbp/s)")

    # --- 1b. XLA hash path for comparison -----------------------------------
    def xla_hash(ch):
        h, keep = hash_kmer_positions(ch, K, seed=SEED, threshold=THRESH)
        return h.lo[0, 0] + keep[0, 0]
    dtx = timeit(f"xla hash path ({B*NC//4} chunks)", jax.jit(xla_hash), chunks, n=2)
    print(f"    -> full-genome-batch equivalent: {4*dtx*1e3:9.1f} ms")

    # --- 2. block_extract on hash-kernel-shaped data ------------------------
    def extract(ch):
        h, keep = hash_chunks_pallas(ch, K, SEED, THRESH)
        flat, _, bc = block_extract(h, keep, 512, 8)
        return flat.lo[0] + bc[0]
    dte = timeit("pallas hash + block_extract", jax.jit(extract), chunks, n=4)
    print(f"    -> extract overhead vs hash alone: {(dte-dt)*1e3:9.1f} ms/quarter")

    # --- 3. encode alone ----------------------------------------------------
    enc_cap = 3 * (NC * C // P.scaled) + 512
    enc_cap = -(-enc_cap // 256) * 256
    def enc_inputs(n):
        outs = []
        for _ in range(n):
            hi = rng.integers(0, 1 << 32, size=(B, enc_cap), dtype=np.uint32)
            lo = rng.integers(0, 1 << 32, size=(B, enc_cap), dtype=np.uint32)
            outs.append((jnp.asarray(hi), jnp.asarray(lo)))
        return outs
    def enc(hi, lo):
        valid = jnp.ones_like(hi, dtype=bool)
        return encode_hv(U64(hi, lo), valid, D, block=512)[0, 0]
    timeit(f"encode_hv ({enc_cap} hashes x D={D})", jax.jit(enc), enc_inputs(3), n=4)

    # --- 4. full fused step --------------------------------------------------
    step = make_sketch_step(
        ksize=K, seed=SEED, threshold=THRESH, hv_d=D, batch=B,
        n_chunks=NC, chunk_positions=C, chunk_cap=8, enc_cap=enc_cap,
        encode_block=512, extract_block=512, use_pallas=True,
    )
    def full(p2, pv):
        return step(jnp.asarray(p2), jnp.asarray(pv))
    dtf = timeit("FULL step (pallas)", full, fresh_packed(4))
    print(f"{'':40s} -> {B*GENOME_BP/dtf/1e6:8.1f} Mbp/s  "
          f"= {B/dtf:.1f} genomes/s")


if __name__ == "__main__":
    main()
