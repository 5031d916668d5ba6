"""Benchmark harness: genomes sketched/s/chip + ANI pairs/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Workload (BASELINE.json operating point): k=21, scaled=1500, D=4096,
synthetic bacterial-scale genomes (4 Mbp). The sketch measurement covers the
full production path per genome: host 2-bit packing, H2D transfer, k-mer
hashing, FracMinHash, dedup, HDC encode, D2H of the HV. Every repetition
uses DISTINCT genomes — the TPU relay in this environment caches
(executable, inputs) -> result, so repeated inputs would lie.

ANI is measured in the two production shapes:
  - search mode (the BASELINE north star): reference DB resident on device,
    distinct query batches streamed, ANI + top-k computed on device, only
    [n_queries, k] results fetched;
  - table mode (`dist`): full int32 dot tiles fetched and mapped to ANI on
    host (the byte-parity TSV path).

vs_baseline: the reference publishes no absolute numbers (BASELINE.md);
we normalize against REF_EST_GENOMES_PER_SEC = 50.0, an order-of-magnitude
estimate of the reference CLI on a 16-thread CPU for 4-Mbp genomes
(~0.25s/genome/thread for needletail+t1ha2 extraction + AVX2 encode).
The number to watch across rounds is `value`.
"""

import json
import time

import numpy as np

REF_EST_GENOMES_PER_SEC = 50.0

GENOME_BP = 4_000_000
SKETCH_BATCH = 32
SKETCH_REPEATS = 5

ANI_DB = 49152  # GTDB-scale resident DB (BASELINE config 5); queries stream
ANI_QUERIES = 2048
ANI_REPEATS = 3
ANI_TOPK = 10
ANI_TABLE_DB = 4096  # full-table (dist) mode fetches M x N ints: keep bounded


def bench_sketch():
    from hypergen_tpu.models.sketcher import Sketcher
    from hypergen_tpu.params import SketchParams

    params = SketchParams()  # k=21, scaled=1500, D=4096, t1ha2
    B = SKETCH_BATCH
    sketcher = Sketcher(params, chunk_positions=1 << 17, batch=B)
    rng = np.random.default_rng(0)

    def fresh_batch():
        return [
            rng.integers(0, 4, size=GENOME_BP, dtype=np.uint8)
            for _ in range(B)
        ]

    # warmup: compile the bucket
    sketcher.collect_batch(sketcher.submit_batch(fresh_batch()))

    batches = [fresh_batch() for _ in range(SKETCH_REPEATS)]
    t0 = time.monotonic()
    n_hashes = 0
    pending = None
    marks = [t0]  # steady-state batch boundaries (window-2 pipeline)
    for genomes in batches:  # overlap host pack with device work
        handle = sketcher.submit_batch(genomes)
        if pending is not None:
            for r in sketcher.collect_batch(pending):
                n_hashes += r["n_hashes"]
            marks.append(time.monotonic())
        pending = handle
    for r in sketcher.collect_batch(pending):
        n_hashes += r["n_hashes"]
    marks.append(time.monotonic())
    dt = marks[-1] - t0
    n = B * SKETCH_REPEATS
    # the chip tunnel in this environment is shared and its bandwidth
    # swings ~5x between runs of identical code (5 to 23 genomes/s observed
    # on the same commit); the median collect-to-collect batch time is the
    # steady-state estimate (min would alias pipeline jitter: two async
    # collects can complete back-to-back), wall rate reported alongside
    per_batch = np.diff(marks)
    med = float(np.median(per_batch)) if len(per_batch) else dt
    return {
        "genomes_per_sec": B / med,
        "genomes_per_sec_wall": n / dt,
        "bp_per_sec": B * GENOME_BP / med,
        "mean_hashes_per_genome": n_hashes / n,
        "sketch_wall_s": dt,
    }


def bench_device_step():
    """Device-pipeline throughput with inputs already resident: what the
    chip itself sustains once the host/tunnel transfer is overlapped or
    amortized (the per-chip number for multi-chip projections)."""
    import jax

    from hypergen_tpu.models.sketcher import (
        make_sketch_step, pack_codes_runs, split_step_output,
    )
    from hypergen_tpu.params import SketchParams, fracminhash_threshold

    p = SketchParams()
    B, NC, C = 8, 32, 1 << 17
    L_ext = NC * C + p.ksize - 1
    L_pad = -(-L_ext // 8) * 8
    enc_cap = -(-(3 * (NC * C // p.scaled) + 512) // 256) * 256
    step = make_sketch_step(
        ksize=p.ksize, seed=p.seed, threshold=fracminhash_threshold(p.scaled),
        hv_d=p.hv_d, batch=B, n_chunks=NC, chunk_positions=C, chunk_cap=8,
        enc_cap=enc_cap, encode_block=512, extract_block=512,
        use_pallas=True, validity="runs",
    )
    rng = np.random.default_rng(7)
    ins = []
    for _ in range(4):
        p2 = np.empty((B, L_pad // 4), np.uint8)
        runs = np.zeros((B, 512, 2), np.int32)
        for i in range(B):
            p2[i], runs[i], _ = pack_codes_runs(
                rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad, 512
            )
        ins.append((jax.device_put(p2), jax.device_put(runs)))
    split_step_output(jax.device_get(step(*ins[0])))  # compile + settle
    times = []
    for d in ins:
        t0 = time.monotonic()
        split_step_output(jax.device_get(step(*d)))
        times.append(time.monotonic() - t0)
    med = float(np.median(times))
    return {"device_step_genomes_per_sec": B / med}


def bench_ani():
    import jax
    import jax.numpy as jnp

    from hypergen_tpu.models.comparator import Comparator, ani_f32_host
    from hypergen_tpu.ops.ani import ani_topk

    rng = np.random.default_rng(1)
    db = rng.integers(-80, 80, size=(ANI_DB, 4096)).astype(np.int16)
    dbn = np.sum(db.astype(np.int64) ** 2, axis=1).astype(np.int32)

    def fresh_q():
        q = rng.integers(-80, 80, size=(ANI_QUERIES, 4096)).astype(np.int16)
        qn = np.sum(q.astype(np.int64) ** 2, axis=1).astype(np.int32)
        return q, qn

    # --- search mode: DB resident, top-k on device, tiny D2H ---------------
    db_dev = jax.device_put(db)
    dbn_dev = jax.device_put(dbn)
    q0, qn0 = fresh_q()
    jax.block_until_ready(
        ani_topk(db_dev, dbn_dev, jnp.asarray(q0), jnp.asarray(qn0), 21, ANI_TOPK)
    )
    queries = [fresh_q() for _ in range(ANI_REPEATS)]
    t0 = time.monotonic()
    for q, qn in queries:
        vals, idx = ani_topk(
            db_dev, dbn_dev, jnp.asarray(q), jnp.asarray(qn), 21, ANI_TOPK
        )
        np.asarray(vals), np.asarray(idx)
    dt_search = time.monotonic() - t0
    search_pairs = ANI_DB * ANI_QUERIES * ANI_REPEATS / dt_search

    # --- table mode: full dot tiles D2H + host float map (dist TSV path,
    # smaller DB slice: D2H of M x N int32 is the dominant term) ------------
    tdb, tdbn = db[:ANI_TABLE_DB], dbn[:ANI_TABLE_DB]
    comp = Comparator(ksize=21, tile_m=ANI_TABLE_DB, tile_n=ANI_QUERIES)
    db_blocks = comp.preload_rows(tdb)
    q0, qn0 = fresh_q()
    for mi, nj, tile in comp.dot_tiles(tdb, q0, r_blocks=db_blocks):
        ani_f32_host(tile, tdbn[mi : mi + tile.shape[0]],
                     qn0[nj : nj + tile.shape[1]], 21)
    t0 = time.monotonic()
    for q, qn in queries:
        for mi, nj, tile in comp.dot_tiles(tdb, q, r_blocks=db_blocks):
            ani_f32_host(tile, tdbn[mi : mi + tile.shape[0]],
                         qn[nj : nj + tile.shape[1]], 21)
    dt_table = time.monotonic() - t0
    table_pairs = ANI_TABLE_DB * ANI_QUERIES * ANI_REPEATS / dt_table

    # --- dist mode @ production threshold: device filter+compact, survivors
    # only cross D2H (the `dist -a 85` path) ------------------------------
    from hypergen_tpu.io.sketch_db import ShardedDB

    def as_db(hv, norms):
        return ShardedDB(
            ksize=21, scaled=1500, canonical=True, seed=123,
            hv_d=hv.shape[1], names=[str(i) for i in range(hv.shape[0])],
            hvs=hv, norms=norms,
        )

    ref_db = as_db(db, dbn)
    ref_blocks = comp.preload_ref(ref_db)
    q0, qn0 = fresh_q()
    comp.ani_pairs_thresholded(
        ref_db, as_db(q0, qn0), symmetric=False, threshold=85.0,
        ref_blocks=ref_blocks,
    )
    t0 = time.monotonic()
    for q, qn in queries:
        comp.ani_pairs_thresholded(
            ref_db, as_db(q, qn), symmetric=False, threshold=85.0,
            ref_blocks=ref_blocks,
        )
    dt_dist = time.monotonic() - t0
    dist_pairs = ANI_DB * ANI_QUERIES * ANI_REPEATS / dt_dist
    return {
        "search_pairs_per_sec": search_pairs,
        "table_pairs_per_sec": table_pairs,
        "dist85_pairs_per_sec": dist_pairs,
    }


def main():
    import jax

    from hypergen_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    sk = bench_sketch()
    dev = bench_device_step()
    an = bench_ani()
    value = round(sk["genomes_per_sec"], 3)
    out = {
        "metric": "genomes sketched/s/chip (4Mbp, k=21, s=1500, D=4096)",
        "value": value,
        "unit": "genomes/s",
        "vs_baseline": round(value / REF_EST_GENOMES_PER_SEC, 3),
        "extra": {
            "backend": backend,
            "genomes_per_sec_wall": round(sk["genomes_per_sec_wall"], 3),
            "bp_per_sec": round(sk["bp_per_sec"], 0),
            "mean_hashes_per_genome": round(sk["mean_hashes_per_genome"], 1),
            "device_step_genomes_per_sec": round(
                dev["device_step_genomes_per_sec"], 3
            ),
            "ani_search_pairs_per_sec": round(an["search_pairs_per_sec"], 0),
            "ani_table_pairs_per_sec": round(an["table_pairs_per_sec"], 0),
            "ani_dist85_pairs_per_sec": round(an["dist85_pairs_per_sec"], 0),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
