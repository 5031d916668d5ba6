"""Benchmark harness: genomes sketched/s/chip + ANI pairs/s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Workload (BASELINE.json operating point): k=21, scaled=1500, D=4096,
synthetic bacterial-scale genomes (4 Mbp). The sketch measurement covers the
full device pipeline per genome (H2D transfer of base codes, k-mer hashing,
FracMinHash, dedup, HDC encode, D2H of the HV) plus host compression —
i.e. everything after FASTA parsing. The ANI measurement times exact-int32
HV dot products + ANI map for a query-vs-DB block.

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
N_GENOMES = 24
SKETCH_REPEATS = 3

ANI_DB = 4096
ANI_QUERIES = 2048


def bench_sketch():
    import jax

    from hypergen_tpu.models.sketcher import Sketcher
    from hypergen_tpu.params import SketchParams

    params = SketchParams()  # k=21, scaled=1500, D=4096, t1ha2
    B = 8
    sketcher = Sketcher(params, chunk_positions=1 << 17, batch=B)
    rng = np.random.default_rng(0)
    genomes = [
        rng.integers(0, 4, size=GENOME_BP, dtype=np.uint8)
        for _ in range(N_GENOMES)
    ]

    # warmup: compile the bucket
    sketcher.collect_batch(sketcher.submit_batch(genomes[:B]))

    import collections

    t0 = time.monotonic()
    n_hashes = 0
    window = collections.deque()
    for _ in range(SKETCH_REPEATS):
        for j in range(0, N_GENOMES, B):
            window.append(sketcher.submit_batch(genomes[j : j + B]))
            if len(window) >= 3:
                for r in sketcher.collect_batch(window.popleft()):
                    n_hashes += r["n_hashes"]
    while window:
        for r in sketcher.collect_batch(window.popleft()):
            n_hashes += r["n_hashes"]
    dt = time.monotonic() - t0
    n = N_GENOMES * SKETCH_REPEATS
    return {
        "genomes_per_sec": n / dt,
        "bp_per_sec": n * GENOME_BP / dt,
        "mean_hashes_per_genome": n_hashes / n,
        "sketch_wall_s": dt,
    }


def bench_ani():
    import jax
    import jax.numpy as jnp

    from hypergen_tpu.models.comparator import Comparator, ani_f32_host

    rng = np.random.default_rng(1)
    db = rng.integers(-80, 80, size=(ANI_DB, 4096)).astype(np.int16)
    q = rng.integers(-80, 80, size=(ANI_QUERIES, 4096)).astype(np.int16)
    dbn = np.sum(db.astype(np.int64) ** 2, axis=1).astype(np.int32)
    qn = np.sum(q.astype(np.int64) ** 2, axis=1).astype(np.int32)

    comp = Comparator(ksize=21, tile_m=ANI_DB, tile_n=ANI_QUERIES)
    # warmup
    for _, _, tile in comp.dot_tiles(db, q):
        pass

    t0 = time.monotonic()
    reps = 5
    for _ in range(reps):
        for mi, nj, tile in comp.dot_tiles(db, q):
            ani_f32_host(tile, dbn[mi : mi + tile.shape[0]],
                         qn[nj : nj + tile.shape[1]], 21)
    dt = time.monotonic() - t0
    pairs = ANI_DB * ANI_QUERIES * reps
    return {"ani_pairs_per_sec": pairs / dt, "ani_wall_s": dt}


def main():
    import jax

    from hypergen_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    sk = bench_sketch()
    an = bench_ani()
    value = round(sk["genomes_per_sec"], 3)
    out = {
        "metric": "genomes sketched/s/chip (4Mbp, k=21, s=1500, D=4096)",
        "value": value,
        "unit": "genomes/s",
        "vs_baseline": round(value / REF_EST_GENOMES_PER_SEC, 3),
        "extra": {
            "backend": backend,
            "bp_per_sec": round(sk["bp_per_sec"], 0),
            "mean_hashes_per_genome": round(sk["mean_hashes_per_genome"], 1),
            "ani_pairs_per_sec": round(an["ani_pairs_per_sec"], 0),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
