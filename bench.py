"""Benchmark harness: genomes sketched/s/chip + ANI pairs/s.

Prints ONE JSON line (last line of output):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Workload (BASELINE.json operating point): k=21, scaled=1500, D=4096.

The headline sketch number is the FULL production path measured end to end
on real FASTA files on disk: native fused parse -> packed 2-bit codes +
run list -> H2D through the chip tunnel -> device hash/dedup/encode ->
fused D2H. A per-stage wall breakdown (fasta_read / pack+dispatch /
collect) is reported so the tunnel share is visible, plus the dispatched
H2D byte count and a direct relay-upload microbenchmark: 2-bit packed
bases are 0.25 byte/bp of irreducible payload, so the measured relay
upload rate (MB/s) x 4 is the hard files-on-disk ceiling (bp/s) through
this tunnel no matter how fast the chip is. Two realism variants
accompany the headline: mixed-length GC-biased genomes with N runs
(exercises bucketing + run-list fallback) and D=8192.

Device-only metrics use chained lax.scan programs with on-device input
generation and R2-R1 differencing (see scripts/profile_device_time.py) —
the axon relay's ~30 ms dispatch + ~150 ms fetch + (executable, inputs)
result cache make single-dispatch timings meaningless.

ANI is measured in the production shapes: resident-DB top-k search (the
BASELINE north star), full-table dist, and thresholded dist.

vs_baseline: the reference publishes no absolute numbers (BASELINE.md);
we normalize against REF_EST_GENOMES_PER_SEC = 50.0, an order-of-magnitude
estimate of the reference CLI on a 16-thread CPU for 4-Mbp genomes. A
*measured* same-pipeline CPU denominator ships alongside it
(cpu_backend_genomes4m_per_sec, scripts/bench_cpu_backend.py) so the
ratio has a calibrated companion.

Relay-proofing (r3 verdict item 1): the axon TPU relay can be down for
hours and hangs jax backend init indefinitely. The backend is probed in a
subprocess under a hard timeout BEFORE the main process touches jax; on
probe failure this run forces the CPU backend, scales the workload to
CPU-feasible sizes, and still emits its JSON line (rc=0) with
backend="cpu (relay down)". Every sub-benchmark is individually fenced so
one failure cannot erase the scoreboard.
"""

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))

REF_EST_GENOMES_PER_SEC = 50.0

# --- workload profiles ------------------------------------------------------
# TPU: the BASELINE operating point. CPU (no accelerator / relay down): the
# same pipeline at sizes a single XLA-CPU core finishes in minutes — the
# point of the CPU line is rc=0 + honest shape-labeled numbers, not speed.
TPU_SIZES = dict(
    # batch=16/group=8 measured best under the background uploader
    # (scripts/profile_uploader.py + interleaved geometry A/B, r5):
    # fewer relay programs + fewer fetches per genome on a serialized pipe
    genome_bp=4_000_000, n_files=32, batch=16, collect_group=8,
    n_files_mixed=16, mixed_batch=8, n_files_d8192=8,
    mixed_bp_range=(1e6, 4e6),
    ani_db=49152, ani_queries=2048, ani_repeats=3, ani_table_db=4096,
)
CPU_SIZES = dict(
    genome_bp=1_000_000, n_files=4, batch=2, collect_group=4,
    n_files_mixed=4, mixed_batch=2, n_files_d8192=2,
    mixed_bp_range=(2e5, 8e5),
    ani_db=8192, ani_queries=512, ani_repeats=1, ani_table_db=1024,
)

ANI_TOPK = 10
_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _probe_backend(timeout_s: float = 180.0):
    """Default backend name, probed in a subprocess under a hard timeout.

    Backend init through a dead relay HANGS (it does not raise) — r3's
    BENCH artifact was a crash record because main() touched
    jax.default_backend() directly. The probe runs a real computation
    (arange sum fetch) so a relay that accepts init but stalls on compute
    also fails it. Returns the backend string or None."""
    # enable the persistent compile cache inside the probe (mirrors
    # utils/jaxcache.py): without it the probe's program cold-compiles
    # remotely every run, and under 2-4x relay weather a 20-60 s compile
    # could eat the timeout and misclassify a live relay as down
    code = (
        "import os, jax, jax.numpy as jnp;"
        "d = os.path.expanduser('~/.cache/hypergen_tpu_jax');"
        "os.makedirs(d, exist_ok=True);"
        "jax.config.update('jax_compilation_cache_dir', d);"
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 1.0);"
        "print('BK', jax.default_backend());"
        "print('OK', int(jnp.arange(8).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    backend = None
    ok = False
    for line in r.stdout.splitlines():
        if line.startswith("BK "):
            backend = line.split(None, 1)[1].strip()
        elif line.strip() == "OK 28":
            ok = True
    return backend if ok else None


def _run_json_script(name: str, timeout_s: float, env_extra=None):
    """Run scripts/<name> in a subprocess; parse its last JSON stdout line."""
    import os

    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        r = subprocess.run(
            [sys.executable, str(Path(__file__).parent / "scripts" / name)],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
    except subprocess.TimeoutExpired:
        return {"error": f"{name}: timeout after {timeout_s}s"}
    if r.returncode != 0:
        return {"error": f"{name}: rc={r.returncode}: {r.stdout[-300:]}"
                         f"{r.stderr[-300:]}"}
    for line in reversed(r.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                break
    return {"error": f"{name}: no JSON line in output"}


def _write_fasta(path: Path, seq: np.ndarray) -> None:
    path.write_bytes(b">g\n" + seq.tobytes() + b"\n")


def _gen_uniform(d: Path, n: int, bp: int, seed0: int) -> list:
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        r = np.random.default_rng(seed0 + i)
        _write_fasta(d / f"g{i:03d}.fna", r.choice(_BASES, size=bp))
        paths.append(d / f"g{i:03d}.fna")
    return paths


def _gen_mixed(d: Path, n: int, seed0: int, bp_range) -> list:
    """Mixed lengths (log-uniform), GC bias, sprinkled N runs."""
    d.mkdir(parents=True, exist_ok=True)
    paths = []
    total_bp = 0
    lo, hi = bp_range
    for i in range(n):
        # lengths from a FIXED stream so warm/timed sets share jit buckets;
        # content from seed0 so the two sets never repeat relay inputs
        bp = int(np.exp(
            np.random.default_rng(555 + i).uniform(np.log(lo), np.log(hi))
        ))
        r = np.random.default_rng(seed0 + i)
        gc = 0.35 if i % 2 else 0.65
        probs = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
        seq = r.choice(_BASES, size=bp, p=probs)
        for _ in range(int(r.integers(2, 30))):  # N runs (assembly gaps)
            s = int(r.integers(0, bp - 500))
            seq[s : s + int(r.integers(5, 400))] = ord("N")
        _write_fasta(d / f"m{i:03d}.fna", seq)
        paths.append(d / f"m{i:03d}.fna")
        total_bp += bp
    return paths, total_bp


def _sketch_rate(paths, params, batch, warm_paths=None, group=None):
    """(genomes/s, wall, stage_times, h2d_bytes, wire_counts).

    warm_paths (same length buckets, DIFFERENT content — the relay caches
    (executable, inputs), so re-timing identical files would lie) are
    sketched first untimed to absorb compiles; pass [] to skip warming
    (already-warm repeat runs)."""
    from hypergen_tpu.models.sketcher import Sketcher

    kw = {"collect_group": group} if group else {}
    sk = Sketcher(params, batch=batch, **kw)
    warm = warm_paths if warm_paths is not None else paths[:2]
    if warm:
        sk.sketch_files(warm, progress=False)
    t0 = time.monotonic()
    out = sk.sketch_files(paths, progress=False)
    dt = time.monotonic() - t0
    assert len(out) == len(paths)
    wire = {
        "programs": sk.last_program_dispatches,
        "fetches": sk.last_d2h_fetches,
    }
    return (
        len(paths) / dt, dt, dict(sk.last_stage_times), sk.last_h2d_bytes,
        wire,
    )


def bench_sketch(tmp: Path, sizes: dict):
    from hypergen_tpu.params import SketchParams

    res = {}
    # --- headline: uniform genomes, default params, MEDIAN OF 3 runs over
    # DISTINCT file sets (re-timing the same files would hit the relay's
    # (executable, inputs) result cache and inflate reps 2-3; per-rep rates
    # ship in the JSON so relay weather is visible, r4 verdict item 5) ----
    # warm with 2 BATCHES worth of files so the fused-concat program shape
    # compiles outside the timed region (2 files would warm the step but
    # leave the K=2 concat to cold-compile inside rep 0)
    uwarm = _gen_uniform(
        tmp / "uniform_warm", 2 * sizes["batch"], sizes["genome_bp"], 700
    )
    reps = []
    for rep in range(3):
        paths = _gen_uniform(
            tmp / f"uniform{rep}", sizes["n_files"], sizes["genome_bp"],
            100 + 1000 * rep,
        )
        # rep 0 warms on dedicated same-bucket different-content files;
        # later reps are already compile-warm
        r, dt, stages, h2d, wire = _sketch_rate(
            paths, SketchParams(), batch=sizes["batch"],
            warm_paths=uwarm if rep == 0 else [],
            group=sizes.get("collect_group"),
        )
        reps.append((r, dt, stages, h2d, wire))
    reps_rates = [r for r, *_ in reps]
    mid = int(np.argsort(reps_rates)[len(reps_rates) // 2])
    rate, dt, stages, h2d, wire = reps[mid]
    total = sum(stages.values()) or 1.0
    res["genomes_per_sec"] = rate
    res["genomes_per_sec_reps"] = [round(r, 3) for r in reps_rates]
    res["genome_bp"] = sizes["genome_bp"]
    res["bp_per_sec"] = rate * sizes["genome_bp"]
    res["sketch_wall_s"] = dt
    res["stage_shares"] = {
        k: round(v / total, 3) for k, v in sorted(stages.items())
    }
    # tunnel attribution: dispatched H2D payload and the effective rate it
    # moved at (2-bit packing makes the payload ~0.25 byte/bp — if
    # effective_h2d tracks the microbenchmarked relay rate, the headline
    # is upload-bound and the chip is idle waiting on the wire)
    res["h2d_mbytes"] = round(h2d / 1e6, 1)
    res["effective_h2d_mbytes_per_sec"] = round(h2d / dt / 1e6, 1)
    res["wire_programs"] = wire["programs"]
    res["wire_fetches"] = wire["fetches"]
    # --- realism: mixed lengths + GC bias + N runs (BASELINE config 3).
    # Warm set = same seeds+900 offset -> same length profile (same jit
    # buckets), different content (defeats the relay result cache).
    wpaths, _ = _gen_mixed(
        tmp / "mixed_warm", sizes["n_files_mixed"], 900,
        sizes["mixed_bp_range"],
    )
    mpaths, mixed_bp = _gen_mixed(
        tmp / "mixed", sizes["n_files_mixed"], 1900, sizes["mixed_bp_range"]
    )
    mrate, mdt, _, _, _ = _sketch_rate(
        mpaths, SketchParams(), batch=sizes["mixed_batch"], warm_paths=wpaths
    )
    res["genomes_per_sec_mixed"] = mrate
    res["bp_per_sec_mixed"] = mixed_bp / mdt
    # --- D=8192 -------------------------------------------------------------
    n8 = sizes["n_files_d8192"]
    drate, _, _, _, _ = _sketch_rate(
        paths[:n8], SketchParams(hv_d=8192), batch=sizes["mixed_batch"],
        warm_paths=paths[n8 : n8 + 2],
    )
    res["genomes_per_sec_d8192"] = drate
    return res


def bench_h2d_rate():
    """Direct relay H2D microbenchmark: MB/s for bulk uploads.

    device_put through the relay is lazy; a jit'ed reduction + scalar
    fetch forces the transfer. Two sizes with distinct contents (the relay
    caches (executable, inputs)), differenced to cancel the fixed
    dispatch/fetch round-trip cost."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    sizes = (8 << 20, 32 << 20)
    f = {}
    for n in sizes:
        f[n] = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        # warm: compile + first transfer (untimed)
        int(f[n](rng.integers(0, 255, size=n, dtype=np.uint8)))
    t = {}
    for n in sizes:
        buf = rng.integers(0, 255, size=n, dtype=np.uint8)
        t0 = time.monotonic()
        int(f[n](buf))
        t[n] = time.monotonic() - t0
    d_bytes = sizes[1] - sizes[0]
    d_t = t[sizes[1]] - t[sizes[0]]
    if d_t <= 0:
        return {"relay_h2d_mbytes_per_sec": None}
    rate = d_bytes / d_t / 1e6
    return {
        "relay_h2d_mbytes_per_sec": round(rate, 1),
        # 2-bit packing: 1 byte carries 4 bp -> hard ceiling for ANY
        # files-on-disk sketch rate through this tunnel
        "tunnel_ceiling_genomes4m_per_sec": round(rate * 4 / 4.194, 1),
    }


# Vector lane-ops per HASHED k-mer position, counted from the traced jaxpr
# of one kernel position step (scripts/audit_kernel_ops.py: base extract +
# _advance_hash + slot emit at k=21, canonical t1ha2, cap=4; t1ha2 alone is
# 584 of these — mul 76 / addsub 190 / shift 135 / cmp 97 / logic 94 /
# convert 89 / select 20). r1-r4 used an ASSUMED 300, which understated the
# work 2.3x and made the kernel look 4x off speed-of-light (r4 verdict
# item 2); the audit puts the measured 5.9 ms hash stage at ~0.85 of the
# 4-ALU VPU issue peak — i.e. the kernel is issue-bound, as the r2
# analysis argued.
T1HA2_VPU_OPS_PER_POSITION = 701
# r5 warm-split kernel: the k-1 halo positions per cell run the 73-op
# roll-only warm-up (no t1ha2), so the effective factor on useful positions
# is 1 + roll_ops/full_ops * (k-1)/lsub at the production shape
# (cells=2048 -> lsub=64, k=21), not the old full-body (lsub+k-1)/lsub.
# Both constants come from scripts/audit_kernel_ops.py.
T1HA2_ROLL_OPS_PER_POSITION = 73
HASH_HALO_FACTOR = 1 + (
    T1HA2_ROLL_OPS_PER_POSITION / T1HA2_VPU_OPS_PER_POSITION
) * (21 - 1) / 64

# per-chip peak rates from public spec sheets; used ONLY to grade measured
# numbers as a fraction of speed-of-light (BASELINE "speed-of-light" goal).
# vpu_ops = 8 sublanes x 128 lanes x 4 ALUs x clock x cores. Clocks are
# back-derived from the public bf16 TFLOPs (e.g. v5e: 197e12 bf16 =
# 4 MXUs x 16384 MACs x 2 x 1.5e9), so the v5e VPU peak is 4096 x 1.5e9 =
# 6.1e12 lane-ops/s (public docs don't spell VPU issue width per
# generation; treat the SoL fraction as order-of-magnitude honest, the
# measured ops/s as exact).
CHIP_PEAKS = {
    "TPU v4": {"int8_tops": 275.0, "vpu_ops_per_sec": 2 * 4096 * 1.05e9},
    "TPU v5e": {"int8_tops": 394.0, "vpu_ops_per_sec": 4096 * 1.50e9},
    "TPU v5 lite": {"int8_tops": 394.0, "vpu_ops_per_sec": 4096 * 1.50e9},
    "TPU v5p": {"int8_tops": 918.0, "vpu_ops_per_sec": 2 * 4096 * 1.75e9},
    "TPU v5": {"int8_tops": 918.0, "vpu_ops_per_sec": 2 * 4096 * 1.75e9},
    "TPU v6e": {"int8_tops": 1836.0, "vpu_ops_per_sec": 4096 * 1.85e9},
    "TPU v6 lite": {"int8_tops": 1836.0, "vpu_ops_per_sec": 4096 * 1.85e9},
}


def _chip_peaks():
    import jax

    kind = jax.devices()[0].device_kind
    for key, peaks in CHIP_PEAKS.items():
        if kind.lower().startswith(key.lower()):
            return kind, peaks
    return kind, None


def bench_device():
    """Tunnel-free device-only rates (chained-scan differencing).

    Each chained program costs ~40-90 s of remote executable load even
    compile-cached, so only BASELINE-graded stages run here: the packed
    step at NC=8 (bounded load time) and NC=32 (the tightest long-chain
    production-shape number), the hash stage alone (VPU speed-of-light
    numerator), and the search dot (MXU MFU numerator). Deeper breakdowns
    live in scripts/profile_device_time.py / profile_packed_substages.py.
    """
    import profile_device_time as pdt

    out = {}
    r1, r2 = pdt.R1, pdt.R2

    def differenced(fn, ladder, rate_key, **kw):
        """(t_R2-t_R1)/(R2-R1) can go NEGATIVE on short chains when the
        relay's (executable, inputs) cache or a weather swing makes the
        long chain land faster than the short one (observed live: NC=8
        t2=0.045s t8=0.041s). A nonpositive rate means the measurement is
        invalid, not that the chip ran backwards — climb the chain-length
        ladder until the difference is positive, else give up (caller
        falls back / omits the metric)."""
        try:
            for a, b in ladder:
                pdt.R1, pdt.R2 = a, b
                s = fn(**kw)
                if s[rate_key] > 0:
                    return s
        finally:
            pdt.R1, pdt.R2 = r1, r2
        return None

    # NC=8 (1 Mbp genomes) keeps the chained program's remote load time
    # bounded; device throughput is ~linear in bp, so Mbp/s is the portable
    # number. The fused packed step is the production path. Long chains
    # (R=4/20) shrink the relay noise band to well under 1 ms and are the
    # retry rung when the default short chain comes back nonpositive.
    step = differenced(
        pdt.sketch_step_packed_device_time, [(r1, r2), (4, 20)],
        "mbp_per_s", NC=8,
    )
    # tightest measurement: production shape (8 x 4.19 Mbp), long chains
    step32 = differenced(
        pdt.sketch_step_packed_device_time, [(4, 20), (4, 28)],
        "mbp_per_s", NC=32,
    )
    hash32 = differenced(
        pdt.packed_hash_stage_device_time, [(4, 20), (4, 28)],
        "mbp_per_s", NC=32,
    )
    if step is None and step32 is None:
        raise RuntimeError("device differencing invalid at every chain len")
    if step is None:  # NC=8 unusable: report the tighter NC=32 rate for both
        out["device_step_nc8_fallback"] = "nc32"
        step = step32
    if step32 is None:
        out["device_step_nc32_fallback"] = "nc8"
        step32 = step
    out["device_step_mbp_per_sec"] = step["mbp_per_s"]
    out["device_step_genomes4m_per_sec"] = step["mbp_per_s"] / 4.194
    out["device_step32_mbp_per_sec"] = step32["mbp_per_s"]
    out["device_step32_genomes4m_per_sec"] = step32["mbp_per_s"] / 4.194
    dot = differenced(
        pdt.search_matmul_device_time, [(r1, r2), (4, 20)], "int8_tops"
    )
    if dot is None:
        raise RuntimeError("search-dot differencing invalid")
    out["device_search_int8_tops"] = dot["int8_tops"]
    # the 3-matmul Karatsuba "small" split is what run_search_cli actually
    # uses for production-scale HVs (|hv| <= SMALL_SPLIT_MAX — all genomes
    # <~9 Mbp at scaled=1500; routing pinned in tests/test_search_routing);
    # report it beside the any-int16 4-pass split (r4 verdict item 3)
    dot_small = differenced(
        pdt.search_matmul_device_time, [(r1, r2), (4, 20)], "int8_tops",
        mode="small",
    )
    if dot_small is not None:
        out["device_search_int8_tops_small"] = dot_small["int8_tops"]
        out["device_search_pairs_per_sec_small"] = dot_small["pairs_per_s"]
    # speed-of-light grading (BASELINE goal): measured / chip peak
    kind, peaks = _chip_peaks()
    out["device_chip_kind"] = kind
    if peaks:
        out["mfu_search_dot"] = dot["int8_tops"] / peaks["int8_tops"]
        if dot_small is not None:
            out["mfu_search_dot_small"] = (
                dot_small["int8_tops"] / peaks["int8_tops"]
            )
    if hash32 is not None:  # hash-stage SoL is an extra, not a gate
        # positions_per_s counts USEFUL positions; the kernel hashes
        # halo-duplicated ones too, and those issue the same instructions
        vpu_ops = (
            hash32["positions_per_s"] * HASH_HALO_FACTOR
            * T1HA2_VPU_OPS_PER_POSITION
        )
        out["device_hash_vpu_ops_per_sec"] = vpu_ops
        if peaks:
            out["vpu_sol_fraction_hash"] = vpu_ops / peaks["vpu_ops_per_sec"]
    return out


def bench_ani(sizes: dict):
    import jax
    import jax.numpy as jnp

    from hypergen_tpu.models.comparator import Comparator, ani_f32_host
    from hypergen_tpu.ops.ani import ani_topk

    ANI_DB = sizes["ani_db"]
    ANI_QUERIES = sizes["ani_queries"]
    ANI_REPEATS = sizes["ani_repeats"]
    ANI_TABLE_DB = sizes["ani_table_db"]

    rng = np.random.default_rng(1)
    db = rng.integers(-80, 80, size=(ANI_DB, 4096)).astype(np.int16)
    dbn = np.sum(db.astype(np.int64) ** 2, axis=1).astype(np.int32)

    def fresh_q():
        q = rng.integers(-80, 80, size=(ANI_QUERIES, 4096)).astype(np.int16)
        qn = np.sum(q.astype(np.int64) ** 2, axis=1).astype(np.int32)
        return q, qn

    # --- search mode: DB resident (pre-split int8 planes: the int16->int8
    # split is per-DB work, not per-query work), top-k on device, tiny D2H.
    # Production representation: SmallSplit (3-matmul, one MXU pass fewer)
    # when the values fit, like Comparator.preload_rows / run_search_cli.
    from hypergen_tpu.ops.ani import (
        SMALL_SPLIT_MAX,
        abs_bound,
        presplit_rows,
        presplit_rows_small,
    )

    small = abs_bound(db) <= SMALL_SPLIT_MAX  # queries share the range
    mode = "small" if small else True
    splitter = presplit_rows_small if small else presplit_rows
    db_dev = jax.jit(splitter)(jax.device_put(db))
    dbn_dev = jax.device_put(dbn)
    q0, qn0 = fresh_q()
    jax.device_get(
        ani_topk(db_dev, dbn_dev, jnp.asarray(q0), jnp.asarray(qn0), 21,
                 ANI_TOPK, use_mxu=mode)
    )
    queries = [fresh_q() for _ in range(ANI_REPEATS)]
    t0 = time.monotonic()
    for q, qn in queries:
        vals, idx, dots = ani_topk(
            db_dev, dbn_dev, jnp.asarray(q), jnp.asarray(qn), 21, ANI_TOPK,
            use_mxu=mode,
        )
        np.asarray(vals), np.asarray(idx), np.asarray(dots)
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


def _fenced(extra: dict, key: str, fn, *args):
    """Run one sub-benchmark; a failure becomes extra[key_error], never a
    dead scoreboard (the ONE JSON line must survive every weather)."""
    try:
        return fn(*args)
    except Exception as e:  # noqa: BLE001 - deliberate catch-all fence
        extra[f"{key}_error"] = f"{type(e).__name__}: {e}"[:300]
        return None


def main():
    backend = _probe_backend()
    relay_down = backend is None

    import jax

    from hypergen_tpu.utils.jaxcache import enable_compilation_cache

    if relay_down:
        # sitecustomize pins JAX_PLATFORMS=axon; only a post-import config
        # update reliably forces CPU (CLAUDE.md environment notes)
        jax.config.update("jax_platforms", "cpu")
        backend = "cpu"
    enable_compilation_cache()
    backend_label = "cpu (relay down)" if relay_down else backend
    is_tpu = backend == "tpu"
    sizes = TPU_SIZES if is_tpu else CPU_SIZES

    extra = {"backend": backend_label}
    with tempfile.TemporaryDirectory(prefix="hgbench_") as td:
        sk = _fenced(extra, "sketch", bench_sketch, Path(td), sizes)
    # the packed Pallas step cannot lower off-TPU; a CPU-backend bench run
    # (no accelerator / relay down) must still emit its JSON line
    dev = _fenced(extra, "device", bench_device) if is_tpu else None
    h2d = _fenced(extra, "h2d", bench_h2d_rate) if is_tpu else None
    an = _fenced(extra, "ani", bench_ani, sizes)

    value = round(sk["genomes_per_sec"], 3) if sk else 0.0
    bp_label = f"{sizes['genome_bp'] / 1e6:g}Mbp"
    out = {
        "metric": f"genomes sketched/s/chip ({bp_label}, k=21, s=1500, "
                  "D=4096, files on disk end-to-end, median of 3)",
        "value": value,
        "unit": "genomes/s",
        # normalized to the r1-r3 headline unit (4.0 Mbp genomes; rate is
        # linear in bp), so the ratio is comparable across rounds even
        # when the CPU fallback runs smaller files
        "vs_baseline": round(
            (sk["bp_per_sec"] / 4.0e6 if sk else 0.0)
            / REF_EST_GENOMES_PER_SEC, 3
        ),
        "extra": extra,
    }
    if sk:
        extra.update({
            "bp_per_sec": round(sk["bp_per_sec"], 0),
            "genomes_per_sec_reps": sk["genomes_per_sec_reps"],
            "stage_shares": sk["stage_shares"],
            "h2d_mbytes": sk["h2d_mbytes"],
            "effective_h2d_mbytes_per_sec":
                sk["effective_h2d_mbytes_per_sec"],
            "genomes_per_sec_mixed": round(sk["genomes_per_sec_mixed"], 3),
            "bp_per_sec_mixed": round(sk["bp_per_sec_mixed"], 0),
            "genomes_per_sec_d8192": round(sk["genomes_per_sec_d8192"], 3),
        })
    if an:
        extra.update({
            "ani_search_pairs_per_sec": round(an["search_pairs_per_sec"], 0),
            "ani_table_pairs_per_sec": round(an["table_pairs_per_sec"], 0),
            "ani_dist85_pairs_per_sec": round(an["dist85_pairs_per_sec"], 0),
            "ani_db_rows": sizes["ani_db"],
        })
    if h2d:
        extra.update(h2d)
        ceil = h2d.get("tunnel_ceiling_genomes4m_per_sec")
        rate_mbs = h2d.get("relay_h2d_mbytes_per_sec")
        if sk and ceil:
            # how close the end-to-end pipeline runs to the tunnel's
            # information-theoretic limit (2 bits/bp of random DNA is
            # incompressible); ~1.0 means the chip is upload-starved and
            # the headline measures the relay, not the framework.
            # PROMOTED to a first-class field beside vs_baseline: through
            # a serialized ~30-45 MB/s tunnel this physical ratio is the
            # stable signal — the absolute genomes/s swings 2-4x with
            # relay weather (r4 verdict item 5)
            frac = round((sk["bp_per_sec"] / 4.194e6) / ceil, 2)
            extra["fraction_of_tunnel_ceiling"] = frac
            out["fraction_of_tunnel_ceiling"] = frac
            out["relay_h2d_mbytes_per_sec"] = rate_mbs
            # the relay's rate drifts minute-to-minute, and the rate
            # microbenchmark runs at a different moment than the timed
            # reps — the BEST rep is the cleanest weather-matched
            # observation of what the pipeline achieves (r5 live run:
            # reps [26.2, 14.9, 14.8] against a 28.7 ceiling = best 0.91
            # while the median caught a mid-bench weather collapse)
            best = max(sk["genomes_per_sec_reps"])
            extra["fraction_of_tunnel_ceiling_best"] = round(
                best * sk["genome_bp"] / 4.194e6 / ceil, 2
            )
        if sk and rate_mbs:
            # wire-model accounting: the relay serializes uploads, result
            # fetches AND per-program dispatch overhead on one pipe
            # (scripts/profile_relay_overlap.py: fetch-under-upload wall ==
            # solo-sum), so the irreducible wall per run is
            #   upload_bytes/rate + ~30 ms * programs + ~150 ms * fetches.
            # fraction_of_wire_model ~1.0 means the pipeline keeps the
            # pipe busy every second it exists; raising it further needs
            # fewer programs/fetches per genome, not better overlap.
            wire_s = (
                sk["h2d_mbytes"] / rate_mbs
                + 0.03 * sk["wire_programs"]
                + 0.15 * sk["wire_fetches"]
            )
            model_rate = sizes["n_files"] / wire_s
            extra["wire_model"] = {
                "programs": sk["wire_programs"],
                "fetches": sk["wire_fetches"],
                "irreducible_wall_s": round(wire_s, 2),
                "genomes_per_sec_at_model": round(model_rate, 1),
            }
            extra["fraction_of_wire_model"] = round(
                sk["genomes_per_sec"] / model_rate, 2
            )
    if dev:
        extra.update({
            "device_step_genomes4m_per_sec": round(
                dev["device_step_genomes4m_per_sec"], 1
            ),
            # per-chip rate vs the same reference estimate, tunnel excluded
            # (the headline `value` includes the ~10-30 MB/s relay, which a
            # real deployment does not have)
            "device_vs_baseline": round(
                dev["device_step_genomes4m_per_sec"] / REF_EST_GENOMES_PER_SEC,
                2,
            ),
            "device_step_mbp_per_sec": round(dev["device_step_mbp_per_sec"], 0),
            # tightest production-shape long-chain measurement (NC=32,
            # R=4/20); the NC=8 number above is the conservative bounded-
            # load-time variant — the ~10-15% gap between them is real
            # (per-dispatch fixed work amortizes over 4x more bp at NC=32)
            "device_step32_mbp_per_sec": round(
                dev["device_step32_mbp_per_sec"], 0
            ),
            "device_step32_genomes4m_per_sec": round(
                dev["device_step32_genomes4m_per_sec"], 1
            ),
            "device_search_int8_tops": round(
                dev["device_search_int8_tops"], 1
            ),
            "device_search_int8_tops_small": round(
                dev["device_search_int8_tops_small"], 1
            ) if "device_search_int8_tops_small" in dev else None,
            "device_search_mpairs_per_sec_small": round(
                dev["device_search_pairs_per_sec_small"] / 1e6, 0
            ) if "device_search_pairs_per_sec_small" in dev else None,
            # BASELINE speed-of-light grading: measured / public chip peak
            "device_chip_kind": dev["device_chip_kind"],
            "mfu_search_dot": round(dev["mfu_search_dot"], 3)
            if "mfu_search_dot" in dev else None,
            "mfu_search_dot_small": round(dev["mfu_search_dot_small"], 3)
            if "mfu_search_dot_small" in dev else None,
            "device_hash_vpu_ops_per_sec": round(
                dev["device_hash_vpu_ops_per_sec"], 0
            ) if "device_hash_vpu_ops_per_sec" in dev else None,
            "vpu_sol_fraction_hash": round(dev["vpu_sol_fraction_hash"], 3)
            if "vpu_sol_fraction_hash" in dev else None,
        })
        for k in ("device_step_nc8_fallback", "device_step_nc32_fallback"):
            if k in dev:
                extra[k] = dev[k]
    # measured same-pipeline CPU denominator next to the 50/s estimate
    # (r3 verdict item 5) and the pod-path serialization smoke test
    # (item 4) — both CPU-only subprocesses, immune to relay weather
    extra["cpu_backend"] = _run_json_script("bench_cpu_backend.py", 900)
    extra["scaling_cpu_2proc"] = _run_json_script(
        "bench_scaling_cpu.py", 1500, {"HG_SCALING_REPEATS": "1"}
    )
    sc = extra["scaling_cpu_2proc"]
    if isinstance(sc, dict):
        effs = [sc.get("sketch_eff"), sc.get("search_eff")]
        if all(isinstance(e, (int, float)) for e in effs):
            extra["scaling_efficiency_cpu_2proc"] = min(effs)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
