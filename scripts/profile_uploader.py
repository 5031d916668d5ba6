"""E2E A/B of the background uploader thread + batch/group geometry.

The r5 wire model (profile_relay_overlap.py: uploads, fetches AND
per-program relay overhead all serialize on one pipe) says the steady-state
wall per G genomes is

    bytes/rate + 0.03 s * programs + 0.15 s * fetches

so beyond keeping the wire fed (the uploader thread's job), the only
levers are fewer programs (bigger batch) and fewer fetches (bigger
collect_group). This script measures files-on-disk sketch_files under
several (upload_threads, batch, collect_group) configs, A/B interleaved
with DISTINCT file contents per run (the relay caches (executable,
inputs)), and prints the achieved fraction of the per-config wire model.

Run when the relay is up, with no other CPU-heavy job on this 1-core box:
    python scripts/profile_uploader.py [n_files per run, default 32]
"""

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax

BP = 4_190_000
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

# (upload_threads, batch, collect_group)
CONFIGS = [
    (0, 8, 4),   # r4 production shape, synchronous dispatch (baseline)
    (1, 8, 4),   # + uploader thread
    (1, 16, 4),  # fewer step programs
    (1, 8, 8),   # fewer fetches
    (1, 16, 8),  # both
]


def _gen(d: Path, n: int, seed0: int):
    d.mkdir(parents=True, exist_ok=True)
    out = []
    for i in range(n):
        r = np.random.default_rng(seed0 + i)
        p = d / f"g{seed0 + i}.fna"
        p.write_bytes(b">g\n" + r.choice(BASES, size=BP).tobytes() + b"\n")
        out.append(p)
    return out


def run_config(paths, threads, batch, group):
    from hypergen_tpu.models.sketcher import Sketcher
    from hypergen_tpu.params import SketchParams

    sk = Sketcher(
        SketchParams(), batch=batch, collect_group=group,
        upload_threads=threads,
    )
    t0 = time.monotonic()
    out = sk.sketch_files(paths, progress=False)
    dt = time.monotonic() - t0
    assert len(out) == len(paths)
    return dt, sk


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(f"backend: {jax.default_backend()}; {n} x {BP/1e6:.2f} Mbp/run",
          flush=True)
    with tempfile.TemporaryDirectory(prefix="hgup_") as td:
        d = Path(td)
        # one FULL-shape warm pass per (batch, group) config, untimed:
        # a 2-file warm misses the fused-concat program shapes, which
        # would then cold-compile inside the timed region
        seed = 50_000
        seen = set()
        for threads, batch, group in CONFIGS:
            if (batch, group) not in seen:
                wp = _gen(d / f"warm_b{batch}g{group}", n, seed)
                seed += n
                run_config(wp, threads, batch, group)
                seen.add((batch, group))
        seed = 0
        for rep in range(2):  # A/B interleaved twice: weather visibility
            for threads, batch, group in CONFIGS:
                paths = _gen(d / f"r{rep}t{threads}b{batch}g{group}", n, seed)
                seed += n
                dt, sk = run_config(paths, threads, batch, group)
                h2d = sk.last_h2d_bytes / 1e6
                progs = sk.last_program_dispatches
                fets = sk.last_d2h_fetches
                eff = h2d / dt
                st = {k: round(v, 2)
                      for k, v in sorted(sk.last_stage_times.items())}
                print(
                    f"rep{rep} threads={threads} batch={batch:2d} "
                    f"group={group}: {n/dt:6.2f} g/s ({dt:5.2f} s, "
                    f"h2d {h2d:.0f} MB @ {eff:4.1f} MB/s eff, "
                    f"{progs} progs, {fets} fetches) stages={st}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
