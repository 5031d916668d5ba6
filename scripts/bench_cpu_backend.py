"""Measured CPU-backend denominator for the bench's vs_baseline ratio.

The reference publishes no absolute throughput (BASELINE.md), so bench.py
normalizes its headline against REF_EST_GENOMES_PER_SEC = 50.0 — an
order-of-magnitude estimate of the reference Rust CLI on a 16-thread CPU.
This script measures what THIS framework's own `-D cpu` end-to-end path
does on this machine (files on disk -> .sketch records, XLA CPU backend,
single core), so the headline ratio ships next to a measured same-pipeline
CPU number instead of resting on the estimate alone (r3 verdict item 5).

Prints one JSON line. Run standalone or via bench.py (subprocess).
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

GENOME_BP = 1_000_000  # ~1.6 s/genome on one core; 4 Mbp would tell the
N_FILES = 3            # same rate 4x slower (throughput is linear in bp)
_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def main():
    from hypergen_tpu.models.sketcher import Sketcher
    from hypergen_tpu.params import SketchParams
    from hypergen_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    with tempfile.TemporaryDirectory(prefix="hgcpu_") as td:
        d = Path(td)
        paths = []
        for i in range(N_FILES + 1):  # +1 warm file (absorbs compiles)
            r = np.random.default_rng(7000 + i)
            p = d / f"g{i}.fna"
            p.write_bytes(
                b">g\n" + r.choice(_BASES, size=GENOME_BP).tobytes() + b"\n"
            )
            paths.append(p)
        sk = Sketcher(SketchParams(), batch=1)
        sk.sketch_files(paths[:1], progress=False)  # warm/compile
        t0 = time.monotonic()
        out = sk.sketch_files(paths[1:], progress=False)
        dt = time.monotonic() - t0
        assert len(out) == N_FILES
    mbp_per_sec = N_FILES * GENOME_BP / dt / 1e6
    print(json.dumps({
        "cpu_backend_mbp_per_sec": round(mbp_per_sec, 3),
        # the headline unit: 4 Mbp genomes/s (rate is linear in bp)
        "cpu_backend_genomes4m_per_sec": round(mbp_per_sec / 4.194, 4),
        "files": N_FILES,
        "genome_bp": GENOME_BP,
    }))


if __name__ == "__main__":
    main()
