"""Fused packed kernel: real-TPU Mosaic compile + end-to-end sketch parity.

Compares the production packed-mode Sketcher against the unfused runs-path
Sketcher (itself XLA/oracle-pinned) on genomes with interior N runs and
non-bucket lengths — the full step must be bit-identical.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

from hypergen_tpu.io.fastx import INVALID
from hypergen_tpu.models.sketcher import Sketcher
from hypergen_tpu.params import SketchParams
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(11)
p = SketchParams()
genomes = []
for L in (300_000, 131_000):
    codes = rng.integers(0, 4, size=L).astype(np.uint8)
    for _ in range(4):
        s = int(rng.integers(0, L - 500))
        codes[s : s + int(rng.integers(5, 400))] = INVALID
    genomes.append(codes)

ref = Sketcher(p, batch=len(genomes), use_pallas=True)
ref.packed_mode = False  # unfused rolling kernel + runs-mask validity
new = Sketcher(p, batch=len(genomes), use_pallas=True)
assert new.packed_mode
r_ref = ref.collect_batch(ref.submit_batch(genomes))
r_new = new.collect_batch(new.submit_batch(genomes))
for i, (a, b) in enumerate(zip(r_ref, r_new)):
    assert a["n_hashes"] == b["n_hashes"], (i, a["n_hashes"], b["n_hashes"])
    assert a["norm2"] == b["norm2"]
    np.testing.assert_array_equal(a["hv"], b["hv"])
    print(f"genome {i}: n_hashes={a['n_hashes']} bit-exact", flush=True)
print("packed kernel TPU parity OK", flush=True)
