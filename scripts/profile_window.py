"""Serialized vs window-2 submit/collect through the relay."""
import time
import numpy as np
from hypergen_tpu.models.sketcher import Sketcher
from hypergen_tpu.params import SketchParams
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
B, BP, REPS = 32, 4_000_000, 3
rng = np.random.default_rng(11)
sk = Sketcher(SketchParams(), chunk_positions=1 << 17, batch=B)
mk = lambda: [rng.integers(0, 4, size=BP, dtype=np.uint8) for _ in range(B)]
sk.collect_batch(sk.submit_batch(mk()))

batches = [mk() for _ in range(REPS)]
t0 = time.monotonic()
for g in batches:
    sk.collect_batch(sk.submit_batch(g))
dt = time.monotonic() - t0
print(f"serialized: {B*REPS/dt:.1f} genomes/s ({dt/REPS:.2f}s/batch)", flush=True)

batches = [mk() for _ in range(REPS)]
t0 = time.monotonic()
pending = None
for g in batches:
    h = sk.submit_batch(g)
    if pending is not None:
        sk.collect_batch(pending)
    pending = h
sk.collect_batch(pending)
dt = time.monotonic() - t0
print(f"window-2  : {B*REPS/dt:.1f} genomes/s ({dt/REPS:.2f}s/batch)", flush=True)
