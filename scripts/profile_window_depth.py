"""Pipeline window depth sweep for the sketch path (tunnel overlap tuning)."""
import time
import numpy as np
from hypergen_tpu.models.sketcher import Sketcher
from hypergen_tpu.params import SketchParams
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
B, BP, REPS = 32, 4_000_000, 4
rng = np.random.default_rng(23)
sk = Sketcher(SketchParams(), chunk_positions=1 << 17, batch=B)
mk = lambda: [rng.integers(0, 4, size=BP, dtype=np.uint8) for _ in range(B)]
sk.collect_batch(sk.submit_batch(mk()))

import collections
for depth in (1, 2, 3):
    batches = [mk() for _ in range(REPS)]
    win = collections.deque()
    t0 = time.monotonic()
    for g in batches:
        win.append(sk.submit_batch(g))
        if len(win) >= depth:
            sk.collect_batch(win.popleft())
    while win:
        sk.collect_batch(win.popleft())
    dt = time.monotonic() - t0
    print(f"depth={depth}: {B*REPS/dt:5.1f} genomes/s ({dt/REPS:.2f}s/batch)",
          flush=True)
