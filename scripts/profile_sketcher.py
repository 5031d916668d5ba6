"""Time the Sketcher's host-side phases to find the end-to-end bottleneck."""

import time

import jax
import numpy as np

from hypergen_tpu.models.sketcher import Sketcher
from hypergen_tpu.params import SketchParams
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

B = 8
N_BATCHES = 4
GENOME_BP = 4_000_000

rng = np.random.default_rng(0)
sketcher = Sketcher(SketchParams(), chunk_positions=1 << 17, batch=B)

# 2*N distinct timed batches + 1 warmup batch: the relay caches
# (executable, inputs) -> result, so replaying a batch is free and lies
batches = [
    [rng.integers(0, 4, size=GENOME_BP, dtype=np.uint8) for _ in range(B)]
    for _ in range(2 * N_BATCHES + 1)
]
warm, batches_ser, batches_pipe = (
    batches[0], batches[1 : N_BATCHES + 1], batches[1:]
)

# warmup/compile
h = sketcher.submit_batch(warm)
sketcher.collect_batch(h)

# phase timing, serialized (no pipeline) to attribute time
t_pack = t_sub = t_col = 0.0
for bi, genomes in enumerate(batches_ser):
    t0 = time.monotonic()
    n_chunks = max(sketcher._bucket(c.shape[0]) for c in genomes)
    p2, pv = sketcher._pack_batch(genomes, n_chunks)
    t1 = time.monotonic()
    h = sketcher.submit_batch(genomes)  # repacks; isolates dispatch+H2D below
    t2 = time.monotonic()
    res = sketcher.collect_batch(h)
    t3 = time.monotonic()
    t_pack += t1 - t0
    t_sub += t2 - t1
    t_col += t3 - t2
    print(f"batch {bi}: pack={t1-t0:.3f}s submit(pack+h2d+dispatch)={t2-t1:.3f}s "
          f"collect(device+D2H)={t3-t2:.3f}s")

n = N_BATCHES * B
print(f"\nmeans per batch: pack={t_pack/N_BATCHES:.3f}s submit={t_sub/N_BATCHES:.3f}s "
      f"collect={t_col/N_BATCHES:.3f}s")
tot = t_pack + t_sub + t_col
print(f"serialized throughput: {n/tot:.1f} genomes/s")

# pipelined throughput (as bench.py runs it)
import collections
window = collections.deque()
t0 = time.monotonic()
for genomes in batches_pipe:
    window.append(sketcher.submit_batch(genomes))
    if len(window) >= 3:
        sketcher.collect_batch(window.popleft())
while window:
    sketcher.collect_batch(window.popleft())
dt = time.monotonic() - t0
print(f"pipelined throughput: {len(batches_pipe)*B/dt:.1f} genomes/s")
