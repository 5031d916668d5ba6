"""Relay H2D upload profiling: is the files-on-disk path upload-bound?

r2's headline stage shares put collect+compress at 0.81 of wall with ONE
batch in flight, which is consistent with the ~10-30 MB/s relay upload
moving the 32 MB of 2-bit packed bases while the host waits in collect.
This script measures the upload path directly so the end-to-end ceiling
is a number, not an inference:

  1. upload rate vs buffer size (8/32/64 MB, differenced pairs to cancel
     the fixed dispatch+fetch round trip);
  2. dtype sensitivity (uint8 vs uint32 views of the same bytes — the
     packed step uploads u32 words);
  3. two concurrent uploads from one process (does the relay multiplex
     streams, or serialize? decides whether pipelined dispatch can hide
     upload time at all);
  4. end-to-end sketch_files on 16 x 4.19 Mbp synthetic files at
     (batch=8, group=4) vs (batch=16, group=2): smaller batches start
     uploading earlier (overlap with host parse) and fuse D2H fetches.

Run when the relay is up: python scripts/profile_relay_h2d.py
"""

import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

MB = 1 << 20


def _force(fn, buf):
    t0 = time.monotonic()
    int(fn(buf))
    return time.monotonic() - t0


def upload_rates():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}", flush=True)
    fns, times = {}, {}
    for n_mb in (8, 32, 64):
        n = n_mb * MB
        fns[n_mb] = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        _force(fns[n_mb], rng.integers(0, 255, size=n, dtype=np.uint8))  # warm
    for n_mb in (8, 32, 64):
        buf = rng.integers(0, 255, size=n_mb * MB, dtype=np.uint8)
        times[n_mb] = _force(fns[n_mb], buf)
        print(f"u8 {n_mb:3d} MB: {times[n_mb]:.3f} s", flush=True)
    for a, b in ((8, 32), (32, 64), (8, 64)):
        rate = (b - a) * MB / max(times[b] - times[a], 1e-9) / 1e6
        print(f"differenced {a}->{b} MB: {rate:.1f} MB/s", flush=True)
    # dtype check: u32 view of the same byte count
    n_mb = 32
    f32 = jax.jit(lambda x: jnp.sum(x, dtype=jnp.uint32).astype(jnp.int32))
    _force(f32, rng.integers(0, 2**32 - 1, size=n_mb * MB // 4,
                             dtype=np.uint32))
    t = _force(f32, rng.integers(0, 2**32 - 1, size=n_mb * MB // 4,
                                 dtype=np.uint32))
    print(f"u32 {n_mb} MB: {t:.3f} s (vs u8 {times[n_mb]:.3f})", flush=True)
    return times


def concurrent_streams():
    """Two 32 MB uploads dispatched from two threads: serialized or not?"""
    rng = np.random.default_rng(1)
    f = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    bufs = [rng.integers(0, 255, size=32 * MB, dtype=np.uint8)
            for _ in range(4)]
    _force(f, bufs[0])  # warm
    t0 = time.monotonic()
    _force(f, bufs[1])
    serial = time.monotonic() - t0
    t0 = time.monotonic()
    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(lambda b: _force(f, b), bufs[2:4]))
    par2 = time.monotonic() - t0
    print(
        f"one 32 MB: {serial:.3f} s; two concurrent 32 MB: {par2:.3f} s "
        f"({'multiplexes' if par2 < 1.6 * serial else 'serializes'})",
        flush=True,
    )


def e2e_batch_configs():
    from hypergen_tpu.models.sketcher import Sketcher
    from hypergen_tpu.params import SketchParams

    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    with tempfile.TemporaryDirectory(prefix="hgh2d_") as td:
        d = Path(td)
        paths = []
        for i in range(16):
            r = np.random.default_rng(3000 + i)
            p = d / f"g{i:02d}.fna"
            p.write_bytes(
                b">g\n" + r.choice(bases, size=4_190_000).tobytes() + b"\n"
            )
            paths.append(p)
        warm = []
        for i in range(2):
            r = np.random.default_rng(4000 + i)
            p = d / f"w{i}.fna"
            p.write_bytes(
                b">g\n" + r.choice(bases, size=4_190_000).tobytes() + b"\n"
            )
            warm.append(p)
        for batch, group in ((8, 4), (16, 2)):
            sk = Sketcher(SketchParams(), batch=batch, collect_group=group)
            sk.sketch_files(warm, progress=False)
            t0 = time.monotonic()
            out = sk.sketch_files(paths, progress=False)
            dt = time.monotonic() - t0
            assert len(out) == 16
            sh = {k: round(v, 2) for k, v in sk.last_stage_times.items()}
            print(
                f"batch={batch} group={group}: {16/dt:.2f} genomes/s "
                f"({dt:.2f} s; h2d {sk.last_h2d_bytes/1e6:.0f} MB at "
                f"{sk.last_h2d_bytes/dt/1e6:.1f} MB/s) stages={sh}",
                flush=True,
            )


if __name__ == "__main__":
    upload_rates()
    concurrent_streams()
    e2e_batch_configs()
