"""Relay direction-overlap matrix: can a D2H fetch ride alongside an H2D
upload, or does the relay serialize the two directions?

r4 established that two concurrent UPLOADS serialize (profile_relay_h2d);
the e2e pipeline's other contenders on the wire are the D2H result fetch
(~150 ms latency + ~1 MB payload per fused group) and the ~30 ms dispatch
control messages. Whether those can overlap an in-flight upload decides
the round-5 pipeline design:

  - fetch overlaps upload  -> a collector thread removes the fetch from the
    wire-critical path entirely (ceiling = uploads + dispatch overhead);
  - fetch serializes       -> the fetch is irreducible wire time and the
    honest ceiling model must charge it.

Run when the relay is up: python scripts/profile_relay_overlap.py
"""

import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

MB = 1 << 20
UP_MB = 16


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(7)

    # H2D side: jit sum forces the upload (device_put alone is lazy)
    f_up = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    up_bufs = [rng.integers(0, 255, size=UP_MB * MB, dtype=np.uint8)
               for _ in range(6)]
    int(f_up(up_bufs[0]))  # warm compile + first transfer

    # D2H side: ~1 MB arrays generated ON DEVICE from a scalar (no upload),
    # distinct seeds so the relay result cache can't serve them
    f_gen = jax.jit(
        lambda s: (jnp.arange(256 * 1024, dtype=jnp.int32) * s)
    )
    np.asarray(f_gen(jnp.int32(1)))  # warm

    def timed(fn):
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    # --- solo baselines ---------------------------------------------------
    t_up = [timed(lambda b=b: int(f_up(b))) for b in up_bufs[1:3]]
    print(f"solo upload {UP_MB} MB: {[f'{t:.3f}' for t in t_up]} s", flush=True)

    # pre-execute the arrays to fetch so the timed part is the D2H only
    ys = [f_gen(jnp.int32(s)) for s in (10, 11, 12, 13, 14, 15)]
    time.sleep(1.0)
    t_fe = [timed(lambda y=y: np.asarray(y)) for y in ys[0:2]]
    print(f"solo fetch 1 MB: {[f'{t:.3f}' for t in t_fe]} s", flush=True)

    # --- overlap: one upload in thread A, two fetches in thread B ---------
    res = {}

    def do_up():
        res["up"] = timed(lambda: int(f_up(up_bufs[3])))

    def do_fetch():
        res["fe"] = timed(lambda: [np.asarray(y) for y in ys[2:4]])

    ta = threading.Thread(target=do_up)
    tb = threading.Thread(target=do_fetch)
    t0 = time.monotonic()
    ta.start()
    time.sleep(0.05)  # let the upload get onto the wire first
    tb.start()
    ta.join()
    tb.join()
    wall = time.monotonic() - t0
    solo_up = min(t_up)
    solo_fe = 2 * min(t_fe)
    print(
        f"overlap: wall {wall:.3f} s (upload thread {res['up']:.3f}, "
        f"fetch thread {res['fe']:.3f}); solo-sum {solo_up + solo_fe:.3f}, "
        f"solo-max {max(solo_up, solo_fe):.3f}", flush=True,
    )
    verdict = (
        "MULTIPLEXES (fetch hides under upload)"
        if wall < solo_up + 0.5 * solo_fe
        else "SERIALIZES (fetch is wire time)"
    )
    print(f"verdict: {verdict}", flush=True)

    # --- dispatch-under-upload: enqueue a step-sized program while a big
    # upload is in flight; how long does the *call* block the host thread?
    f_disp = jax.jit(lambda s: jnp.sum(jnp.arange(1024, dtype=jnp.int32) + s))
    int(f_disp(jnp.int32(1)))  # warm
    t_disp_solo = timed(lambda: f_disp(jnp.int32(2)))  # enqueue only, no force

    res2 = {}

    def do_up2():
        res2["up"] = timed(lambda: int(f_up(up_bufs[4])))

    ta = threading.Thread(target=do_up2)
    ta.start()
    time.sleep(0.1)
    t_disp_busy = timed(lambda: f_disp(jnp.int32(3)))
    ta.join()
    print(
        f"dispatch enqueue: solo {t_disp_solo * 1e3:.1f} ms, "
        f"during upload {t_disp_busy * 1e3:.1f} ms", flush=True,
    )


if __name__ == "__main__":
    main()
