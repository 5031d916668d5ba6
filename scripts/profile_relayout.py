"""Compare packed-step word relayout implementations (r3 candidate #1).

The fused packed kernel wants cw[b, i, d, c] = words[b, i*iw + c*lw + d]
(chunk i, cell c, word-plane d). The r2 implementation builds T_w
stride-lw slices (~2.1 ms of the 12 ms step at B=8 x 4.19 Mbp). This
script measures alternatives by chained-scan differencing (see
profile_device_time.py):

  strided : r2 baseline — T_w stride-lw lax.slice planes
  transpose: ONE XLA transpose [nc, cells, lw] -> [nc, lw, cells]; halo
             planes d >= lw are plane d-lw shifted by one cell (a flat
             reshape + concat-slice, no second transpose)
  none     : identity reshape floor (measures the harness itself)

All variants are checked for equality on CPU-sized inputs first.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from profile_device_time import _per_iter, _rand_u32
from hypergen_tpu.models.sketcher import packed_row_words
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17
K = 21
CELLS = 4096
SUB = CELLS // 128
LSUB = C // CELLS
T_W = -(-(LSUB + K - 1) // 16)
IW, LW = C // 16, LSUB // 16
W = packed_row_words(NC, C)


def relayout_strided(pw):
    planes = []
    for d in range(T_W):
        sl = jax.lax.slice(
            pw, (0, d), (B, d + (NC - 1) * IW + (CELLS - 1) * LW + 1),
            (1, LW),
        )
        planes.append(sl.reshape(B, NC, CELLS))
    cw = jnp.stack(planes, axis=2)
    return cw.reshape(B * NC, T_W, SUB, 128)


def relayout_transpose(pw):
    base = pw[:, : NC * IW].reshape(B, NC, CELLS, LW)
    P = jnp.transpose(base, (0, 1, 3, 2))  # [B, NC, LW, CELLS]
    flat = jnp.transpose(base, (0, 3, 1, 2)).reshape(B, LW, NC * CELLS)
    # halo plane d = plane d-lw of cell c+1 == flat plane shifted by one;
    # the final cell's halo comes from the slack words past the last chunk
    planes = [P[:, :, d] for d in range(LW)]
    for d in range(LW, T_W):
        slack = pw[:, NC * IW + (d - LW) : NC * IW + (d - LW) + 1]
        shifted = jnp.concatenate(
            [flat[:, d - LW, 1:], jnp.broadcast_to(slack, (B, 1))], axis=1
        )
        planes.append(shifted.reshape(B, NC, CELLS))
    cw = jnp.stack(planes, axis=2)
    return cw.reshape(B * NC, T_W, SUB, 128)


def relayout_transpose2(pw):
    """Single flat transpose; per-chunk planes via reshape of shifts."""
    base = pw[:, : NC * IW].reshape(B, NC * CELLS, LW)
    flat = jnp.transpose(base, (0, 2, 1))  # [B, LW, NC*CELLS]
    planes = []
    for d in range(T_W):
        if d < LW:
            p = flat[:, d]
        else:
            slack = pw[:, NC * IW + (d - LW) : NC * IW + (d - LW) + 1]
            p = jnp.concatenate(
                [flat[:, d - LW, 1:], jnp.broadcast_to(slack, (B, 1))],
                axis=1,
            )
        planes.append(p.reshape(B, NC, CELLS))
    cw = jnp.stack(planes, axis=2)
    return cw.reshape(B * NC, T_W, SUB, 128)


def relayout_none(pw):
    return pw[:, : NC * T_W * CELLS].reshape(B * NC, T_W, SUB, 128)


VARIANTS = {
    "strided": relayout_strided,
    "transpose": relayout_transpose,
    "transpose2": relayout_transpose2,
    "none": relayout_none,
}


def _check_equal():
    rng = np.random.default_rng(0)
    pw = rng.integers(0, 1 << 32, size=(B, W), dtype=np.uint64).astype(
        np.uint32
    )
    # NB: relayout_transpose* read one slack word; strided reads the same
    ref = np.asarray(relayout_strided(jnp.asarray(pw)))
    for name in ("transpose", "transpose2"):
        got = np.asarray(VARIANTS[name](jnp.asarray(pw)))
        np.testing.assert_array_equal(got, ref, err_msg=name)
    print("parity: transpose variants == strided")


def _fn(f):
    def make_fn(R):
        def chained(seeds):
            def body(carry, seed):
                pw = _rand_u32(seed, (B, W))
                cw = f(pw)
                return carry + jnp.sum(cw[:, :, 0, :1].astype(jnp.int32)), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    return make_fn


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    if "--check" in sys.argv:
        _check_equal()
        sys.exit(0)
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or list(VARIANTS)
    for name in names:
        dt, t1, t2 = _per_iter(_fn(VARIANTS[name]), f"r{name[:2]}")
        print(f"{name:12s}: {dt*1e3:7.2f} ms/iter  [t={t1:.3f}/{t2:.3f}s]")
