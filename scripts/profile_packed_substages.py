"""Sub-stage device-time attribution for the fused packed sketch step.

First packed-step measurement came in at 386 ms/step vs the 40 ms runs-path
step it was meant to beat — this script isolates which piece lowers
pathologically:

  G: word-gather relayout [B, W] -> [BN, T_w, sub, 128]
  K: G + packed Pallas kernel (slots out)
  F: K + run postfilter (searchsorted) + block_extract
  S: full packed step (= F + dedup + encode)

Chained-scan differencing as in profile_device_time.py.
"""

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_device_time import _per_iter, _rand_u32
from hypergen_tpu.models.sketcher import (
    make_sketch_step, packed_row_words, filter_positions_by_runs,
    _dedup_sorted_batched,
)
from hypergen_tpu.ops.compact import block_extract
from hypergen_tpu.ops.pallas.hash_kernel import (
    _rolling_packed_kernel, _SENT,
)
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

B, NC, C = 8, 32, 1 << 17
K, SCALED, D = 21, 1500, 4096
CELLS, CAP = 4096, 4
THR = fracminhash_threshold(SCALED)

SUB = CELLS // 128
LSUB = C // CELLS
T_W = -(-(LSUB + K - 1) // 16)
IW, LW = C // 16, LSUB // 16
W = packed_row_words(NC, C)
BN = B * NC
S = NC * CAP * CELLS
ENC_CAP = -(-(3 * (NC * C // SCALED) + 512) // 256) * 256
LAM = 128 * LSUB / SCALED
BE_CAP = int(min(128, max(8, LAM + 6 * LAM ** 0.5 + 4)))

RUNS = np.full((B, 512, 2), np.int32(0x7FFFFFFF), np.int32)
N_POS = np.full(B, NC * C, np.int32)

def _gather(p2w):
    # strided-slice planes, mirroring hash_packed_rows_pallas
    planes = []
    for d in range(T_W):
        sl = jax.lax.slice(
            p2w, (0, d),
            (B, d + (NC - 1) * IW + (CELLS - 1) * LW + 1), (1, LW),
        )
        planes.append(sl.reshape(B, NC, CELLS))
    cw = jnp.stack(planes, axis=2)
    return cw.reshape(BN, T_W, SUB, 128)


def _kernel(cw, pos_end):
    kern = functools.partial(
        _rolling_packed_kernel,
        ksize=K, seed=123, threshold=THR, canonical=True, method="t1ha2",
        lsub=LSUB, sub=SUB, cap=CAP,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BN,),
            in_specs=[
                pl.BlockSpec((1, T_W, SUB, 128), lambda i, *_: (i, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, CAP, SUB, 128), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, CAP, SUB, 128), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, CAP, SUB, 128), lambda i, *_: (i, 0, 0, 0)),
                pl.BlockSpec((1, 1, SUB, 128), lambda i, *_: (i, 0, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((4 + 2 * ((K + 3) // 4), SUB, 128), jnp.uint32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BN, CAP, SUB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((BN, CAP, SUB, 128), jnp.uint32),
            jax.ShapeDtypeStruct((BN, CAP, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((BN, 1, SUB, 128), jnp.int32),
        ],
    )(pos_end, cw)


CHUNK_OFF = np.repeat(np.arange(NC, dtype=np.int32), CAP * CELLS)[None, :] * C


def _stage_fn(depth):
    pos_end_np = np.broadcast_to(
        np.minimum(N_POS[:, None], C), (B, NC)
    ).reshape(BN).astype(np.int32)

    step = make_sketch_step(
        ksize=K, seed=123, threshold=THR, hv_d=D, batch=B, n_chunks=NC,
        chunk_positions=C, chunk_cap=CAP, enc_cap=ENC_CAP, encode_block=512,
        extract_block=512, use_pallas=True, validity="packed",
        jit_compile=False, packed_be_cap=BE_CAP,
    )

    def prefix(p2w, runs_c, n_pos_c, pos_end_c):
        if depth == 3:
            return jnp.sum(step(p2w, runs_c, n_pos_c).astype(jnp.int32))
        cw = _gather(p2w)
        if depth == 0:
            return jnp.sum(cw.astype(jnp.int32))
        slot_hi, slot_lo, slot_pos, cnt = _kernel(cw, pos_end_c)
        if depth == 1:
            return (
                jnp.sum(slot_lo.astype(jnp.int32))
                + jnp.sum(cnt)
            )
        h = U64(slot_hi.reshape(B, S), slot_lo.reshape(B, S))
        pos = slot_pos.reshape(B, S) + jnp.asarray(CHUNK_OFF)
        valid = ~((h.hi == _SENT) & (h.lo == _SENT))
        flat, _, bem, flat_pos = block_extract(
            h, valid, 512, BE_CAP, payload=pos
        )
        clean = filter_positions_by_runs(flat_pos, runs_c, K)
        return (
            jnp.sum(jnp.where(clean, flat.lo, 0).astype(jnp.int32))
            + jnp.sum(bem)
        )

    def make_fn(R):
        def chained(seeds):
            runs_c = jnp.asarray(RUNS)
            n_pos_c = jnp.asarray(N_POS)
            pos_end_c = jnp.asarray(pos_end_np)

            def body(carry, seed):
                p2w = _rand_u32(seed, (B, W))
                return carry + prefix(p2w, runs_c, n_pos_c, pos_end_c), None

            tot, _ = jax.lax.scan(body, jnp.int32(0), seeds)
            return tot

        return chained

    return make_fn


if __name__ == "__main__":
    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}")
    names = ["G gather", "K +kernel", "F +filter+extract", "S full step"]
    only = [int(a) for a in sys.argv[1:]] or list(range(len(names)))
    prev = 0.0
    for depth in only:
        dt, t1, t2 = _per_iter(_stage_fn(depth), f"p{depth}")
        print(f"{names[depth]}: {dt*1e3:7.1f} ms cumulative  "
              f"[t={t1:.3f}/{t2:.3f}s]")
