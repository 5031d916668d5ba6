"""Attribute device-step time: unpack vs relayout-gather vs kernel vs rest."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.models.sketcher import _unpack_codes, pack_codes
from hypergen_tpu.ops.pallas.hash_kernel import CELLS
from hypergen_tpu.params import SketchParams, fracminhash_threshold
from hypergen_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

P = SketchParams()
K, SEED = P.ksize, P.seed
THRESH = fracminhash_threshold(P.scaled)
B, NC, C = 8, 32, 1 << 17
L_ext = NC * C + K - 1
L_pad = -(-L_ext // 8) * 8
rng = np.random.default_rng(0)


def fresh(n):
    outs = []
    for _ in range(n):
        p2 = np.empty((B, L_pad // 4), np.uint8)
        pv = np.empty((B, L_pad // 8), np.uint8)
        for i in range(B):
            p2[i], pv[i] = pack_codes(
                rng.integers(0, 4, size=L_ext, dtype=np.uint8), L_pad
            )
        outs.append((jnp.asarray(p2), jnp.asarray(pv)))
    return outs


def chunkify(codes):
    chunks = jnp.stack(
        [codes[:, c * C : c * C + C + K - 1] for c in range(NC)], axis=1
    ).reshape(B * NC, C + K - 1)
    return chunks


@jax.jit
def f_unpack(p2, pv):
    codes = _unpack_codes(p2, pv)[:, :L_ext]
    return chunkify(codes).sum(dtype=jnp.int32)


@jax.jit
def f_relayout(p2, pv):
    codes = _unpack_codes(p2, pv)[:, :L_ext]
    chunks = chunkify(codes)
    nc2, width = chunks.shape
    lsub = C // CELLS
    T = lsub + K - 1
    idx = (
        np.arange(T, dtype=np.int32)[:, None]
        + np.arange(CELLS, dtype=np.int32)[None, :] * lsub
    )
    cell = jnp.take(chunks, jnp.asarray(idx), axis=1).astype(jnp.int32)
    return cell.sum(dtype=jnp.int32)


@jax.jit
def f_relayout_t(p2, pv):
    """Transpose-based relayout (gather-free candidate)."""
    codes = _unpack_codes(p2, pv)[:, :L_ext]
    chunks = chunkify(codes)
    nc2 = chunks.shape[0]
    lsub = C // CELLS
    main = chunks[:, :C].reshape(nc2, CELLS, lsub).transpose(0, 2, 1)
    # halo rows t in [lsub, lsub+K-2]: cell c reads position (c+1)*lsub + (t-lsub)
    halo_src = jnp.concatenate(
        [main[:, : K - 1, 1:], chunks[:, C:, None].transpose(0, 1, 2)], axis=2
    )
    cell = jnp.concatenate([main, halo_src], axis=1)  # [nc, T, CELLS]
    return cell.astype(jnp.int32).sum(dtype=jnp.int32)


def timeit(name, fn, inputs, n=4):
    # block_until_ready is a NO-OP through the axon relay: force a real
    # scalar fetch per call; warmup input excluded, each timed input used
    # once (the relay caches (executable, inputs) -> result)
    del n
    float(fn(*inputs[0]))
    t0 = time.monotonic()
    for args in inputs[1:]:
        float(fn(*args))
    dt = (time.monotonic() - t0) / (len(inputs) - 1)
    print(f"{name:32s} {dt*1e3:9.1f} ms")
    return dt


ins = fresh(5)
print(f"positions: {B*NC*C/1e6:.1f}M")
timeit("unpack+chunk", f_unpack, ins)
timeit("unpack+chunk+relayout(take)", f_relayout, ins)
timeit("unpack+chunk+relayout(transp)", f_relayout_t, ins)
