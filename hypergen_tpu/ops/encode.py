"""HDC random-indexing HV encoder (the second hot loop, reference:src/hd.rs:94-112).

The reference seeds a WyRng per sampled hash and draws D/64 sequential u64
words. Because wyrng's state is a plain counter (state_i = h + (i+1)*P0),
the whole [N_hashes x D/64] word grid is computable in parallel with zero
sequential dependencies — the key observation that makes this op a single
fused elementwise pipeline + reduction instead of a loop.

hv[i*64 + j] = sum over hashes h of (2*bit_j(word_i(h)) - 1)
            = 2 * popcount-accumulate - n_hashes.

Padding hashes are masked to contribute nothing, matching the reference's
AVX2 padding semantics (reference:src/hd.rs:54-58 zero the padded lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.hashes import wyrng_word_offsets, wyrng_words_from_hash
from hypergen_tpu.ops.u64 import U64

_BIT_SHIFTS = np.arange(32, dtype=np.uint32)


def _expand_bits(w_hi: jnp.ndarray, w_lo: jnp.ndarray) -> jnp.ndarray:
    """[..., W] u32 word pairs -> [..., W*64] int8 bits in dim order.

    dim d = i*64 + j: j in [0,32) from lo bit j, j in [32,64) from hi
    bit j-32 (reference:src/hd.rs:102-107: hv[i*64+j] += (rnd>>j)&1 over a
    64-bit word, LSB first).
    """
    lo_bits = (w_lo[..., None] >> _BIT_SHIFTS) & np.uint32(1)
    hi_bits = (w_hi[..., None] >> _BIT_SHIFTS) & np.uint32(1)
    bits = jnp.concatenate([lo_bits, hi_bits], axis=-1)  # [..., W, 64]
    return bits.astype(jnp.int8).reshape(bits.shape[:-2] + (-1,))


@functools.partial(jax.jit, static_argnames=("hv_d", "block"))
def encode_hv(
    h: U64,
    valid: jnp.ndarray,
    hv_d: int,
    block: int = 256,
) -> jnp.ndarray:
    """Bundle hashes into an int32 HV (wrap to int16 at the end for parity).

    h: U64 [B, N] (padded hash buffers); valid: bool [B, N].
    Returns int32 [B, hv_d] = 2*sum(bits) - n_valid per row.
    Processes hashes in blocks to bound the [B, block, hv_d] bit tensor.
    """
    if hv_d % 64 != 0:
        raise ValueError("hv_d must be a multiple of 64")
    B, N = h.lo.shape
    W = hv_d // 64
    offsets = u.from_np_u64(wyrng_word_offsets(W))

    if N % block != 0:
        pad = block - N % block
        h = U64(
            jnp.pad(h.hi, ((0, 0), (0, pad))),
            jnp.pad(h.lo, ((0, 0), (0, pad))),
        )
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        N += pad
    n_blocks = N // block

    def body(i, acc):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * block, block, axis=1)
        hb = U64(sl(h.hi), sl(h.lo))
        vb = sl(valid)
        w_hi, w_lo = wyrng_words_from_hash(hb, offsets)  # [B, block, W]
        bits = _expand_bits(w_hi, w_lo)  # [B, block, hv_d] int8
        masked = bits * vb[..., None].astype(jnp.int8)
        return acc + jnp.sum(masked.astype(jnp.int32), axis=1)

    acc = jnp.zeros((B, hv_d), dtype=jnp.int32)
    acc = jax.lax.fori_loop(0, n_blocks, body, acc)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=-1, keepdims=True)
    return 2 * acc - n_valid


def hv_to_i16(hv: jnp.ndarray) -> jnp.ndarray:
    """Wrap to int16 exactly like the reference's i16 accumulation
    (overflow-checks=false; reference:src/hd.rs:97)."""
    return hv.astype(jnp.int16)


def hv_norm2_i32(hv_i16: jnp.ndarray) -> jnp.ndarray:
    """Wrapping-i32 sum of squares (reference:src/dist.rs:132-137)."""
    x = hv_i16.astype(jnp.int32)
    return jnp.sum(x * x, axis=-1)
