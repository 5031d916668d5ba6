"""Vectorized 64-bit hash primitives on the U64 (2x uint32) representation.

- t1ha2_atonce over fixed-length byte windows (the production k-mer hash,
  reference:src/sketch.rs:90); structure mirrors the validated 32-bit CUDA
  decomposition (reference:src/cuda_kernel.cu:196-246).
- mm_hash64 (Thomas Wang mix, reference:src/types.rs:22-32) for the
  2-bit-packed "mmhash" sketch method.
- wyrng output words in closed form for the HDC encoder
  (state is a counter: word_i(h) = wymum((h+(i+1)P0)^P1, h+(i+1)P0)).

All functions are elementwise over leading array dims and shape-static:
`length`, `seed`, and word counts are Python ints at trace time.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import (
    T1HA_PRIME_0,
    T1HA_PRIME_1,
    T1HA_PRIME_2,
    T1HA_PRIME_3,
    T1HA_PRIME_4,
    T1HA_PRIME_5,
    T1HA_PRIME_6,
    U64_MASK,
    WY_P0,
    WY_P1,
)


def _mixup64(a: U64, b: U64, v: U64, prime: int) -> Tuple[U64, U64]:
    """a ^= lo128((b + v) * prime); b += hi128. Returns (a, b)."""
    hi, lo = u.mul128_const(u.add(b, v), prime)
    return u.xor(a, lo), u.add(b, hi)


def _final64(a: U64, b: U64) -> U64:
    x = u.mul_lo_const(u.add(a, u.rot_right(b, 41)), T1HA_PRIME_0)
    y = u.mul_lo_const(u.add(u.rot_right(a, 23), b), T1HA_PRIME_6)
    return u.mux64(u.xor(x, y), T1HA_PRIME_5)


def t1ha2_atonce_words(words: Sequence[U64], length: int, seed: int) -> U64:
    """t1ha2_atonce over little-endian u64 data words, for length <= 32.

    ``words`` must contain ceil(length/8) U64s; the final word must already
    be masked to the trailing ``length % 8`` bytes (zero-extended), exactly
    as tail64_le_unaligned produces (reference:src/cuda_kernel.cu:155-194).
    """
    if not 0 <= length <= 32:
        raise ValueError("t1ha2_atonce_words supports length in [0, 32]")
    n_words = (length + 7) // 8
    if len(words) != n_words:
        raise ValueError(f"expected {n_words} words for length {length}")

    shape = words[0].shape if words else ()
    a = u.from_scalar(seed, shape)
    b = u.from_scalar(length, shape)
    idx = 0
    if length > 24:
        a, b = _mixup64(a, b, words[idx], T1HA_PRIME_4)
        idx += 1
    if length > 16:
        b, a = _mixup64(b, a, words[idx], T1HA_PRIME_3)
        idx += 1
    if length > 8:
        a, b = _mixup64(a, b, words[idx], T1HA_PRIME_2)
        idx += 1
    if length > 0:
        b, a = _mixup64(b, a, words[idx], T1HA_PRIME_1)
    return _final64(a, b)


def mm_hash64(key: U64) -> U64:
    """Thomas Wang 64-bit mix hash, wrapping (reference:src/types.rs:22-32)."""
    key = u.add(u.not_(key), u.shl(key, 21))
    key = u.xor(key, u.shr(key, 24))
    key = u.add(u.add(key, u.shl(key, 3)), u.shl(key, 8))
    key = u.xor(key, u.shr(key, 14))
    key = u.add(u.add(key, u.shl(key, 2)), u.shl(key, 4))
    key = u.xor(key, u.shr(key, 28))
    key = u.add(key, u.shl(key, 31))
    return key


def wyrng_word_offsets(n_words: int) -> np.ndarray:
    """(i+1)*P0 mod 2^64 for i in [0, n_words) as host uint64."""
    offs = [( (i + 1) * WY_P0 ) & U64_MASK for i in range(n_words)]
    return np.array(offs, dtype=np.uint64)


def wyrng_words_from_hash(h: U64, offsets: U64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All wyrng output words for each hash, in parallel.

    h: U64 with shape [...]; offsets: U64 with shape [W] (from
    wyrng_word_offsets). Returns (hi, lo) uint32 arrays of shape [..., W]:
    word_i = wymum(s ^ P1, s) with s = h + (i+1)*P0.
    """
    s = u.add(
        U64(h.hi[..., None], h.lo[..., None]),
        U64(offsets.hi, offsets.lo),
    )
    x = u.xor_const(s, WY_P1)
    hi, lo = u.mul128(x, s)
    w = u.xor(hi, lo)
    return w.hi, w.lo
