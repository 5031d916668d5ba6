"""Scalar hash primitives over Python ints (parity anchor).

t1ha2_atonce follows the reference's CUDA decomposition
(reference:src/cuda_kernel.cu:91-246), which is asserted bit-equal to the
`t1ha` crate by the reference's own test (reference:src/lib.rs:517-589).
mm_hash64 follows reference:src/types.rs:22-32 (wrapping arithmetic).
wyrng follows wyhash v1 as implemented by the `wyhash` 0.5 crate
(WyRng::seed_from_u64(h) sets the raw state to h; each next_u64 does
state += P0; out = hi(x*y) ^ lo(x*y) with x = state ^ P1, y = state).
"""

from __future__ import annotations

from typing import List, Tuple

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

M64 = U64_MASK


def _mul128(a: int, b: int) -> Tuple[int, int]:
    """64x64 -> 128 multiply; returns (hi, lo)."""
    r = (a & M64) * (b & M64)
    return (r >> 64) & M64, r & M64


def _rot64(v: int, s: int) -> int:
    v &= M64
    return ((v >> s) | (v << (64 - s))) & M64


def _mixup64(a: int, b: int, v: int, prime: int) -> Tuple[int, int]:
    """mixup64(&a, &b, v, prime): a ^= lo128((b+v)*prime); b += hi128.

    (reference:src/cuda_kernel.cu:136-141)
    """
    hi, lo = _mul128((b + v) & M64, prime)
    return (a ^ lo) & M64, (b + hi) & M64


def _mux64(v: int, prime: int) -> int:
    hi, lo = _mul128(v, prime)
    return (hi ^ lo) & M64


def _final64(a: int, b: int) -> int:
    x = ((a + _rot64(b, 41)) * T1HA_PRIME_0) & M64
    y = ((_rot64(a, 23) + b) * T1HA_PRIME_6) & M64
    return _mux64(x ^ y, T1HA_PRIME_5)


def _le64(data: bytes) -> int:
    return int.from_bytes(data, "little")


def _tail64(data: bytes, length: int) -> int:
    """tail64_le_unaligned: read (length & 7 or 8) trailing bytes, LE.

    (reference:src/cuda_kernel.cu:155-194)
    """
    n = length & 7
    if n == 0:
        n = 8
    return int.from_bytes(data[:n], "little")


def t1ha2_atonce(data: bytes, seed: int) -> int:
    """t1ha2_atonce for len(data) <= 32 (k-mer sized inputs).

    Mirrors the switch fall-through structure of
    reference:src/cuda_kernel.cu:196-246.
    """
    length = len(data)
    if length > 32:
        raise ValueError("oracle t1ha2_atonce supports length <= 32 only")
    a = seed & M64
    b = length & M64
    off = 0
    if length > 24:
        a, b = _mixup64(a, b, _le64(data[0:8]), T1HA_PRIME_4)
        off = 8
    if length > 16:
        b, a = _mixup64(b, a, _le64(data[off : off + 8]), T1HA_PRIME_3)
        off += 8
    if length > 8:
        a, b = _mixup64(a, b, _le64(data[off : off + 8]), T1HA_PRIME_2)
        off += 8
    if length > 0:
        b, a = _mixup64(b, a, _tail64(data[off:], length), T1HA_PRIME_1)
    return _final64(a, b)


def mm_hash64(key: int) -> int:
    """Thomas Wang 64-bit mix hash (reference:src/types.rs:22-32)."""
    key &= M64
    key = (~key + (key << 21)) & M64
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & M64
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & M64
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & M64
    return key


def wyrng_next(state: int) -> Tuple[int, int]:
    """One wyrng step; returns (new_state, output_word)."""
    state = (state + WY_P0) & M64
    hi, lo = _mul128(state ^ WY_P1, state)
    return state, (hi ^ lo) & M64


def wyrng_words(seed: int, n: int) -> List[int]:
    """The first n next_u64() outputs of WyRng::seed_from_u64(seed).

    Closed form: word_i = wymum((seed + (i+1)*P0) ^ P1, seed + (i+1)*P0),
    i.e. the state is a plain counter — this is what makes the HV encoder
    embarrassingly parallel on the device path.
    """
    out = []
    s = seed & M64
    for _ in range(n):
        s, w = wyrng_next(s)
        out.append(w)
    return out
