"""End-to-end scalar pipeline oracle: normalize -> k-mers -> sample -> encode -> ANI.

Semantics follow the reference CPU path (the canonical one):
  - needletail-style normalization (Sequence::normalize(false)), see
    reference:src/sketch.rs:84-88;
  - canonical k-mers = lexicographic min(fwd, revcomp) over windows of k
    consecutive ACGT bases (needletail canonical_kmers; equivalently
    reference:src/cuda_kernel.cu:277-311);
  - FracMinHash: keep h < U64_MAX // scaled, dedup to a set
    (reference:src/sketch.rs:90-94);
  - HDC encode: hv[i*64+j] = sum over hashes of (2*bit_j(word_i) - 1) with
    word_i from WyRng seeded by the hash (reference:src/hd.rs:94-112);
  - ANI: J = dot/(n_r + n_q - dot); ANI% = clamp(1 + ln(2J/(1+J))/k, 0, 1)*100
    computed in float32 (reference:src/dist.rs:139-161).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Set, Tuple

import numpy as np

from hypergen_tpu.oracle.hashes import mm_hash64, t1ha2_atonce, wyrng_words
from hypergen_tpu.params import fracminhash_threshold

_COMPLEMENT = {65: 84, 67: 71, 71: 67, 84: 65}  # A<->T, C<->G

# needletail normalize(iupac=false): ACGTN and '-' kept; lowercase acgt/n
# uppercased; t/u/U -> T; '.'/'~' -> '-'; IUPAC codes and everything else -> N.
_NORM_TABLE = np.full(256, ord("N"), dtype=np.uint8)
for c in b"ACGTN-":
    _NORM_TABLE[c] = c
for lower, upper in zip(b"acgn", b"ACGN"):
    _NORM_TABLE[lower] = upper
for c in b"tuU":
    _NORM_TABLE[c] = ord("T")
for c in b".~":
    _NORM_TABLE[c] = ord("-")


def normalize_seq(seq: bytes) -> bytes:
    """needletail Sequence::normalize(false) equivalent (1:1 byte map)."""
    arr = np.frombuffer(bytes(seq), dtype=np.uint8)
    return _NORM_TABLE[arr].tobytes()


def canonical_kmers(norm_seq: bytes, k: int) -> Iterable[bytes]:
    """Yield canonical k-mers over windows of k consecutive ACGT bases."""
    for fwd in _forward_kmers(norm_seq, k):
        rc = bytes(_COMPLEMENT[c] for c in reversed(fwd))
        yield fwd if fwd < rc else rc


def extract_kmer_hashes(
    records: List[bytes],
    ksize: int = 21,
    scaled: int = 1500,
    seed: int = 123,
    canonical: bool = True,
    method: str = "t1ha2",
) -> Set[int]:
    """FracMinHash-sampled k-mer hash set for one genome (list of records).

    K-mers never span record boundaries (each FASTA record is processed
    independently, reference:src/sketch.rs:80-96).
    """
    threshold = fracminhash_threshold(scaled)
    hashes: Set[int] = set()
    for rec in records:
        norm = normalize_seq(rec)
        if canonical:
            kmers = canonical_kmers(norm, ksize)
        else:
            kmers = _forward_kmers(norm, ksize)
        for kmer in kmers:
            if method == "t1ha2":
                h = t1ha2_atonce(kmer, seed)
            elif method == "mmhash":
                h = mm_hash64(_pack_2bit(kmer))
            else:
                raise ValueError(f"unknown sketch method {method!r}")
            if h < threshold:
                hashes.add(h)
    return hashes


def _forward_kmers(norm_seq: bytes, k: int) -> Iterable[bytes]:
    """Forward-strand windows; canonical_kmers canonicalizes these same
    windows (one run-scan loop — the boundary logic must not fork)."""
    run = 0
    for i in range(len(norm_seq)):
        if norm_seq[i] in _COMPLEMENT:
            run += 1
        else:
            run = 0
        if run >= k:
            yield norm_seq[i - k + 1 : i + 1]


_BASE_CODE = {65: 0, 67: 1, 71: 2, 84: 3}


def _pack_2bit(kmer: bytes) -> int:
    """2-bit pack a k-mer, first base most significant
    (reference:src/cuda_kernel.cu:49)."""
    code = 0
    for c in kmer:
        code = (code << 2) | _BASE_CODE[c]
    return code


def encode_hash_hd(hashes: Iterable[int], hv_d: int) -> np.ndarray:
    """HDC random-indexing bundle (reference:src/hd.rs:94-112).

    Returns int16 hv of length hv_d, with i16 wrapping semantics matching the
    reference's overflow-checks=false build.
    """
    hash_list = list(hashes)
    n = len(hash_list)
    acc = np.zeros(hv_d, dtype=np.int64)
    for h in hash_list:
        words = wyrng_words(h, hv_d // 64)
        for i, w in enumerate(words):
            for j in range(64):
                acc[i * 64 + j] += (w >> j) & 1
    hv = 2 * acc - n
    return hv.astype(np.int64).astype(np.int16)  # wrap like release Rust


def hv_norm2(hv: np.ndarray) -> int:
    """Sum of squares as wrapping i32 (reference:src/dist.rs:132-137)."""
    s = int(np.sum(hv.astype(np.int64) ** 2))
    s &= 0xFFFFFFFF
    if s >= 1 << 31:
        s -= 1 << 32
    return s


def ani_from_dot(dot: int, norm2_r: int, norm2_q: int, ksize: int) -> float:
    """ANI%% from an exact i32 dot product, float32 arithmetic throughout
    (reference:src/dist.rs:150-161)."""
    dot32 = np.float32(dot)
    # the denominator wraps in i32 exactly like the reference's
    # overflow-checks=false build (and like models/comparator._ani_chain);
    # unbounded Python int here would disagree with both for huge genomes
    # (norm2_r + norm2_q - dot > 2^31 flips the jaccard sign -> ANI 0)
    d = (norm2_r + norm2_q - dot) & 0xFFFFFFFF
    if d >= 1 << 31:
        d -= 1 << 32
    denom = np.float32(d)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        jaccard = np.float32(dot32 / denom)
        inner = np.float32(
            np.float32(2.0) / (np.float32(1.0) / jaccard + np.float32(1.0))
        )
        ani = np.float32(1.0) + np.float32(np.log(inner)) / np.float32(ksize)
    if np.isnan(ani):
        return float(np.float32(0.0))
    ani = min(np.float32(1.0), max(np.float32(0.0), ani))
    return float(np.float32(ani * np.float32(100.0)))


def compute_pairwise_ani(
    r: np.ndarray, norm2_r: int, q: np.ndarray, norm2_q: int, ksize: int
) -> float:
    dot = int(np.sum(r.astype(np.int32) * q.astype(np.int32), dtype=np.int64))
    dot &= 0xFFFFFFFF
    if dot >= 1 << 31:
        dot -= 1 << 32
    return ani_from_dot(dot, norm2_r, norm2_q, ksize)


def sketch_genome(
    records: List[bytes],
    ksize: int = 21,
    scaled: int = 1500,
    seed: int = 123,
    hv_d: int = 4096,
    canonical: bool = True,
    method: str = "t1ha2",
) -> Dict[str, object]:
    """Full oracle sketch of one genome: hash set, hv, norm."""
    hashes = extract_kmer_hashes(records, ksize, scaled, seed, canonical, method)
    hv = encode_hash_hd(hashes, hv_d)
    return {"hashes": hashes, "hv": hv, "norm2": hv_norm2(hv)}
