"""Pure-Python parity oracle.

This subpackage is the byte-level behavioral specification of the reference
pipeline, written as slow, obviously-correct Python over arbitrary-precision
ints. It exists ONLY as the test anchor for the fast JAX/Pallas path: every
device op is validated against these functions.

The hash specifications were re-derived from the reference's own
32-bit-decomposed CUDA port of t1ha2 (reference:src/cuda_kernel.cu:71-246),
which the reference validates bit-exactly against the production `t1ha`
crate (reference:src/lib.rs:517-589), and from the wyhash-v1 wyrng algorithm
used by the `wyhash` 0.5 crate's WyRng.
"""

from hypergen_tpu.oracle.hashes import (  # noqa: F401
    mm_hash64,
    t1ha2_atonce,
    wyrng_next,
    wyrng_words,
)
from hypergen_tpu.oracle.pipeline import (  # noqa: F401
    ani_from_dot,
    canonical_kmers,
    compute_pairwise_ani,
    encode_hash_hd,
    extract_kmer_hashes,
    normalize_seq,
)
