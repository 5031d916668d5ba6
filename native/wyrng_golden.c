/* Golden-vector generator for the wyhash-v1 `wyrng` PRNG.
 *
 * The reference HD encoder (reference:src/hd.rs:94-112) draws its bipolar
 * random rows from `wyhash::WyRng` (crate wyhash 0.5.0, an implementation of
 * Wang Yi's wyhash/wyrand v1): per sampled k-mer hash h it constructs
 * `WyRng::seed_from_u64(h)` and calls `next_u64()` D/64 times.
 *
 * This file is an INDEPENDENT implementation of that recurrence in C using
 * native 128-bit multiplies (__uint128_t), compiled with the in-image g++.
 * It exists so the repo's Python oracle (hypergen_tpu/oracle/hashes.py,
 * arbitrary-precision ints) and the JAX device path (16-bit-limb emulation)
 * are pinned by vectors produced by a third arithmetic substrate, the same
 * way t1ha2 is pinned by vectors from a compiled build of the reference's
 * CUDA port.
 *
 * wyhash v1 recurrence (wyhash 0.5 crate, fn wyrng / struct WyRng):
 *   state += P0;  out = hi64(x*y) ^ lo64(x*y)  with x = state^P1, y = state
 *   P0 = 0xa0761d6478bd642f, P1 = 0xe7037ed1a0b428db
 *
 * Seeding: wyhash 0.5's `impl SeedableRng for WyRng` overrides
 * `seed_from_u64(state)` to store the raw u64 (its from_seed is
 * u64::from_le_bytes). We emit vectors for that ("raw") semantics, and ALSO
 * for the hypothetical case that the crate had NOT overridden it and Rust's
 * rand_core-0.6 default (PCG32 expansion of the u64 into 8 seed bytes)
 * applied ("rc06"). The two are mutually exclusive; tests pin the oracle to
 * "raw" and assert it differs from "rc06", so if a future round obtains
 * fixtures from a live reference build, one line of output decides the
 * question.
 *
 * Usage:  make wyrng_golden && ./wyrng_golden > ../tests/golden_wyrng.json
 */

#include <inttypes.h>
#include <stdio.h>

static const uint64_t P0 = 0xa0761d6478bd642fULL;
static const uint64_t P1 = 0xe7037ed1a0b428dbULL;

static uint64_t wymum(uint64_t a, uint64_t b) {
    __uint128_t r = (__uint128_t)a * (__uint128_t)b;
    return (uint64_t)(r >> 64) ^ (uint64_t)r;
}

static uint64_t wyrng_next(uint64_t *state) {
    *state += P0;
    return wymum(*state ^ P1, *state);
}

/* rand_core 0.6 default SeedableRng::seed_from_u64: PCG32 output expanded
 * into the Seed byte array (8 bytes -> two 4-byte chunks, little-endian),
 * then from_seed = u64::from_le_bytes. */
static uint64_t rc06_seed_from_u64(uint64_t state) {
    const uint64_t MUL = 6364136223846793005ULL;
    const uint64_t INC = 11634580027462260723ULL;
    uint32_t words[2];
    for (int c = 0; c < 2; c++) {
        state = state * MUL + INC;
        uint32_t xorshifted = (uint32_t)(((state >> 18) ^ state) >> 27);
        uint32_t rot = (uint32_t)(state >> 59);
        words[c] = (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31));
    }
    return (uint64_t)words[0] | ((uint64_t)words[1] << 32);
}

int main(void) {
    const uint64_t seeds[] = {
        0ULL,
        1ULL,
        123ULL,
        0xDEADBEEF12345678ULL,
        0xFFFFFFFFFFFFFFFFULL,
        0xA0761D6478BD642FULL, /* == P0: first state increment wraps past 2^64 */
        6620741575644413938ULL, /* an actual t1ha2 k-mer hash (ACGT... k=21) */
    };
    const int n_seeds = sizeof(seeds) / sizeof(seeds[0]);
    const int n_words = 8;

    printf("{\n");
    for (int variant = 0; variant < 2; variant++) {
        printf("  \"%s\": {\n", variant == 0 ? "raw" : "rc06");
        for (int i = 0; i < n_seeds; i++) {
            uint64_t state = variant == 0 ? seeds[i] : rc06_seed_from_u64(seeds[i]);
            printf("    \"%" PRIu64 "\": [", seeds[i]);
            for (int w = 0; w < n_words; w++) {
                printf("%s%" PRIu64, w ? ", " : "", wyrng_next(&state));
            }
            printf("]%s\n", i + 1 < n_seeds ? "," : "");
        }
        printf("  }%s\n", variant == 0 ? "," : "");
    }
    printf("}\n");
    return 0;
}
