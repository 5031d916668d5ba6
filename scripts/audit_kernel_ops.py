"""Instruction audit of the packed hash kernel's per-position work.

r4 verdict item 2: BENCH_r04 published vpu_sol_fraction_hash = 0.245 from
an ASSUMED 300 VPU ops/position and an ASSUMED 4096-lane-ALU peak, while
the r2 analysis called the same kernel "near speed-of-light". This script
replaces both assumptions with a count: it traces ONE rolling-window
position step (the exact `_advance_hash` shared by both kernels, plus the
base extract and the slot-emit math of `_rolling_packed_kernel`) to a
jaxpr and tallies every vector primitive by category. Each primitive is
one lane-op per position (all operands are (sub, 128) u32 vectors), so

    ops/position = primitive count,
    achieved lane-ops/s = measured hashed-positions/s * ops/position,

where hashed positions include the k-1 halo warmup every cell repeats
(positions_hashed = B * nc * cells * (lsub + k - 1)).

The count is the TRACE-level tally: Mosaic will CSE a few constant
subexpressions and fold multiply-by-constant-limb simplifications, so it
is an upper bound within ~10%. The multiply column is exact arithmetic
structure (16-bit-limb mul32x32_64 decomposition) and is the column that
decides attainability: public TPU docs do not state the VPU's u32-multiply
issue width, so the bottom table back-solves what multiply throughput the
measured kernel time IMPLIES under several port-width hypotheses.

Run (CPU, no chip needed): python scripts/audit_kernel_ops.py
"""

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.pallas.hash_kernel import _advance_hash
from hypergen_tpu.ops.u64 import U64

KSIZE = 21
SEED = 123
THRESHOLD = (1 << 64) // 1500
CAP = 4  # production cell_cap at lsub=64, scaled=1500
SUB, LANES = 8, 128

# primitive -> accounting bucket. Everything not listed is reported raw.
BUCKETS = {
    "mul": "mul",
    "add": "addsub",
    "sub": "addsub",
    "and": "logic",
    "or": "logic",
    "xor": "logic",
    "not": "logic",
    "shift_left": "shift",
    "shift_right_logical": "shift",
    "shift_right_arithmetic": "shift",
    "lt": "cmp",
    "le": "cmp",
    "gt": "cmp",
    "ge": "cmp",
    "eq": "cmp",
    "ne": "cmp",
    "select_n": "select",
    "convert_element_type": "convert",
}


def count_ops(jaxpr) -> Counter:
    c = Counter()
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        subs = [
            v for v in eqn.params.values()
            if hasattr(v, "jaxpr") or hasattr(v, "eqns")
        ]
        if subs:  # jit/pjit/closed_call/cond/scan bodies: count inline
            for sub in subs:
                c.update(count_ops(getattr(sub, "jaxpr", sub)))
            continue
        c[prim] += 1
    return c


def one_position_step(word, shift, state, cnt, pos, pos_end):
    """Arithmetic of exactly one kernel position: base extract ->
    _advance_hash -> threshold/emit math (slot writes modeled as selects,
    matching _rolling_packed_kernel.emit)."""
    f2 = U64(state[0], state[1])
    r2 = U64(state[2], state[3])
    n_u32 = (KSIZE + 3) // 4
    fw = [state[4 + q] for q in range(n_u32)]
    rw = [state[4 + n_u32 + q] for q in range(n_u32)]

    cb = (word >> shift) & np.uint32(3)
    (f2, r2, fw, rw), h = _advance_hash(
        (f2, r2, fw, rw), cb, ksize=KSIZE, seed=SEED, canonical=True,
        method="t1ha2",
    )
    keep = u.lt_const(h, THRESHOLD) & (pos < pos_end)
    slots = []
    for s in range(CAP):
        put = keep & (cnt == s)
        slots.append((
            jnp.where(put, h.hi, np.uint32(0)),
            jnp.where(put, h.lo, np.uint32(0)),
            jnp.where(put, pos, -1),
        ))
    cnt = cnt + keep.astype(jnp.int32)
    return (f2.hi, f2.lo, r2.hi, r2.lo, *fw, *rw, cnt), slots


def main():
    n_u32 = (KSIZE + 3) // 4
    shape = (SUB, LANES)
    word = jnp.zeros(shape, jnp.uint32)
    shift = jnp.zeros(shape, jnp.uint32)
    state = [jnp.zeros(shape, jnp.uint32) for _ in range(4 + 2 * n_u32)]
    cnt = jnp.zeros(shape, jnp.int32)
    pos = jnp.zeros(shape, jnp.int32)
    pos_end = jnp.zeros(shape, jnp.int32)

    jaxpr = jax.make_jaxpr(one_position_step)(
        word, shift, state, cnt, pos, pos_end
    )
    raw = count_ops(jaxpr.jaxpr)

    buckets = Counter()
    for prim, n in raw.items():
        buckets[BUCKETS.get(prim, f"other:{prim}")] += n
    total = sum(
        n for b, n in buckets.items() if not b.startswith("other:")
    )
    print(f"k={KSIZE} canonical t1ha2, cap={CAP} slot emit")
    print("\nper-position vector-primitive tally (trace level):")
    for b, n in buckets.most_common():
        print(f"  {b:10s} {n:4d}")
    print(f"  {'TOTAL':10s} {total:4d}  (lane-ops/position)")

    print("\nraw primitive detail:")
    for prim, n in sorted(raw.items(), key=lambda kv: -kv[1]):
        print(f"  {prim:28s} {n:4d}")

    # --- stage attribution: which op groups own the step ------------------
    def ops_of(fn, *args):
        c = count_ops(jax.make_jaxpr(fn)(*args).jaxpr)
        return sum(n for p, n in c.items() if p in BUCKETS)

    from hypergen_tpu.ops.hashes import t1ha2_atonce_words

    zero = jnp.zeros(shape, jnp.uint32)
    t1ha_only = ops_of(
        lambda *w: t1ha2_atonce_words(
            [U64(w[2 * i], w[2 * i + 1]) for i in range(3)], KSIZE, SEED
        ),
        *([zero] * 6),
    )
    print(f"\nt1ha2_atonce_words alone: {t1ha_only} ops/position")
    print(f"window+roll+select+emit:  {total - t1ha_only} ops/position")

    # warm-up roll-only step (r5: the k-1 halo positions per cell now run
    # window maintenance WITHOUT the hash — _rolling_packed_kernel warm loop)
    from hypergen_tpu.ops.pallas.hash_kernel import _roll_window

    def one_warm_step(word, shift, *state):
        f2 = U64(state[0], state[1])
        r2 = U64(state[2], state[3])
        fw = [state[4 + q] for q in range(n_u32)]
        rw = [state[4 + n_u32 + q] for q in range(n_u32)]
        cb = (word >> shift) & np.uint32(3)
        f2, r2, fw, rw = _roll_window(
            (f2, r2, fw, rw), cb, ksize=KSIZE, method="t1ha2"
        )
        return (f2.hi, f2.lo, r2.hi, r2.lo, *fw, *rw)

    roll_ops = ops_of(
        one_warm_step, word, shift, *([zero] * (4 + 2 * n_u32))
    )
    print(f"warm-up roll-only step:   {roll_ops} ops/position")

    # --- implied issue rates from the measured hash stage ------------------
    # production shape: B=8 x 4.19 Mbp, k=21, C=2^17, nc=32, cells=2048
    B, NC, CELLS = 8, 32, 2048
    LSUB = (1 << 17) // CELLS
    halo_T = LSUB + KSIZE - 1
    # full-step ops on the LSUB emitting positions + roll-only warm-up
    eff_ops = total + roll_ops * (KSIZE - 1) / LSUB
    print(
        f"\neffective ops per USEFUL position (warm-split kernel): "
        f"{eff_ops:.1f} = {total} + {roll_ops}*{KSIZE - 1}/{LSUB} "
        f"(old full-body-halo accounting: {total * halo_T / LSUB:.1f})"
    )
    useful = B * NC * CELLS * LSUB
    for ms in (5.9,):
        pos_rate = useful / (ms * 1e-3)
        print(
            f"\nmeasured hash stage {ms} ms -> {pos_rate / 1e9:.2f}e9 useful "
            f"positions/s ({useful / 1e6:.1f}M positions + roll-only warmup)"
        )
        ops_rate = pos_rate * eff_ops
        mul_rate = pos_rate * buckets["mul"]
        print(f"achieved lane-ops/s: {ops_rate:.3e} (all categories)")
        print(f"achieved u32-multiplies/s: {mul_rate:.3e}")
        # v5e TensorCore: 8x128 VPU lanes; clock ~1.5 GHz would put the
        # 4-ALU all-ops peak at 6.1e12 lane-ops/s
        for clock in (1.5e9,):
            lanes = SUB * LANES
            print(f"\nhypotheses at clock {clock / 1e9:.2f} GHz, "
                  f"{lanes} lanes:")
            for ports in (4, 2, 1):
                peak = lanes * ports * clock
                print(
                    f"  if ALL ops issue on {ports} ports: peak "
                    f"{peak:.2e}, SoL fraction {ops_rate / peak:.2f}"
                )
            for mports in (2, 1, 0.5):
                mpeak = lanes * mports * clock
                print(
                    f"  if u32 mul issues on {mports} port(s): mul-bound "
                    f"SoL fraction {mul_rate / mpeak:.2f}"
                )


if __name__ == "__main__":
    main()
