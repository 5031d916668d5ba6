"""Pallas rolling-hash kernel parity vs. the XLA path (interpret mode on CPU).

The same kernel is validated against the XLA path on real TPU hardware by
the benchmark harness; here interpret mode pins the semantics in CI.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.kmers import hash_kmer_positions
from hypergen_tpu.ops.pallas.hash_kernel import hash_chunks_pallas
from hypergen_tpu.params import fracminhash_threshold

rng = np.random.default_rng(5)


def _check(codes, k, seed, thr, method="t1ha2", canonical=True):
    h_ref, keep_ref = hash_kmer_positions(
        jnp.asarray(codes), k, seed, thr, canonical=canonical, method=method
    )
    h_pal, keep_pal = hash_chunks_pallas(
        jnp.asarray(codes), k, seed, thr, canonical=canonical, method=method,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_pal), np.asarray(keep_ref))
    np.testing.assert_array_equal(
        u.to_np_u64(h_pal)[np.asarray(keep_pal)],
        u.to_np_u64(h_ref)[np.asarray(keep_ref)],
    )
    return int(np.asarray(keep_ref).sum())


@pytest.mark.parametrize("k", [8, 15, 16, 21, 31])
def test_kernel_parity_k(k):
    codes = rng.integers(0, 5, size=(2, 1024 + k - 1)).astype(np.uint8)
    codes[1] = rng.integers(0, 4, size=1024 + k - 1)  # one junk-free row
    n = _check(codes, k, 7, fracminhash_threshold(2))
    assert n > 0


def test_kernel_parity_mmhash():
    codes = rng.integers(0, 5, size=(2, 1044)).astype(np.uint8)
    _check(codes, 21, 123, fracminhash_threshold(2), method="mmhash")


def test_kernel_parity_noncanonical():
    codes = rng.integers(0, 4, size=(1, 1044)).astype(np.uint8)
    _check(codes, 21, 123, fracminhash_threshold(1), canonical=False)


def test_kernel_all_invalid():
    codes = np.full((1, 1044), 4, dtype=np.uint8)
    n = _check(codes, 21, 123, fracminhash_threshold(1))
    assert n == 0


def test_kernel_multi_lsub():
    """lsub > 1: windows crossing cell boundaries via the halo."""
    codes = rng.integers(0, 5, size=(1, 4096 + 20)).astype(np.uint8)
    _check(codes, 21, 123, fracminhash_threshold(2))


def test_kernel_rejects_bad_width():
    codes = np.zeros((1, 1000), dtype=np.uint8)
    with pytest.raises(ValueError):
        hash_chunks_pallas(jnp.asarray(codes), 21, 123, 100, interpret=True)


@pytest.mark.parametrize("cells", [256, 512, 4096])
def test_kernel_parity_wide_cells(cells):
    """ILP-widened tiles (cells > 1024 => multiple VREGs per op) must be
    bit-identical to the default layout."""
    k = 21
    C = max(cells, 4096)
    codes = rng.integers(0, 5, size=(2, C + k - 1)).astype(np.uint8)
    thr = fracminhash_threshold(3)
    h_ref, keep_ref = hash_kmer_positions(
        jnp.asarray(codes), k, 123, thr
    )
    h_pal, keep_pal = hash_chunks_pallas(
        jnp.asarray(codes), k, 123, thr, interpret=True, cells=cells
    )
    np.testing.assert_array_equal(np.asarray(keep_pal), np.asarray(keep_ref))
    np.testing.assert_array_equal(
        u.to_np_u64(h_pal)[np.asarray(keep_pal)],
        u.to_np_u64(h_ref)[np.asarray(keep_ref)],
    )
