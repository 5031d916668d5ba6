"""Native C++ FASTA parser parity vs the numpy reference reader."""

import gzip

import numpy as np
import pytest

from hypergen_tpu.io import fastx

fastx_native = pytest.importorskip(
    "hypergen_tpu.io.fastx_native",
    reason="native toolchain unavailable",
)


def _py(path):
    return fastx.codes_from_records(fastx.read_fasta_records(path))


@pytest.fixture(scope="module", autouse=True)
def _built():
    try:
        fastx_native._load()
    except ImportError as e:
        pytest.skip(str(e))


CASES = [
    b">r1 desc\nACGT\nacgtNNU-\n>r2\nTTTT\n",
    b">a\nACGT",  # no trailing newline
    b">a\r\nAC GT\r\n>b\r\nGG\r\n",  # CRLF + interior space -> invalid
    b">e1\n>e2\nACGT\n",  # empty record keeps its separator
    b">x\n" + b"ACGTN" * 1000 + b"\n",
]


@pytest.mark.parametrize("content", CASES)
def test_fused_packed_reader_matches_numpy(tmp_path, content):
    """hg_read_genome_packed (one-pass parse+pack) == numpy parse -> pack."""
    p = tmp_path / "x.fna"
    p.write_bytes(content)
    g_native = fastx_native.read_genome_packed(p)
    codes = _py(p)
    g_numpy = fastx.packed_from_codes(codes)
    assert g_native[2] == g_numpy.length == codes.shape[0]
    np.testing.assert_array_equal(g_native[0], g_numpy.packed2)
    np.testing.assert_array_equal(g_native[1], g_numpy.runs)
    # and the PackedGenome expands back to the exact code array
    np.testing.assert_array_equal(
        fastx.codes_from_packed(g_numpy), codes
    )


def test_fused_packed_reader_gzip(tmp_path):
    content = CASES[0]
    p = tmp_path / "x.fna.gz"
    with gzip.open(p, "wb") as f:
        f.write(content)
    g = fastx.read_genome_packed(p)
    ref = fastx.packed_from_codes(_py(p))
    np.testing.assert_array_equal(g.packed2, ref.packed2)
    np.testing.assert_array_equal(g.runs, ref.runs)
    assert g.length == ref.length


@pytest.mark.parametrize("content", CASES)
def test_native_matches_python(tmp_path, content):
    p = tmp_path / "x.fna"
    p.write_bytes(content)
    np.testing.assert_array_equal(
        fastx_native.read_genome_codes(p), _py(p)
    )


def test_native_gzip(tmp_path):
    p = tmp_path / "x.fna.gz"
    p.write_bytes(gzip.compress(CASES[0]))
    np.testing.assert_array_equal(fastx_native.read_genome_codes(p), _py(p))


def test_native_errors(tmp_path):
    p = tmp_path / "bad.fna"
    p.write_bytes(b"ACGT\n")
    with pytest.raises(ValueError, match="before FASTA header"):
        fastx_native.read_genome_codes(p)
    p2 = tmp_path / "empty.fna"
    p2.write_bytes(b"")
    with pytest.raises(ValueError, match="no FASTA records"):
        fastx_native.read_genome_codes(p2)


def test_fastx_dispatch_uses_native(tmp_path):
    """io.fastx.read_genome_codes should route through the native parser."""
    p = tmp_path / "x.fna"
    p.write_bytes(CASES[0])
    got = fastx.read_genome_codes(p)
    np.testing.assert_array_equal(got, _py(p))


class TestNativePack:
    def test_native_pack_matches_numpy(self):
        import hypergen_tpu.models.sketcher as sk
        from hypergen_tpu.io.fastx_native import pack_codes_runs as native_pack

        rng = np.random.default_rng(13)
        for L, P, cap in [(50, 56, 16), (8191, 8192, 64), (10_000, 10_240, 128)]:
            codes = rng.integers(0, 6, size=L, dtype=np.uint8)
            codes[100:130] = 4  # a guaranteed run
            p2_n, runs_n, nr_n = native_pack(codes, P, cap)
            # force the numpy path for the reference result
            saved = sk._NATIVE_PACK, sk._NATIVE_PACK_TRIED
            sk._NATIVE_PACK, sk._NATIVE_PACK_TRIED = None, True
            try:
                p2_p, runs_p, nr_p = sk.pack_codes_runs(codes, P, cap)
            finally:
                sk._NATIVE_PACK, sk._NATIVE_PACK_TRIED = saved
            np.testing.assert_array_equal(p2_n, p2_p)
            np.testing.assert_array_equal(runs_n, runs_p)
            assert nr_n == nr_p

    def test_native_pack_cap_overflow_reports_true_count(self):
        from hypergen_tpu.io.fastx_native import pack_codes_runs as native_pack

        codes = np.tile(np.array([0, 4], np.uint8), 50)  # 50 runs
        _, runs, n_runs = native_pack(codes, 104, 8)
        assert n_runs > 8
        assert (runs[:8] > 0).any()
