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
