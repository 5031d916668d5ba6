"""Reference-independent .sketch interop fixture.

The byte-layout tests in test_io.py validate the repo's writer against the
repo's own expectations — self-referential. This module assembles a .sketch
file BY HAND from the bincode 1.x legacy spec (little-endian, fixed-width
ints, u64 length prefixes; reference:src/utils.rs:234-258, struct layout
reference:src/types.rs:224-235) and a from-the-spec scalar re-implementation
of the BitPacker8x vertical AVX2 layout (reference:src/hd.rs:139-157),
sharing no code with hypergen_tpu.io. The code under test must read it,
recover the exact dense HVs, and re-serialize it byte-identically.

Covers every quant width b in [6, 16], negative hv_norm_2, a non-ASCII
UTF-8 filename, multi-block HVs, and canonical=False.
"""

import numpy as np
import pytest

from hypergen_tpu.io.sketch_db import dump_sketch, load_sketch, sketches_to_db


# --- independent scalar BitPacker8x packer (spec: 256-value blocks, 8 lanes
# of 32 values, LSB-first bitstream per lane, register i = word i of every
# lane at byte offset 32*i + 4*l) ------------------------------------------


def _compress_scalar(hv, bits):
    """Dense int16 list -> (packed bytes, bits): offset 2^(b-1), low b bits."""
    offset = 1 << (bits - 1)
    masked = [(int(v) + offset) & ((1 << bits) - 1) for v in hv]
    out = b""
    for blk in range(0, len(masked), 256):
        # force the block's width by packing with explicit bit count
        vals = masked[blk : blk + 256]
        lanes = [[vals[8 * j + lane] for j in range(32)] for lane in range(8)]
        buf = bytearray(32 * bits)
        for lane in range(8):
            stream = []
            for v in lanes[lane]:
                for t in range(bits):
                    stream.append((v >> t) & 1)
            for i in range(bits):
                word = 0
                for t in range(32):
                    word |= stream[i * 32 + t] << t
                buf[32 * i + 4 * lane : 32 * i + 4 * lane + 4] = word.to_bytes(
                    4, "little"
                )
        out += bytes(buf)
    return out


# --- hand-rolled bincode 1.x writer (int.to_bytes only) ---------------------


def _u64(x):
    return int(x).to_bytes(8, "little")


def _record_bytes(ksize, scaled, canonical, seed, hv_d, bits, norm2, name, packed):
    body = bytes([ksize])
    body += _u64(scaled)
    body += bytes([1 if canonical else 0])
    body += _u64(seed)
    body += _u64(hv_d)  # usize as u64
    body += bytes([bits])
    body += int(norm2 & 0xFFFFFFFF).to_bytes(4, "little")  # i32 two's compl.
    nm = name.encode("utf-8")
    body += _u64(len(nm)) + nm
    assert len(packed) % 2 == 0
    body += _u64(len(packed) // 2)  # Vec<i16> element count
    body += packed
    return body


def _make_dense(bits, hv_d, rng):
    """Dense int16 HV spanning exactly [-2^(b-1), 2^(b-1)-1]."""
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    hv = rng.integers(lo, hi + 1, size=hv_d).astype(np.int16)
    hv[0], hv[1] = lo, hi  # pin the range so quant width is exactly `bits`
    return hv


@pytest.fixture(scope="module")
def fixture_blob_and_expected():
    rng = np.random.default_rng(314159)
    records = []
    for i, bits in enumerate(range(6, 17)):
        hv_d = 512 if bits in (7, 16) else 256  # include multi-block cases
        dense = _make_dense(bits, hv_d, rng)
        norm2 = -123456789 if bits == 9 else int(
            np.sum(dense.astype(np.int64) ** 2) & 0x7FFFFFFF
        )
        name = "génome_αβ🧬_%d.fna" % bits if bits == 11 else f"g{bits}.fna"
        records.append(
            dict(
                ksize=21,
                scaled=1500,
                canonical=(bits != 12),
                seed=123,
                hv_d=hv_d,
                bits=bits,
                norm2=norm2,
                name=name,
                dense=dense,
            )
        )
    blob = _u64(len(records))
    for r in records:
        packed = _compress_scalar(r["dense"].tolist(), r["bits"])
        blob += _record_bytes(
            r["ksize"], r["scaled"], r["canonical"], r["seed"], r["hv_d"],
            r["bits"], r["norm2"], r["name"], packed,
        )
    return blob, records


class TestInteropFixture:
    def test_load_recovers_fields_and_dense_hvs(
        self, fixture_blob_and_expected, tmp_path
    ):
        blob, records = fixture_blob_and_expected
        p = tmp_path / "fixture.sketch"
        p.write_bytes(blob)
        sketches = load_sketch(p)
        assert len(sketches) == len(records)
        for s, r in zip(sketches, records):
            assert (s.ksize, s.scaled, s.canonical, s.seed) == (
                r["ksize"], r["scaled"], r["canonical"], r["seed"],
            )
            assert (s.hv_d, s.hv_quant_bits, s.hv_norm_2) == (
                r["hv_d"], r["bits"], r["norm2"],
            )
            assert s.file_str == r["name"]
            np.testing.assert_array_equal(s.decompress(), r["dense"])

    def test_roundtrip_byte_identity(self, fixture_blob_and_expected, tmp_path):
        blob, _ = fixture_blob_and_expected
        p = tmp_path / "fixture.sketch"
        p.write_bytes(blob)
        out = tmp_path / "rewritten.sketch"
        dump_sketch(load_sketch(p), out)
        assert out.read_bytes() == blob

    def test_repo_compressor_matches_independent_packer(
        self, fixture_blob_and_expected
    ):
        """The repo's vectorized pack_hv must emit the same bytes as the
        from-the-spec scalar packer for every width."""
        from hypergen_tpu.io.bitpack import find_quant_bits, pack_hv

        _, records = fixture_blob_and_expected
        for r in records:
            assert find_quant_bits(r["dense"]) == r["bits"]
            assert pack_hv(r["dense"], r["bits"]) == _compress_scalar(
                r["dense"].tolist(), r["bits"]
            )

    def test_sketches_to_db_dense_equality(
        self, fixture_blob_and_expected, tmp_path
    ):
        blob, records = fixture_blob_and_expected
        # DB conversion needs homogeneous hv_d; use the 256-wide subset
        sel = [r for r in records if r["hv_d"] == 256]
        sub = _u64(len(sel))
        for r in sel:
            sub += _record_bytes(
                r["ksize"], r["scaled"], r["canonical"], r["seed"], r["hv_d"],
                r["bits"], r["norm2"], r["name"],
                _compress_scalar(r["dense"].tolist(), r["bits"]),
            )
        p = tmp_path / "sub.sketch"
        p.write_bytes(sub)
        db = sketches_to_db(load_sketch(p))
        for i, r in enumerate(sel):
            np.testing.assert_array_equal(db.hvs[i], r["dense"])
