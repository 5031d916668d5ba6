"""TSV report writers: streamed writer byte-parity + search/dist row
consistency (r2 verdict items #4/#5)."""

import numpy as np
import pytest

from hypergen_tpu.models.comparator import (
    count_search_hits,
    format_ani_report,
    write_ani_report,
    write_search_report,
)


class TestWriteAniReport:
    @pytest.mark.parametrize("top_k", [0, 7])
    @pytest.mark.parametrize("threshold", [0.0, 85.0, 101.0])
    def test_byte_identical_to_format(self, tmp_path, threshold, top_k):
        rng = np.random.default_rng(5)
        n = 5000
        ref_names = [f"r{i}.fna" for i in range(64)]
        q_names = [f"q{i}.fna" for i in range(64)]
        ri = rng.integers(0, 64, size=n)
        qi = rng.integers(0, 64, size=n)
        # quantized ANI values force plenty of exact ties (stable-sort
        # tie-reversal must match) plus a run straddling the threshold
        ani = (rng.integers(0, 40, size=n) * 2.5).astype(np.float32)
        exp_tsv, exp_n = format_ani_report(
            ref_names, q_names, ri, qi, ani, threshold, top_k=top_k
        )
        out = tmp_path / "out.tsv"
        got_n = write_ani_report(
            out, ref_names, q_names, ri, qi, ani, threshold, top_k=top_k,
            chunk_rows=257,  # force many chunks
        )
        assert got_n == exp_n
        assert out.read_text() == exp_tsv

    def test_nan_rows_excluded(self, tmp_path):
        """NaN ANIs (e.g. zero-norm HVs upstream of any pre-filter) must be
        dropped, not sorted to the front of the descending order where they
        would displace the real top rows."""
        names = ["a", "b", "c", "d"]
        idx = np.arange(4)
        ani = np.asarray([99.0, np.nan, 97.0, np.nan], np.float32)
        exp_tsv, exp_n = format_ani_report(names, names, idx, idx, ani, 85.0)
        out = tmp_path / "out.tsv"
        got_n = write_ani_report(out, names, names, idx, idx, ani, 85.0)
        assert got_n == exp_n == 2
        assert out.read_text() == exp_tsv
        assert "nan" not in out.read_text()

    def test_empty(self, tmp_path):
        out = tmp_path / "out.tsv"
        n = write_ani_report(
            out, [], [], np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.float32), 85.0,
        )
        assert n == 0
        assert out.read_text() == ""


class TestWriteSearchReport:
    """The streamed search writer must be byte-identical to applying
    format_ani_report per query (the r3 run_search_cli formatting loop,
    replaced for bounded memory at GTDB query counts)."""

    def _reference_tsv(self, ref_names, q_names, idx, ani, thr):
        lines, n = [], 0
        for qi in range(ani.shape[0]):
            tsv, n_q = format_ani_report(
                ref_names, [q_names[qi]], idx[qi],
                np.zeros(idx.shape[1], np.int64), ani[qi], thr,
            )
            lines.append(tsv)
            n += n_q
        return "".join(lines), n

    @pytest.mark.parametrize("threshold", [0.0, 85.0, 101.0])
    def test_byte_identical_to_per_query_format(self, tmp_path, threshold):
        rng = np.random.default_rng(11)
        n_q, k = 300, 10
        ref_names = [f"r{i}.fna" for i in range(512)]
        q_names = [f"q{i}.fna" for i in range(n_q)]
        idx = rng.integers(0, 512, size=(n_q, k))
        # quantized values force in-row ties (stable reversal must match);
        # NaN marks padded / short-shard slots
        ani = (rng.integers(0, 40, size=(n_q, k)) * 2.5).astype(np.float32)
        ani[rng.random((n_q, k)) < 0.1] = np.nan
        exp_tsv, exp_n = self._reference_tsv(
            ref_names, q_names, idx, ani, threshold
        )
        out = tmp_path / "hits.tsv"
        got_n = write_search_report(
            out, ref_names, q_names, idx, ani, threshold, chunk_queries=37
        )
        assert got_n == exp_n
        assert out.read_text() == exp_tsv
        assert count_search_hits(ani, threshold) == exp_n

    def test_empty_queries(self, tmp_path):
        out = tmp_path / "hits.tsv"
        n = write_search_report(
            out, ["r"], [], np.zeros((0, 3), np.int64),
            np.zeros((0, 3), np.float32), 85.0,
        )
        assert n == 0
        assert out.read_text() == ""


class TestDensePairsGuard:
    def test_ani_pairs_rejects_gtdb_scale(self):
        """The dense M x N table is an OOM trap at scale; the guard must
        fire BEFORE any tile allocation and point at the streamed path."""
        from hypergen_tpu.io.sketch_db import ShardedDB
        from hypergen_tpu.models.comparator import Comparator

        M = 1 << 13
        hv = np.zeros((M, 4), np.int16)  # shapes only; guard fires first
        norms = np.zeros(M, np.int32)
        db = ShardedDB(
            ksize=21, scaled=1500, canonical=True, seed=123, hv_d=4,
            names=[str(i) for i in range(M)], hvs=hv, norms=norms,
        )
        comp = Comparator(ksize=21)
        with pytest.raises(ValueError, match="ani_pairs_streamed"):
            comp.ani_pairs(db, db, symmetric=True)


class TestSearchDistConsistency:
    def test_search_rows_byte_equal_dist_rows(self, tmp_path):
        """Any pair reported by both `dist` and `search` must produce a
        byte-identical TSV row (same ref\\tquery order, same exact
        host-chain ANI value; r2 verdict weak #2)."""
        from hypergen_tpu.cli import main as cli_main

        rng = np.random.default_rng(3)
        data = tmp_path / "data"
        data.mkdir()
        base = rng.integers(0, 4, size=6000)
        for i in range(4):
            codes = base.copy()
            mut = rng.integers(0, codes.size, size=40 * i)
            codes[mut] = (codes[mut] + 1) % 4
            seq = "".join("ACGT"[c] for c in codes)
            (data / f"g{i}.fna").write_text(f">g{i}\n{seq}\n")
        sk = tmp_path / "db.sketch"
        cli_main(["sketch", "-p", str(data), "-o", str(sk),
                  "-s", "30", "-d", "1024"])
        dist_tsv = tmp_path / "dist.tsv"
        cli_main(["dist", "-r", str(sk), "-q", str(sk),
                  "-o", str(dist_tsv), "-a", "0.0"])
        search_tsv = tmp_path / "hits.tsv"
        cli_main(["search", "-r", str(sk), "-q", str(sk),
                  "-o", str(search_tsv), "-a", "0.0", "--top_k", "4"])
        dist_rows = set(dist_tsv.read_text().splitlines())
        assert dist_rows
        search_rows = search_tsv.read_text().splitlines()
        assert search_rows
        # dist covers i<j pairs only; search also emits self-hits and the
        # j<i direction — every shared pair must match byte-for-byte
        dist_pairs = {tuple(r.split("\t")[:2]): r for r in dist_rows}
        checked = 0
        for row in search_rows:
            ref, q, _ = row.split("\t")
            if (ref, q) in dist_pairs:
                assert row == dist_pairs[(ref, q)]
                checked += 1
        assert checked > 0
