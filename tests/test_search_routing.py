"""Search-mode routing: production-scale HVs must take the 3-matmul
"small" Karatsuba split (r4 verdict item 3).

`_resolve_mxu` upgrades use_mxu=True to "small" when every |hv| fits
SMALL_SPLIT_MAX (all genomes <~9 Mbp at scaled=1500 — the production
regime), cutting the exact int16 MXU dot from 4 int8 passes to 3. These
tests pin (a) the resolver's decision boundary, (b) that `run_search_cli`
actually routes through it on a TPU-defaulting backend, and (c) that the
"small" TSV is byte-identical to the plain-path TSV (the split is exact
mod 2^32, so routing can never change output).
"""

import numpy as np
import pytest

import hypergen_tpu.parallel.search as search_mod
from hypergen_tpu.cli import main as cli_main
from hypergen_tpu.ops.ani import SMALL_SPLIT_MAX, dot_i16_exact
from hypergen_tpu.parallel.search import _resolve_mxu


def _write_genome(path, length, seed):
    rng = np.random.default_rng(seed)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=length)
    path.write_bytes(b">g\n" + seq.tobytes() + b"\n")


class TestResolveMxu:
    def test_production_scale_upgrades_to_small(self):
        rng = np.random.default_rng(0)
        db = rng.integers(-200, 200, size=(16, 64)).astype(np.int16)
        q = rng.integers(-200, 200, size=(4, 64)).astype(np.int16)
        assert _resolve_mxu(True, db, q) == "small"

    def test_boundary_value_still_small(self):
        a = np.full((2, 8), SMALL_SPLIT_MAX, dtype=np.int16)
        assert _resolve_mxu(True, a, -a) == "small"

    def test_over_bound_falls_back_to_four_pass(self):
        a = np.full((2, 8), SMALL_SPLIT_MAX + 1, dtype=np.int16)
        assert _resolve_mxu(True, a, a) is True

    def test_explicit_false_untouched(self):
        a = np.zeros((2, 8), dtype=np.int16)
        assert _resolve_mxu(False, a, a) is False

    def test_small_split_exact_at_boundary(self):
        rng = np.random.default_rng(1)
        r = rng.integers(
            -SMALL_SPLIT_MAX, SMALL_SPLIT_MAX + 1, size=(8, 128)
        ).astype(np.int16)
        q = rng.integers(
            -SMALL_SPLIT_MAX, SMALL_SPLIT_MAX + 1, size=(8, 128)
        ).astype(np.int16)
        # include the extreme corners
        r[0, :] = SMALL_SPLIT_MAX
        q[0, :] = SMALL_SPLIT_MAX
        r[1, :] = -SMALL_SPLIT_MAX
        got = np.asarray(dot_i16_exact(r, q, use_mxu="small"))
        exp = np.asarray(dot_i16_exact(r, q, use_mxu=False))
        np.testing.assert_array_equal(got, exp)


class TestCliRouting:
    def _sketch(self, tmp_path):
        data = tmp_path / "data"
        data.mkdir()
        for i in range(4):
            _write_genome(data / f"g{i}.fna", 4000, seed=50 + i)
        out = tmp_path / "db.sketch"
        cli_main(["sketch", "-p", str(data), "-o", str(out),
                  "-s", "30", "-d", "1024"])
        return out

    def test_run_search_cli_routes_small(self, tmp_path, monkeypatch):
        db = self._sketch(tmp_path)
        # baseline TSV on the CPU-default (non-MXU) path
        base_tsv = tmp_path / "base.tsv"
        cli_main(["search", "-r", str(db), "-q", str(db),
                  "-o", str(base_tsv), "-a", "0.0", "--top_k", "2"])

        # pretend this is a TPU-defaulting backend and record what the
        # resolver decided for the e2e search path
        monkeypatch.setattr(search_mod.jax, "default_backend", lambda: "tpu")
        decided = []
        orig = search_mod._resolve_mxu.__wrapped__ if hasattr(
            search_mod._resolve_mxu, "__wrapped__") else search_mod._resolve_mxu

        def spy(mode, *arrays):
            out = orig(mode, *arrays)
            decided.append(out)
            return out

        monkeypatch.setattr(search_mod, "_resolve_mxu", spy)
        small_tsv = tmp_path / "small.tsv"
        cli_main(["search", "-r", str(db), "-q", str(db),
                  "-o", str(small_tsv), "-a", "0.0", "--top_k", "2"])
        assert decided == ["small"], (
            "production-scale search must route to the 3-matmul split"
        )
        # exact mod-2^32 split + host ANI recompute: bytes must not move
        assert small_tsv.read_bytes() == base_tsv.read_bytes()
