"""The one-command reference-parity harness (scripts/check_reference_parity).

Runs the stub flow end-to-end (our CLI playing the reference) and proves
the wyrng seeding discrimination tells "raw" and "rc06" fixtures apart —
so the day a real reference artifact exists, one command settles the r2
verdict's remaining parity assumption (reference:src/hd.rs:100).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

import check_reference_parity as crp  # noqa: E402

from hypergen_tpu.io.sketch_db import FileSketch, dump_sketch  # noqa: E402
from hypergen_tpu.oracle.pipeline import extract_kmer_hashes  # noqa: E402


@pytest.fixture()
def genome_dir(tmp_path):
    d = tmp_path / "genomes"
    d.mkdir()
    rng = np.random.default_rng(4)
    for i in range(2):
        seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=5000))
        (d / f"g{i}.fna").write_text(f">g{i}\n{seq}\n")
    return d


def _fixture_sketch(genome_dir, out_path, seeding):
    """Build a .sketch whose HVs were encoded under the given wyrng
    seeding hypothesis (what a reference build with that crate semantics
    would have produced)."""
    ksize, scaled, seed, hv_d = 21, 30, 123, 512
    sketches = []
    for p in sorted(genome_dir.iterdir()):
        records = crp.read_records(p)
        hv = crp.oracle_hv(records, ksize, scaled, seed, True, hv_d, seeding)
        norm2 = int(np.sum(hv.astype(np.int64) ** 2) & 0xFFFFFFFF)
        if norm2 >= 1 << 31:
            norm2 -= 1 << 32
        sketches.append(
            FileSketch.from_dense(hv, norm2, str(p), ksize, scaled, True, seed)
        )
    dump_sketch(sketches, out_path)


def test_rc06_expansion_matches_golden():
    import json

    golden = json.loads(
        (Path(__file__).parent / "golden_wyrng.json").read_text()
    )
    from hypergen_tpu.oracle.hashes import wyrng_words

    for seed_str, words in golden["rc06"].items():
        assert wyrng_words(crp.rc06_seed_from_u64(int(seed_str)), 8) == words


@pytest.mark.parametrize("seeding", ["raw", "rc06"])
def test_discriminates_seeding(tmp_path, genome_dir, seeding):
    fixture = tmp_path / "ref.sketch"
    _fixture_sketch(genome_dir, fixture, seeding)
    assert crp.discriminate_seeding(fixture, genome_dir) == seeding


def test_stub_full_parity(tmp_path, genome_dir, monkeypatch, capsys):
    monkeypatch.setattr(
        sys, "argv",
        ["check_reference_parity.py", "--genomes", str(genome_dir),
         "--stub", "--scaled", "30", "--hv-d", "512", "--ani-th", "50",
         "--workdir", str(tmp_path / "work")],
    )
    assert crp.main() == 0
    out = capsys.readouterr().out
    assert "wyrng seeding semantics: raw" in out
    assert "RESULT: FULL PARITY" in out
