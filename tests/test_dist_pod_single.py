"""Pod-dist merge path driven in a single process (nproc=1): the part
write/wait/merge/stream-TSV machinery must produce byte-identical output
to the plain dist path, including top_k (which r2 silently dropped)."""

import numpy as np

from hypergen_tpu.cli import _run_dist_pod, run_dist
from hypergen_tpu.io.sketch_db import dump_sharded_db, ShardedDB
from hypergen_tpu.params import DistParams


def _mk_db(tmp_path, name, n=6, d=256, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(-30, 30, size=(1, d)).astype(np.int16)
    hvs = base + rng.integers(-3, 4, size=(n, d)).astype(np.int16)
    norms = (
        np.sum(hvs.astype(np.int64) ** 2, axis=1).astype(np.int64)
        & 0xFFFFFFFF
    ).astype(np.uint32).view(np.int32)
    db = ShardedDB(
        ksize=21, scaled=30, canonical=True, seed=123, hv_d=d,
        names=[f"g{i}.fna" for i in range(n)], hvs=hvs,
        norms=norms.astype(np.int32),
    )
    out = tmp_path / name
    dump_sharded_db(db, out, n_shards=2)
    return out


class _Args:
    def __init__(self, r, q, out, ani_th, ksize=21, hv_d=256):
        self.path_r, self.path_q, self.out = r, q, out
        self.ani_th, self.ksize, self.hv_d = ani_th, ksize, hv_d


def test_pod_merge_matches_plain_dist(tmp_path):
    db = _mk_db(tmp_path, "db.hgdb")
    plain_out = tmp_path / "plain.tsv"
    run_dist(_Args(db, db, plain_out, ani_th=0.0))
    pod_out = tmp_path / "pod.tsv"
    dp = DistParams(path_ref_sketch=db, path_query_sketch=db,
                    out_file=pod_out, ani_threshold=0.0)
    _run_dist_pod(dp, if_sym=True, t0=0.0)
    assert pod_out.read_text() == plain_out.read_text()
    assert plain_out.read_text().count("\n") == 15  # 6*5/2 pairs


def test_pod_merge_top_k(tmp_path):
    db = _mk_db(tmp_path, "db.hgdb")
    pod_out = tmp_path / "pod_topk.tsv"
    dp = DistParams(path_ref_sketch=db, path_query_sketch=db,
                    out_file=pod_out, ani_threshold=0.0, top_k=4)
    _run_dist_pod(dp, if_sym=True, t0=0.0)
    full = tmp_path / "full.tsv"
    dp2 = DistParams(path_ref_sketch=db, path_query_sketch=db,
                     out_file=full, ani_threshold=0.0)
    _run_dist_pod(dp2, if_sym=True, t0=0.0)
    # top_k caps the (sorted-desc) row list at exactly k rows
    assert pod_out.read_text().splitlines() == \
        full.read_text().splitlines()[:4]
