"""ANI comparator: tiled device dot-products + reference-exact TSV reporting.

Replaces the reference dist orchestrator (reference:src/dist.rs:11-63) and
report writer (reference:src/utils.rs:260-308). The all-pairs loop becomes
tiled [tile_m x tile_n] MXU matmuls; the final dot -> Jaccard -> ANI map runs
on host in vectorized float32 (bit-identical to the reference's scalar f32
chain) so the 3-decimal TSV rounds identically.
"""

from __future__ import annotations

import logging
from typing import Iterator, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.io.sketch_db import ShardedDB
from hypergen_tpu.ops.ani import dot_i16_exact

log = logging.getLogger("hypergen")


def ani_f32_host(dot: np.ndarray, norm2_r: np.ndarray, norm2_q: np.ndarray, ksize: int) -> np.ndarray:
    """Vectorized host float32 ANI%% map (reference:src/dist.rs:150-161).

    dot: int32 [m, n]; norm2_r: int32 [m]; norm2_q: int32 [n].
    Every op is an elementwise IEEE f32 op, matching the reference's scalar
    f32 evaluation order: J = dot/(nr+nq-dot); ANI = 1 + ln(2/(1/J+1))/k;
    NaN -> 0; clamp to [0,1]; *100.
    """
    dot_f = dot.astype(np.float32)
    # the reference computes the denominator in wrapping i32; numpy int32
    # arithmetic wraps identically (modular), no widening needed
    with np.errstate(over="ignore"):
        denom_i = (
            norm2_r[:, None].astype(np.int32)
            + norm2_q[None, :].astype(np.int32)
            - dot.astype(np.int32)
        )
    denom = denom_i.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        jaccard = dot_f / denom
        inner = np.float32(2.0) / (np.float32(1.0) / jaccard + np.float32(1.0))
        ani = np.float32(1.0) + np.log(inner) / np.float32(ksize)
    ani = np.where(np.isnan(ani), np.float32(0.0), ani)
    ani = np.clip(ani, np.float32(0.0), np.float32(1.0))
    return (ani * np.float32(100.0)).astype(np.float32)


class Comparator:
    """Tiled exact int32 dot matrices between sketch DBs."""

    def __init__(self, ksize: int, tile_m: int = 2048, tile_n: int = 2048,
                 use_mxu: bool | None = None):
        self.ksize = ksize
        self.tile_m = tile_m
        self.tile_n = tile_n
        if use_mxu is None:
            use_mxu = jax.default_backend() == "tpu"
        self.use_mxu = use_mxu
        self._dot = jax.jit(
            lambda r, q: dot_i16_exact(r, q, use_mxu=self.use_mxu)
        )

    def preload_rows(self, hv: np.ndarray) -> List:
        """Upload row tiles once; reuse across many dot_tiles calls.

        Keeping the reference DB resident on device is the search-engine
        pattern: per query batch only the queries cross H2D.
        """
        tm = self.tile_m
        return [
            jnp.asarray(_pad_rows(hv[mi : mi + tm], tm))
            for mi in range(0, hv.shape[0], tm)
        ]

    def dot_tiles(
        self,
        r_hv: np.ndarray,
        q_hv: np.ndarray,
        r_blocks: List | None = None,
    ) -> Iterator[Tuple[int, int, np.ndarray]]:
        """Yield (row_offset, col_offset, int32 dot tile).

        r_blocks: optional device-resident row tiles from preload_rows
        (skips re-uploading the reference side every call).
        """
        M, N = r_hv.shape[0], q_hv.shape[0]
        tm, tn = self.tile_m, self.tile_n
        for bi, mi in enumerate(range(0, M, tm)):
            if r_blocks is not None:
                r_dev = r_blocks[bi]
            else:
                r_dev = jnp.asarray(_pad_rows(r_hv[mi : mi + tm], tm))
            for nj in range(0, N, tn):
                q_blk = _pad_rows(q_hv[nj : nj + tn], tn)
                tile = np.asarray(self._dot(r_dev, jnp.asarray(q_blk)))
                yield mi, nj, tile[: min(tm, M - mi), : min(tn, N - nj)]

    def ani_pairs(
        self,
        ref_db: ShardedDB,
        query_db: ShardedDB,
        symmetric: bool,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """All pair ANIs in reference enumeration order.

        Returns (ref_idx, query_idx, ani) flat arrays ordered exactly like
        the reference's pair list: i over refs, j over queries, symmetric
        case j > i (reference:src/dist.rs:252-265).
        """
        M, N = ref_db.hvs.shape[0], query_db.hvs.shape[0]
        ani_full = np.zeros((M, N), dtype=np.float32)
        for mi, nj, tile in self.dot_tiles(ref_db.hvs, query_db.hvs):
            ani_full[mi : mi + tile.shape[0], nj : nj + tile.shape[1]] = ani_f32_host(
                tile,
                ref_db.norms[mi : mi + tile.shape[0]],
                query_db.norms[nj : nj + tile.shape[1]],
                self.ksize,
            )
        if symmetric:
            ii, jj = np.triu_indices(M, k=1)
            if N != M:
                raise ValueError("symmetric dist requires square pair matrix")
        else:
            ii, jj = np.meshgrid(np.arange(M), np.arange(N), indexing="ij")
            ii, jj = ii.ravel(), jj.ravel()
        return ii.astype(np.int64), jj.astype(np.int64), ani_full[ii, jj]


def format_ani_report(
    ref_names: List[str],
    query_names: List[str],
    ref_idx: np.ndarray,
    query_idx: np.ndarray,
    ani: np.ndarray,
    threshold: float,
    top_k: int = 0,
) -> Tuple[str, int]:
    """Reference-exact TSV: sort desc (stable ties reversed), filter, format.

    Mirrors reference:src/utils.rs:260-290: indices stable-sorted ascending
    by ANI then reversed, rows emitted while ani >= threshold, '%.3f'.
    Returns (tsv_string, n_reported). top_k > 0 additionally caps the rows
    (search mode).
    """
    order = np.argsort(ani, kind="stable")[::-1]
    lines = []
    thr = np.float32(threshold)
    for idx in order:
        if not ani[idx] >= thr:
            break
        lines.append(
            f"{ref_names[int(ref_idx[idx])]}\t"
            f"{query_names[int(query_idx[idx])]}\t"
            f"{ani[idx]:.3f}\n"
        )
        if top_k and len(lines) >= top_k:
            break
    return "".join(lines), len(lines)


def report_sparsity(n_reported: int, n_total: int, threshold: float) -> None:
    """Warn when <5%% of pairs pass (reference:src/utils.rs:292-307)."""
    perc = n_reported / n_total * 100.0 if n_total else 0.0
    if perc < 5.0:
        log.warning(
            "Output ANIs with threshold %.1f are too divergent: %d of %d "
            "(%.2f%%) ANIs are reported",
            threshold, n_reported, n_total, perc,
        )
    else:
        log.info(
            "Output %d of %d ANIs above threshold %.1f",
            n_reported, n_total, threshold,
        )


def _pad_rows(a: np.ndarray, rows: int) -> np.ndarray:
    if a.shape[0] == rows:
        return a
    out = np.zeros((rows,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out
