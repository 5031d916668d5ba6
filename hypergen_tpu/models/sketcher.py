"""The flagship model: genome base codes -> sketch hypervector, fully on device.

Pipeline (one jit-compiled step per chunk-count bucket):

  chunks [nc, C+k-1] u8
    -> canonical k-mer hash + FracMinHash threshold  (ops.kmers, VPU)
    -> per-chunk exact compaction                    (ops.compact)
    -> global sort + unique (HashSet-equivalent dedup on device;
       sentinel U64_MAX marks empty slots — it can never be a survivor
       because the keep test is strict `h < threshold`)
    -> compaction to the encode buffer
    -> wyrng-expand + bundle HV encode               (ops.encode)
    -> i16 wrap + L2 norm^2

This replaces the reference's per-file rayon loop + HashSet
(reference:src/sketch.rs:35-56) and its GPU slot-array kernel
(reference:src/sketch_cuda.rs:120-166) with a static-shape, fusion-friendly
XLA program. Capacity overflows are *detected* (true counts returned) and
retried with doubled capacity — never silently dropped (unlike
reference:src/cuda_kernel.cu:316).

Host-side, genomes are bucketed by chunk count (powers of two) so the number
of distinct compiled programs stays logarithmic in genome length.
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hypergen_tpu.io.bitpack import compress_hv
from hypergen_tpu.io.fastx import INVALID, read_genome_codes
from hypergen_tpu.io.sketch_db import FileSketch
from hypergen_tpu.ops import u64 as u
from hypergen_tpu.ops.compact import compact_masked
from hypergen_tpu.ops.encode import encode_hv, hv_norm2_i32, hv_to_i16
from hypergen_tpu.ops.kmers import hash_kmer_positions
from hypergen_tpu.ops.u64 import U64
from hypergen_tpu.params import U64_MASK, SketchParams

log = logging.getLogger("hypergen")


def _dedup_sorted(h: U64) -> Tuple[U64, jnp.ndarray]:
    """Sort a flat U64 vector and mask first occurrences (excluding sentinel)."""
    hi_s, lo_s = jax.lax.sort((h.hi, h.lo), num_keys=2)
    sentinel = np.uint32(0xFFFFFFFF)
    prev_hi = jnp.concatenate([jnp.full((1,), sentinel), hi_s[:-1]])
    prev_lo = jnp.concatenate([jnp.full((1,), sentinel), lo_s[:-1]])
    is_sentinel = (hi_s == sentinel) & (lo_s == sentinel)
    differs = (hi_s != prev_hi) | (lo_s != prev_lo)
    # position 0 is unique unless it's the sentinel; prev filled with sentinel
    # makes `differs` true there automatically (a real hash != sentinel).
    unique = differs & ~is_sentinel
    return U64(hi_s, lo_s), unique


def make_sketch_step(
    ksize: int,
    seed: int,
    threshold: int,
    hv_d: int,
    chunk_cap: int,
    enc_cap: int,
    canonical: bool = True,
    method: str = "t1ha2",
    encode_block: int = 256,
    jit_compile: bool = True,
):
    """Build the chunk-batch -> sketch step for one bucket shape."""

    def step(chunks: jnp.ndarray):
        # chunks: [nc, C + k - 1] uint8
        h, keep = hash_kmer_positions(
            chunks, ksize, seed=seed, threshold=threshold,
            canonical=canonical, method=method,
        )
        comp, counts = compact_masked(h, keep, chunk_cap)  # [nc, cap]
        # empty slots -> sentinel U64_MAX so they sort to the end
        nc = comp.lo.shape[0]
        slot = jax.lax.broadcasted_iota(jnp.int32, (nc, chunk_cap), 1)
        filled = slot < counts[:, None]
        sent = np.uint32(0xFFFFFFFF)
        flat = U64(
            jnp.where(filled, comp.hi, sent).reshape(-1),
            jnp.where(filled, comp.lo, sent).reshape(-1),
        )
        sorted_h, unique = _dedup_sorted(flat)
        enc, n_hashes = compact_masked(sorted_h, unique, enc_cap)  # [enc_cap]
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (1, enc_cap), 1)
            < n_hashes[None, None]
        )
        hv32 = encode_hv(
            U64(enc.hi[None, :], enc.lo[None, :]), valid, hv_d, block=encode_block
        )
        hv16 = hv_to_i16(hv32)[0]
        norm2 = hv_norm2_i32(hv16)
        return {
            "hv": hv16,
            "norm2": norm2,
            "n_hashes": n_hashes,
            "chunk_counts": counts,
        }

    return jax.jit(step) if jit_compile else step


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


class Sketcher:
    """Batched genome sketcher with bucketed jit compilation and exact retry.

    Equivalent of the reference sketch orchestrator
    (reference:src/sketch.rs:12-69) with the per-file hot loops on device.
    """

    def __init__(
        self,
        params: SketchParams,
        chunk_positions: int = 1 << 17,
        encode_block: int = 512,
    ):
        params.validate()
        self.params = params
        self.C = int(chunk_positions)
        self.encode_block = int(encode_block)
        # expected survivors per chunk = C/scaled; cap with generous slack
        self.chunk_cap = int(max(64, 6 * self.C // max(params.scaled, 1)))
        self._steps: Dict[Tuple, object] = {}
        self._enc_overflow_factor = 1

    # -- device step management ------------------------------------------

    def _enc_cap(self, n_chunks: int) -> int:
        expected = n_chunks * self.C // max(self.params.scaled, 1)
        cap = 3 * expected + 512
        cap *= self._enc_overflow_factor
        return int(-(-cap // 256) * 256)

    def _get_step(self, n_chunks: int, chunk_cap: Optional[int] = None):
        p = self.params
        cap = chunk_cap or self.chunk_cap
        key = (n_chunks, cap, self._enc_cap(n_chunks))
        if key not in self._steps:
            self._steps[key] = make_sketch_step(
                ksize=p.ksize,
                seed=p.seed,
                threshold=p.threshold,
                hv_d=p.hv_d,
                chunk_cap=cap,
                enc_cap=key[2],
                canonical=p.canonical,
                method=p.sketch_method,
                encode_block=self.encode_block,
            )
        return self._steps[key], cap, key[2]

    def _chunk_codes(self, codes: np.ndarray, n_chunks: int) -> np.ndarray:
        k = self.params.ksize
        halo = k - 1
        width = self.C + halo
        out = np.full((n_chunks, width), INVALID, dtype=np.uint8)
        L = codes.shape[0]
        for c in range(n_chunks):
            start = c * self.C
            if start >= L:
                break
            end = min(start + width, L)
            out[c, : end - start] = codes[start:end]
        return out

    # -- public API --------------------------------------------------------

    def sketch_codes(self, codes: np.ndarray) -> Dict[str, object]:
        """Sketch one genome given flat base codes. Returns hv/norm2/n_hashes."""
        k = self.params.ksize
        L = int(codes.shape[0])
        n_pos = max(L - k + 1, 1)
        n_chunks = _next_pow2(-(-n_pos // self.C))
        chunks = self._chunk_codes(codes, n_chunks)

        chunk_cap = self.chunk_cap
        for attempt in range(6):
            step, cap, enc_cap = self._get_step(n_chunks, chunk_cap)
            out = jax.device_get(step(jnp.asarray(chunks)))
            max_count = int(out["chunk_counts"].max()) if out["chunk_counts"].size else 0
            n_hashes = int(out["n_hashes"])
            if max_count <= cap and n_hashes <= enc_cap:
                return {
                    "hv": np.asarray(out["hv"]),
                    "norm2": int(out["norm2"]),
                    "n_hashes": n_hashes,
                }
            # capacity overflow: retry exactly, never drop silently
            if max_count > cap:
                chunk_cap = cap * 2
                log.warning("chunk cap overflow (%d > %d); retrying", max_count, cap)
            if n_hashes > enc_cap:
                self._enc_overflow_factor *= 2
                log.warning("encode cap overflow (%d > %d); retrying", n_hashes, enc_cap)
        raise RuntimeError("sketcher capacity retry limit exceeded")

    def sketch_file(self, path) -> FileSketch:
        codes = read_genome_codes(path)
        res = self.sketch_codes(codes)
        p = self.params
        if p.if_compressed:
            return FileSketch.from_dense(
                res["hv"], res["norm2"], str(path), p.ksize, p.scaled,
                p.canonical, p.seed,
            )
        return FileSketch(
            ksize=p.ksize, scaled=p.scaled, canonical=p.canonical, seed=p.seed,
            hv_d=p.hv_d, hv_quant_bits=16, hv_norm_2=res["norm2"],
            file_str=str(path), hv=res["hv"],
        )

    def sketch_files(self, paths: Sequence, progress: bool = True) -> List[FileSketch]:
        from hypergen_tpu.utils.progress import ProgressBar

        pb = ProgressBar(len(paths), enabled=progress)
        out = []
        for path in paths:
            out.append(self.sketch_file(path))
            pb.inc()
        pb.finish()
        return out
