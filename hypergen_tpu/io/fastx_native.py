"""ctypes binding to the native FASTA parser (native/fastx.cpp).

Auto-builds native/libfastx.so with `make` on first use when a toolchain is
available; io.fastx falls back to the numpy parser if anything here fails.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger("hypergen")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libfastx.so"

_lib = None
_load_lock = threading.Lock()


def _load():
    # serialized: the sketch I/O pool (up to 16 threads) hits this on first
    # use, and unlocked it would spawn concurrent `make` builds + CDLL loads
    # of a half-written .so (the Makefile also renames atomically for
    # cross-PROCESS safety; this lock covers the in-process pool)
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # no toolchain / build failure -> fallback
            raise ImportError(f"native fastx build failed: {e}")
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.hg_read_genome_codes.restype = ctypes.c_longlong
    lib.hg_read_genome_codes.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.hg_free.restype = None
    lib.hg_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    if hasattr(lib, "hg_read_genome_packed"):
        lib.hg_read_genome_packed.restype = ctypes.c_longlong
        lib.hg_read_genome_packed.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
    _lib = lib
    return lib


def read_genome_codes(path) -> np.ndarray:
    """Parse a FASTA file to the flat code array (0..3 bases, 4 invalid)."""
    lib = _load()
    out = ctypes.POINTER(ctypes.c_uint8)()
    errbuf = ctypes.create_string_buffer(256)
    n = lib.hg_read_genome_codes(
        str(path).encode(), ctypes.byref(out), errbuf, 256
    )
    if n < 0:
        raise ValueError(f"{path}: {errbuf.value.decode()}")
    try:
        codes = np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.hg_free(out)
    return codes


def read_genome_packed(path):
    """Fused native parse+pack: (packed2 u8 [ceil(n/4)], runs i32 [R, 2], n).

    One streaming C pass over the FASTA bytes — no intermediate 4x-size
    code array (native/fastx.cpp hg_read_genome_packed). Validity of
    positions comes solely from the run list; packed padding bits are
    arbitrary (code & 3).
    """
    lib = _load()
    if not hasattr(lib, "hg_read_genome_packed"):
        raise ImportError("libfastx.so lacks hg_read_genome_packed (rebuild)")
    packed_p = ctypes.POINTER(ctypes.c_uint8)()
    runs_p = ctypes.POINTER(ctypes.c_int32)()
    n_runs = ctypes.c_longlong(0)
    errbuf = ctypes.create_string_buffer(256)
    n = lib.hg_read_genome_packed(
        str(path).encode(), ctypes.byref(packed_p), ctypes.byref(runs_p),
        ctypes.byref(n_runs), errbuf, 256,
    )
    if n < 0:
        raise ValueError(f"{path}: {errbuf.value.decode()}")
    try:
        nb = -(-n // 4)
        packed2 = (
            np.ctypeslib.as_array(packed_p, shape=(nb,)).copy()
            if nb else np.zeros(0, np.uint8)
        )
        runs = (
            np.ctypeslib.as_array(runs_p, shape=(n_runs.value, 2)).copy()
            if n_runs.value else np.zeros((0, 2), np.int32)
        )
    finally:
        if packed_p:
            lib.hg_free(packed_p)
        if runs_p:
            lib.hg_free(ctypes.cast(runs_p, ctypes.POINTER(ctypes.c_uint8)))
    return packed2, runs, int(n)


_pack_fn = None
_pack_lock = threading.Lock()


def _load_pack(lib):
    # configure argtypes exactly once, under a lock: reassigning them while
    # another thread is mid-call races inside ctypes (the pack pool calls
    # this from up to 8 threads on first use)
    global _pack_fn
    if _pack_fn is not None:
        return _pack_fn
    with _pack_lock:
        if _pack_fn is not None:
            return _pack_fn
        if not hasattr(lib, "hg_pack_codes"):
            raise ImportError(
                "libfastx.so lacks hg_pack_codes (rebuild native/)"
            )
        fn = lib.hg_pack_codes
        fn.restype = ctypes.c_longlong
        fn.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
            ctypes.c_longlong,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_longlong,
        ]
        _pack_fn = fn
    return _pack_fn


def pack_codes_runs(codes: np.ndarray, padded_len: int, run_cap: int):
    """Native (packed2, runs, n_runs) — same contract as
    models.sketcher.pack_codes_runs; one C pass, releases the GIL, no
    intermediate 4x-size temporaries."""
    lib = _load()
    fn = _load_pack(lib)
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    packed2 = np.empty(padded_len // 4, dtype=np.uint8)
    runs = np.zeros((run_cap, 2), dtype=np.int32)
    n_runs = fn(codes, codes.shape[0], padded_len, packed2,
                runs.reshape(-1), run_cap)
    return packed2, runs, int(n_runs)
