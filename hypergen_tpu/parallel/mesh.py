"""Device mesh construction and multi-host initialization."""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

log = logging.getLogger("hypergen")

AXIS_DB = "db"
AXIS_Q = "q"


def make_mesh(
    n_db: Optional[int] = None,
    n_q: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A (db, q) mesh over the available devices.

    Defaults: all devices on the ``db`` axis (DB sharding scales memory,
    which is the binding constraint for GTDB-scale databases), ``q`` = 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_db is None and n_q is None:
        n_db, n_q = n, 1
    elif n_db is None:
        n_db = n // n_q
    elif n_q is None:
        n_q = n // n_db
    if n_db * n_q != n:
        raise ValueError(f"mesh {n_db}x{n_q} != {n} devices")
    arr = np.asarray(devices).reshape(n_db, n_q)
    return Mesh(arr, (AXIS_DB, AXIS_Q))


def init_distributed(coordinator: str = "", num_processes: int = 0,
                     process_id: int = 0) -> None:
    """Multi-host init (no-op when unconfigured). On TPU pods, environment
    auto-detection usually suffices and explicit args may be empty."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator or None,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            process_id, num_processes,
            jax.local_device_count(), jax.device_count(),
        )


def shared_run_token() -> str:
    """A random token agreed by all processes (broadcast from process 0).

    Used to tag per-host part files so a merge never picks up stale parts
    left by a previous crashed run in the same output directory.
    """
    import os

    if jax.process_count() == 1:
        return os.urandom(8).hex()
    from jax.experimental import multihost_utils

    local = np.frombuffer(os.urandom(8), dtype=np.uint64).copy()
    tok = multihost_utils.broadcast_one_to_all(local)
    return int(tok[0]).to_bytes(8, "little").hex()
