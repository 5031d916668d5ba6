"""True multi-process distributed test: 2 CPU processes x 4 devices.

Exercises the multi-host code path (jax.distributed.initialize, global mesh
spanning processes, cross-process collectives in the sharded search) that
the single-process 8-device tests cannot: per-process addressable shards,
cross-host all_gather over the db axis. This is the CPU stand-in for the
BASELINE 2-host v5p config.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    from hypergen_tpu.parallel.mesh import init_distributed, make_mesh
    init_distributed(coord, nproc, pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from hypergen_tpu.parallel.search import sharded_topk_search

    rng = np.random.default_rng(0)  # same data on every process
    M, N, D, K = 64, 8, 256, 3
    db = rng.integers(-40, 40, size=(M, D)).astype(np.int16)
    dbn = np.sum(db.astype(np.int64) ** 2, axis=1).astype(np.int32)
    q = db[:N].copy()
    qn = dbn[:N].copy()
    mesh = make_mesh(8, 1)
    ani, idx = sharded_topk_search(mesh, db, dbn, q, qn, ksize=21, k_top=K)
    assert ani.shape == (N, K) and idx.shape == (N, K)
    assert np.allclose(ani[:, 0], 100.0, atol=1e-2), ani[:, 0]
    assert (idx[:, 0] == np.arange(N)).all(), idx[:, 0]
    print(f"proc{pid} ok", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_sharded_search(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        str(Path(__file__).resolve().parent.parent)
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", f"localhost:{port}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} ok" in out


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
