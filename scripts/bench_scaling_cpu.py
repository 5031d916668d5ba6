"""CPU-mesh scaling-efficiency harness for the pod (multi-process) paths.

BASELINE targets >=80% scaling efficiency on a 2-host v5p slice; no
multi-host TPU hardware exists here, but the serialization behavior of the
pod code paths is measurable on the virtual CPU mesh: run the same total
workload as 1 process (8 local devices) and as 2 jax.distributed processes
(4 devices each), and compare total throughput. On this box (ONE physical
core) the two processes timeshare the core, so ideal scaling is a ratio of
~1.0 — the measurement detects hidden serialization / coordination
overhead (ratio well below 1), which is the only part of the >=80% target
testable without hardware (r3 verdict item 4). Workloads:

  sketch: N files split files[p::nproc] per process (the pod sketch
          decomposition, cli.py pod mode), Sketcher end-to-end.
  search: sharded_topk_search over a [M, D] DB on the global 8-device
          mesh, cross-process all_gather merge included.

Prints one JSON line: {"sketch_eff": ..., "search_eff": ...} where
eff = wall_1proc / wall_2proc for the identical total workload.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import textwrap
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
N_FILES = 16
GENOME_BP = 500_000
# search sized so per-iteration MXU-path compute dominates the per-call
# coordination (device_put staging + all_gather barrier): sub-second
# iterations made the ratio a context-switch benchmark, not a
# serialization probe
SEARCH_M, SEARCH_N, SEARCH_D, SEARCH_ITERS = 16384, 512, 1024, 4

_WORKER = textwrap.dedent(
    """
    import json, os, sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); coord = sys.argv[3]
    mode = sys.argv[4]; data_dir = sys.argv[5]

    from hypergen_tpu.parallel.mesh import init_distributed, make_mesh
    from hypergen_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    init_distributed(coord, nproc, pid)
    assert jax.device_count() == 8, jax.device_count()

    if mode == "sketch":
        from hypergen_tpu.models.sketcher import Sketcher
        from hypergen_tpu.params import SketchParams

        paths = sorted(os.listdir(data_dir))
        mine = [os.path.join(data_dir, p) for p in paths[pid::nproc]]
        sk = Sketcher(SketchParams(), batch=2)
        sk.sketch_files(mine[:1], progress=False)  # warm compile
        t0 = time.monotonic()
        out = sk.sketch_files(mine, progress=False)
        wall = time.monotonic() - t0
        assert len(out) == len(mine)
    else:
        # production search regime: DB staged to its shards ONCE, then the
        # collective shard_map program (local MXU tile + per-query top-k +
        # cross-process all_gather merge) loops over query batches. Staging
        # is timed separately — re-putting the DB per call is not a search
        # cost, and across processes it is dominated by global-array
        # assembly barriers.
        from jax.sharding import NamedSharding, PartitionSpec as P
        from hypergen_tpu.parallel.mesh import AXIS_DB, AXIS_Q
        from hypergen_tpu.parallel.search import _pad_rows, _search_fn

        M, N, D, iters = %d, %d, %d, %d
        rng = np.random.default_rng(0)  # same data every process
        db = rng.integers(-40, 40, size=(M, D)).astype(np.int16)
        dbn = np.sum(db.astype(np.int64) ** 2, axis=1).astype(np.int32)
        q = db[:N].copy(); qn = dbn[:N].copy()
        mesh = make_mesh(8, 1)
        sh = lambda spec: NamedSharding(mesh, spec)
        t0 = time.monotonic()
        args = (
            jax.device_put(db, sh(P(AXIS_DB, None))),
            jax.device_put(dbn, sh(P(AXIS_DB))),
            jax.device_put(q, sh(P(AXIS_Q, None))),
            jax.device_put(qn, sh(P(AXIS_Q))),
        )
        fn = _search_fn(mesh, 21, 3, False)
        ani, idx, _ = jax.device_get(fn(*args))  # warm (compile included)
        stage_wall = time.monotonic() - t0
        t0 = time.monotonic()
        for _ in range(iters):
            ani, idx, _ = jax.device_get(fn(*args))
        wall = time.monotonic() - t0
        assert (idx[:, 0] == np.arange(N)).all()
        print("STAGE" + str(pid) + " " + json.dumps({"wall": stage_wall}),
              flush=True)
    print("WALL" + str(pid) + " " + json.dumps({"wall": wall}), flush=True)
    """
) % (SEARCH_M, SEARCH_N, SEARCH_D, SEARCH_ITERS)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc: int, mode: str, data_dir: str, script: Path) -> float:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}"
    )
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc),
             f"localhost:{port}", mode, data_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(nproc)
    ]
    walls = []
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(f"worker {pid} failed:\n{out[-2000:]}")
            for line in out.splitlines():
                if line.startswith(f"WALL{pid} "):
                    walls.append(json.loads(line.split(" ", 1)[1])["wall"])
    finally:
        # a failed/timed-out worker leaves its sibling blocked forever in
        # the distributed barrier: kill OUR exact child PIDs so no orphan
        # pegs the single core under later measurements
        for p in procs:
            if p.poll() is None:
                p.kill()
    assert len(walls) == nproc
    # total job wall = the slowest process (pod completion time)
    return max(walls)


def main():
    _BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = {}
    with tempfile.TemporaryDirectory(prefix="hgscal_") as td:
        d = Path(td)
        gdir = d / "genomes"
        gdir.mkdir()
        for i in range(N_FILES):
            r = np.random.default_rng(8800 + i)
            (gdir / f"g{i:02d}.fna").write_bytes(
                b">g\n" + r.choice(_BASES, size=GENOME_BP).tobytes() + b"\n"
            )
        script = d / "worker.py"
        script.write_text(_WORKER)
        # min over repeats: single-core walls of a few seconds are at
        # the mercy of whatever else the box is doing; the minimum is
        # the uncontended estimate for both configs. HG_SCALING_REPEATS=1
        # (bench.py sets it) halves wall time for the in-bench run.
        reps = max(int(os.environ.get("HG_SCALING_REPEATS", "2")), 1)
        for mode in ("sketch", "search"):
            t1 = min(_run(1, mode, str(gdir), script) for _ in range(reps))
            t2 = min(_run(2, mode, str(gdir), script) for _ in range(reps))
            out[f"{mode}_wall_1proc"] = round(t1, 3)
            out[f"{mode}_wall_2proc"] = round(t2, 3)
            # identical total workload => efficiency is the wall ratio;
            # ~1.0 on this 1-core box means no hidden serialization
            out[f"{mode}_eff"] = round(t1 / t2, 3) if t2 > 0 else None
    out["note"] = (
        "1 physical core: both processes timeshare it, so ideal "
        "(serialization-free) efficiency is ~1.0, not 2x; >1.0 means two "
        "processes interleave each other's host-side pipeline bubbles "
        "(and the 1-proc config pays 8 virtual devices vs 4), which is "
        "fine — the failure signal is a ratio well BELOW 1"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
