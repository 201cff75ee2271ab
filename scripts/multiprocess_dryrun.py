"""Multi-process (multi-host) dryrun on CPU: N processes x 1 device.

Validates the DCN-ready path of ``parallel/distributed.py``: every
process joins the JAX coordination service, the grid mesh spans all
processes' devices, the fused verification sweep runs as ONE globally
sharded jit program (XLA inserts cross-process collectives), and the
certified results agree bit-for-bit with a single-process run.

Launcher mode (default): spawns ``--nprocs`` worker subprocesses of this
same file and checks their agreement. Worker mode (``--worker``): joins
the coordination service and prints its JSON result.

Usage: ``python scripts/multiprocess_dryrun.py [--nprocs 4]``
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_instance():
    """Small deterministic verification instance (identical everywhere)."""
    import numpy as np

    import safe_learning_tpu as sl

    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 32)  # 1024 = 4*256
    a = np.array([[0.6, 0.1], [0.0, 0.5]])
    dyn = sl.LinearSystem([a, np.zeros((2, 1))])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lf = float(np.linalg.norm(a, 2))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.05))[0]
    # tau chosen so the failing threshold band reaches past the exempt
    # region: the certificate must genuinely discriminate (a
    # nontrivial level cut exercises the cross-process reduction).
    return sl.Lyapunov(grid, v, dyn, lf, 2.0, 0.05, policy,
                       initial_set=initial)


def worker(coordinator, nprocs, pid):
    """Join the service, run the sharded sweep, print a JSON line."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=1")
    import jax
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

    from safe_learning_tpu.parallel.distributed import (
        initialize_distributed, is_coordinator, make_global_mesh,
        sharded_certified_level)

    idx, count = initialize_distributed(coordinator, nprocs, pid)
    assert count == nprocs, (idx, count)
    assert len(jax.devices()) == nprocs  # global device list

    lyap = build_instance()
    mesh = make_global_mesh()
    safe, c_max = sharded_certified_level(lyap, mesh)

    print(json.dumps({
        "pid": idx,
        "coordinator": is_coordinator(),
        "n_devices": len(jax.devices()),
        "safe_sum": int(safe.sum()),
        "safe_hash": hashlib.sha1(safe.tobytes()).hexdigest(),
        "c_max": float(c_max),
    }), flush=True)


def single_process_reference():
    """The same instance verified in ONE process (ground truth)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax._src.xla_bridge as xb

    xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    lyap = build_instance()
    lyap.update_safe_set()
    safe = np.asarray(lyap.safe_set)
    return (int(safe.sum()), hashlib.sha1(safe.tobytes()).hexdigest(),
            float(lyap.c_max))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nprocs", type=int, default=4)
    parser.add_argument("--worker", action="store_true")
    parser.add_argument("--coordinator", default="localhost:45677")
    parser.add_argument("--pid", type=int, default=0)
    args = parser.parse_args()

    if args.worker:
        worker(args.coordinator, args.nprocs, args.pid)
        return

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU run: skip the TPU tunnel
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--nprocs", str(args.nprocs), "--pid", str(i),
         "--coordinator", args.coordinator],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for i in range(args.nprocs)]
    results = []
    for proc in procs:
        out, err = proc.communicate(timeout=600)
        if proc.returncode != 0:
            print(err[-4000:], file=sys.stderr)
            raise SystemExit("worker failed")
        results.append(json.loads(out.strip().splitlines()[-1]))

    ref_sum, ref_hash, ref_cmax = single_process_reference()
    assert 0 < ref_sum < 1024, "instance must discriminate"
    for res in results:
        assert res["n_devices"] == args.nprocs, res
        assert res["safe_sum"] == ref_sum, (res, ref_sum)
        assert res["safe_hash"] == ref_hash, res
        assert abs(res["c_max"] - ref_cmax) < 1e-12, (res, ref_cmax)
    assert sum(r["coordinator"] for r in results) == 1
    print("multiprocess dryrun OK: {} processes x 1 device agree with "
          "the single-process sweep (safe_sum={}, c_max={:.6g})".format(
              args.nprocs, ref_sum, ref_cmax))


if __name__ == "__main__":
    main()
