"""Uniform verification sweep at >= 1e8 grid points (r5).

The reference tops out at 9.0M uniform-equivalent points on a 4-core
CPU (``adaptive_safety_verification.ipynb``, SURVEY §6). This drives
the SAME flagship GP workload (``bench.py``'s discriminating 2-D
pendulum-shaped instance) through a full margin-guarded
``update_safe_set`` on a 10001 x 10001 grid — 1.00e8 points, 11x the
reference's envelope in one uniform sweep — and validates the result
against a float64 NumPy oracle on a random subsample:

- containment: no certified point is oracle-unsafe,
- level correctness: ``c_max`` <= the oracle level estimated from the
  subsample's failing points.

Prints per-stage wall-clock, sustained checks/s, and a memory account
(host arrays are the footprint; the device sees one batch at a time)
as JSON lines.

Usage (TPU; launch detached — the relay blocks interpreter exit):

    PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
        benchmarks/giant_sweep_1e8.py > /tmp/giant_sweep.log 2>&1 &

CPU smoke:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python benchmarks/giant_sweep_1e8.py --points 1001
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10001,
                    help="grid points per axis (10001 -> 1.00e8)")
    ap.add_argument("--batch", type=int, default=2 ** 21,
                    help="grid points per device dispatch")
    ap.add_argument("--oracle-samples", type=int, default=400_000)
    args = ap.parse_args()

    import jax

    import safe_learning_tpu as sl
    from bench import _build_instance, _oracle_margins
    from safe_learning_tpu.oracle import calibrate_certificate_margin

    dev = jax.devices()[0]
    n = args.points
    print(json.dumps({"section": "backend", "platform": dev.platform,
                      "device": str(dev), "grid": [n, n],
                      "nindex": n * n}), flush=True)

    t0 = time.time()
    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance(n_points=n)
    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial_set)
    pts_bytes = grid.all_points.nbytes
    print(json.dumps({"section": "build", "seconds": round(time.time() - t0, 1),
                      "tau": tau, "all_points_gb": round(pts_bytes / 1e9, 2),
                      "rss_gb": round(_rss_gb(), 2)}), flush=True)

    # Margin: the measurement-based calibrator (oracle on 4096 samples),
    # exactly the flagship bench's conservative-certificate gate.
    t0 = time.time()
    margin = calibrate_certificate_margin(lyap, num_samples=4096)
    print(json.dumps({"section": "margin", "seconds": round(time.time() - t0, 1),
                      "margin": margin,
                      "level_margin": lyap.level_margin}), flush=True)

    # The sweep: batched + streamed (sorted value order, early exit),
    # one jit program reused across all ~48 dispatches per pass.
    t0 = time.time()
    lyap.update_safe_set(batch_size=args.batch)
    dt_first = time.time() - t0
    safe = np.array(lyap.safe_set)
    print(json.dumps({
        "section": "sweep_first", "seconds": round(dt_first, 1),
        "includes": "compile + values + argsort + stream",
        "safe_fraction": float(safe.mean()), "c_max": float(lyap.c_max),
        "rss_gb": round(_rss_gb(), 2)}), flush=True)

    # Steady-state pass (compile cached): the sustained number.
    lyap.safe_set = np.zeros(grid.nindex, dtype=bool)
    lyap.safe_set |= lyap.initial_safe_set
    t0 = time.time()
    lyap.update_safe_set(batch_size=args.batch)
    dt = time.time() - t0
    safe2 = np.array(lyap.safe_set)
    assert (safe2 == safe).all() and 0.05 < safe.mean() < 0.95
    print(json.dumps({
        "section": "sweep_steady", "seconds": round(dt, 1),
        "checks_per_sec": grid.nindex / dt,
        "safe_fraction": float(safe.mean()), "c_max": float(lyap.c_max),
        "rss_gb": round(_rss_gb(), 2)}), flush=True)

    # Subsampled float64 oracle: containment + level correctness.
    t0 = time.time()
    rng = np.random.default_rng(7)
    idx = rng.choice(grid.nindex, size=min(args.oracle_samples,
                                           grid.nindex), replace=False)
    sub = np.asarray(grid.all_points[idx], np.float64)
    om, ov = _oracle_margins(grid, a, x_train, y_train, params, lf, tau,
                             points=sub)
    exempt_sub = np.isin(idx, initial_set)
    certified = safe[idx] & ~exempt_sub
    violations = int((certified & (om >= 0)).sum())
    # Exempt states count as safe without the decrease check (exactly
    # the sweep's semantics): only non-exempt failures bound the level.
    fail = (om >= 0) & ~exempt_sub
    oracle_c_est = float(np.min(ov[fail])) if fail.any() else np.inf
    print(json.dumps({
        "section": "oracle_subsample", "seconds": round(time.time() - t0, 1),
        "samples": len(idx), "containment_violations": violations,
        "c_max": float(lyap.c_max), "oracle_c_upper": oracle_c_est,
        "level_ok": bool(lyap.c_max <= oracle_c_est + 1e-6)}), flush=True)
    assert violations == 0, "certified point fails the f64 oracle"
    assert lyap.c_max <= oracle_c_est + 1e-6 * max(1.0, abs(oracle_c_est))
    print(json.dumps({"section": "summary", "ok": True,
                      "nindex": grid.nindex,
                      "checks_per_sec": grid.nindex / dt,
                      "vs_reference_envelope": grid.nindex / 9.0e6}),
          flush=True)


if __name__ == "__main__":
    main()
