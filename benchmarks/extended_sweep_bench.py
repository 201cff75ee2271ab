"""Throughput + accuracy of the extended-precision (double-word) sweep.

Builds the ill-conditioned property instance (tiny noise — the regime
the extended sweep exists for), then on the live backend measures:

1. ``eft_selfcheck`` (the backend gate);
2. the derived margins: f32 vs extended (the usability headline);
3. df-sweep throughput in grid-point checks/s, chained through a
   data-dependent carry so a memoizing relay cannot cheat;
4. worst df-vs-f64-oracle margin deviation on a grid subsample
   (skipped with ``--no-oracle`` when no CPU x64 lane is wanted).

Usage (TPU; launch detached — the relay blocks interpreter exit):

    PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
        benchmarks/extended_sweep_bench.py > /tmp/ext_bench.log 2>&1 &

CPU smoke:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python benchmarks/extended_sweep_bench.py --points 20000
"""

import argparse
import json
import sys
import time

import numpy as np


def build_instance():
    """The tiny-noise stacked instance from tests_f32/test_extended_verify."""
    import jax.numpy as jnp

    import safe_learning_tpu as sl

    rng = np.random.default_rng(3)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], 41)
    raw = rng.normal(size=(2, 2))
    a = raw * (0.5 / np.linalg.norm(raw, 2))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    nt = 70
    xt = np.column_stack([rng.uniform(-0.4, 0.4, nt),
                          rng.uniform(-0.4, 0.4, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.02 * np.sin(3 * xt[:, :2])
    st = sl.StackedGaussianProcess(
        [sl.RBF(1.0, [0.3] * 3, input_dim=3),
         sl.Matern32(0.9, [0.35] * 3, input_dim=3)],
        xt, yt, [1e-6, 1e-7], betas=2.0,
        mean_functions=[sl.LinearSystem([a[0:1], np.zeros((1, 1))]),
                        sl.LinearSystem([a[1:2], np.zeros((1, 1))])])
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= np.quantile(vals, 0.04))[0]
    return sl.Lyapunov(grid, v, st, lf, lv, tau, policy,
                       initial_set=initial)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=65536,
                    help="query batch size for the throughput chain")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--no-oracle", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from safe_learning_tpu.ops import extended as ext
    from safe_learning_tpu.ops.extended_verify import (
        ExtendedSweep, extended_certificate_margin)

    dev = jax.devices()[0]
    print(json.dumps({"section": "backend", "platform": dev.platform,
                      "device": str(dev)}), flush=True)

    t0 = time.time()
    ext.eft_selfcheck()
    print(json.dumps({"section": "eft_selfcheck", "ok": True,
                      "seconds": round(time.time() - t0, 2)}), flush=True)

    lyap = build_instance()
    lv_mat = 2.0 * np.eye(2)

    from safe_learning_tpu.errorbounds import (ErrorModel,
                                               analytic_certificate_margin)
    em = ErrorModel(
        lambda x: 2.0 * np.finfo(np.float32).eps / 2 * 4.0 * jnp.abs(x),
        2.0)
    m32 = analytic_certificate_margin(lyap, lipschitz_model=em,
                                      set_margin=False)
    m_ext = extended_certificate_margin(lyap, lv_matrix=lv_mat)
    thr_scale = 2.0 * (1.0 + 0.5) * lyap.tau
    print(json.dumps({"section": "margins", "f32_derived": m32,
                      "extended_derived": m_ext,
                      "threshold_scale": thr_scale}), flush=True)

    sweep = lyap._get_extended_sweep()
    grid = lyap.discretization
    rng = np.random.default_rng(0)
    base = np.asarray(grid.all_points[
        rng.integers(0, grid.nindex, size=args.points)], np.float32)
    base_dev = jnp.asarray(base)

    # Chain reps sweeps through a data-dependent carry: shift the batch
    # by a value derived from the previous verdict so a memoizing relay
    # must execute every rep.
    from functools import partial

    @partial(jax.jit, static_argnames=("reps",))
    def chain(params, pts, tau, margin, reps):
        def body(carry, _):
            shift, _ = carry
            shifted = pts * (1.0 + 1e-6 * shift)
            neg = sweep._body_raw(params, shifted, tau, margin)
            frac = jnp.mean(neg.astype(jnp.float32))
            return (frac, neg[0]), frac
        (_, _), fracs = jax.lax.scan(body, (jnp.float32(0.0),
                                            jnp.bool_(False)),
                                     None, length=reps)
        return fracs

    tau_p = sweep._tau
    from safe_learning_tpu.ops.extended_verify import _split_np
    targs = (_split_np(tau_p), _split_np(float(m_ext)))
    fr = chain(sweep._params, base_dev, *targs, reps=args.reps)
    fr.block_until_ready()
    t0 = time.time()
    fr = chain(sweep._params, base_dev, *targs, reps=args.reps)
    fr.block_until_ready()
    dt = time.time() - t0
    per_point = dt / (args.reps * args.points)
    print(json.dumps({
        "section": "throughput", "points": args.points,
        "reps": args.reps, "seconds": round(dt, 3),
        "checks_per_sec": args.points * args.reps / dt,
        "ns_per_point": per_point * 1e9,
        "safe_fraction_mean": float(np.mean(np.asarray(fr)))}),
        flush=True)

    # Plain (f32, single-word) sweep on the SAME instance and batch:
    # the honest denominator for the double-word pipeline's measured
    # cost (the roofline's ~30x flops estimate counts operations, not
    # the VPU-scan serialization the relay actually executes).
    from safe_learning_tpu.lyapunov import _negative_batch

    @partial(jax.jit, static_argnames=("reps",))
    def chain_plain(pts, reps):
        def body(carry, _):
            shift = carry
            shifted = pts * (1.0 + 1e-6 * shift)
            neg, _, _ = _negative_batch(
                lyap.policy, lyap.dynamics, lyap.lyapunov_function,
                lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics,
                lyap.tau, shifted)
            return jnp.mean(neg.astype(jnp.float32)), None
        frac, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return frac

    fp = chain_plain(base_dev, reps=args.reps)
    fp.block_until_ready()
    t0 = time.time()
    fp = chain_plain(base_dev, reps=args.reps)
    fp.block_until_ready()
    dt_plain = time.time() - t0
    print(json.dumps({
        "section": "plain_throughput", "points": args.points,
        "reps": args.reps, "seconds": round(dt_plain, 3),
        "checks_per_sec": args.points * args.reps / dt_plain,
        "ns_per_point": dt_plain / (args.reps * args.points) * 1e9,
        "extended_cost_ratio": dt / dt_plain}), flush=True)

    if not args.no_oracle:
        from safe_learning_tpu.oracle import oracle_margins

        pts = np.asarray(grid.all_points[::3], np.float32)
        worst = float(np.max(np.abs(
            sweep.margins(pts) - oracle_margins(lyap, pts))))
        print(json.dumps({"section": "oracle_deviation",
                          "worst_abs": worst,
                          "dominated": bool(worst <= m_ext)}),
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
