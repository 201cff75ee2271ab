"""Flagship benchmark: inverted-pendulum ROA verification throughput.

Measures grid-point Lyapunov checks/sec on a 1000x1000 pendulum grid with
GP dynamics (the reference's headline workload: a full
``Lyapunov.update_safe_set`` sweep — GP posterior predict + Lyapunov values
+ Lipschitz threshold + sorted-prefix level reduction — per grid point).

Baseline (BASELINE.md): the reference streams 10k-point batches through TF1
``session.run`` on a 4-core CPU and publishes no numbers; the north star is
> 1e8 checks/sec on a TPU v5e-8. ``vs_baseline`` reports the measured rate
against 1e8 checks/sec per 8 chips (i.e. 1.25e7/chip scaled by the device
count actually used).

Timing method: the TPU on this machine sits behind a relay that memoizes
identical dispatches, so iterations are chained through a data-dependent
on-device carry (each sweep perturbs the grid by a value computed from the
previous sweep) with a single host sync at the end — no per-iteration
host<->device transfers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import safe_learning_tpu as sl
    from safe_learning_tpu.lyapunov import Lyapunov, _fused_update
    from safe_learning_tpu.utils import dlqr

    n_points = 1000
    grid = sl.GridWorld([[-0.5, 0.5], [-1.0, 1.0]], n_points)

    # Pendulum + LQR candidate (examples/inverted_pendulum.ipynb setup).
    pend = sl.InvertedPendulum(mass=0.25, length=0.5, friction=0.1,
                               dt=0.01)
    a, b = pend.linearize()
    k, p = dlqr(a, b, np.eye(2), np.eye(1))
    policy = sl.LinearSystem(-k)
    v = sl.QuadraticFunction(p)

    # GP dynamics: linearized prior mean + RBF posterior from rollout
    # samples of the true nonlinear pendulum (2 outputs, shared kernel).
    # The kernel variance models the (small) linearization error so the
    # certificate is meaningful: the sweep certifies a real level set.
    rng = np.random.default_rng(0)
    x_train = np.column_stack([
        rng.uniform(-0.5, 0.5, 128), rng.uniform(-1.0, 1.0, 128),
        rng.uniform(-0.8, 0.8, 128)])
    y_train = np.asarray(pend(jnp.asarray(x_train[:, :2]),
                              jnp.asarray(x_train[:, 2:])))
    mean_fn = sl.LinearSystem([a, b])
    gp = sl.GaussianProcess(
        sl.RBF(1e-10, [0.3, 0.3, 0.5], input_dim=3), x_train, y_train,
        noise_variance=1e-12, beta=2.0, mean_function=mean_fn)

    lv = float(2 * np.linalg.norm(p, 2))
    lf = float(np.linalg.norm(a - b @ k, 2))
    tau = float(np.min(grid.unit_maxes)) * 1e-3

    # Initial safe set: a small level set around the origin (near-origin
    # states have |dv| below the GP error bound and are exempt a priori,
    # as in every reference notebook).
    v_grid = np.asarray(v(jnp.asarray(grid.all_points))).ravel()
    initial_set = np.where(v_grid <= 0.1)[0]
    lyap = Lyapunov(grid, v, gp, lf, lv, tau, policy,
                    initial_set=initial_set)

    points = jnp.asarray(grid.all_points)
    exempt = jnp.asarray(lyap.initial_safe_set)

    def sweep(pts, carry):
        """One full-grid verification sweep, chained via a tiny
        data-dependent perturbation so iterations cannot be elided."""
        shifted = pts + carry * 1e-9
        safe, c_max, values, any_safe = _fused_update(
            lyap.policy, lyap.dynamics, lyap.lyapunov_function,
            lyap._lipschitz_lyapunov, lyap._lipschitz_dynamics, lyap.tau,
            shifted, exempt)
        new_carry = jnp.sin(values[0] + carry)
        return new_carry, c_max, safe, any_safe

    iters = 50
    sweep_jit = jax.jit(sweep)

    # Warmup / compile.
    carry = jnp.zeros((), dtype=points.dtype)
    carry, c_max, safe, any_safe = sweep_jit(points, carry)
    print("warmup: c_max={:.6g} any_safe={} safe_frac={:.4f}".format(
        float(c_max), bool(any_safe), float(jnp.mean(safe))),
        file=sys.stderr)

    # Timed: asynchronously dispatched sweeps chained through the carry
    # (sequential on device, pipelined dispatch), one final host sync.
    # A lax.scan over sweeps inside a single dispatch measures ~2.8x
    # slower on v5e: strict scan sequencing defeats the cross-dispatch
    # pipelining of DMA and compute.
    start = time.perf_counter()
    for _ in range(iters):
        carry, c_max, safe, any_safe = sweep_jit(points, carry)
    float(c_max)  # single host sync
    elapsed = time.perf_counter() - start

    checks_per_sec = grid.nindex * iters / elapsed
    n_dev = jax.device_count()
    target_for_ndev = 1e8 * n_dev / 8.0  # north star: 1e8/s on 8 chips

    print(json.dumps({
        "metric": "pendulum_1000x1000_gp_lyapunov_checks_per_sec",
        "value": float(checks_per_sec),
        "unit": "grid-point checks/s (full GP-dynamics decrease check)",
        "vs_baseline": float(checks_per_sec / target_for_ndev),
    }))


if __name__ == "__main__":
    main()
