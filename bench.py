"""Flagship benchmark: safe-learning ROA verification throughput.

Measures grid-point Lyapunov checks/sec on a 1000x1000 grid with GP
dynamics (the reference's headline workload: a full
``Lyapunov.update_safe_set`` sweep — GP posterior predict + Lyapunov values
+ Lipschitz threshold + certified-level reduction — per grid point).

The instance DISCRIMINATES (round-2 fix: round 1 timed a degenerate
safe_frac=1.0 workload): contracting mean dynamics with a GP posterior
whose uncertainty grows away from the 128 training points clustered near
the origin, so the certificate covers the explored region (~46 % of the
grid passes; c_max cuts a real level set) — the canonical safe-learning
shape of reference ``lyapunov.py:407-606``. The certified level is
cross-checked against a float64 NumPy oracle before timing.

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


def _build_instance(n_points=1000, n_train=128):
    """Discriminating verification instance (see module docstring)."""
    import jax.numpy as jnp

    import safe_learning_tpu as sl

    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n_points)
    a = np.array([[0.25, 0.05], [0.0, 0.3]])
    b = np.zeros((2, 1))
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    # Local Lipschitz constant of v: |grad v| = 2|x| (magnitude per dim,
    # L1-reduced in the threshold; reference lyapunov.py:282-288).
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    mean_fn = sl.LinearSystem([a, b])

    # Training data clustered near the origin: the GP is confident on the
    # explored region and uncertain outside -> the sweep certifies a
    # nontrivial level set.
    rng = np.random.default_rng(0)
    x_train = np.column_stack([
        rng.uniform(-0.4, 0.4, n_train), rng.uniform(-0.4, 0.4, n_train),
        np.zeros(n_train)])
    y_train = (x_train[:, :2] @ a.T
               + 0.02 * np.sin(3 * x_train[:, :2]))

    # noise 1e-4 keeps the kernel condition number ~1e4 so the f32 device
    # predict agrees with the f64 oracle to <5e-4 margin error (measured;
    # at noise 1e-6 the f32 margin error reaches 1e-2).
    params = dict(variance=1.0, lengthscales=0.3, noise=1e-4, beta=2.0)
    gp = sl.GaussianProcess(
        sl.RBF(params["variance"], [params["lengthscales"]] * 3,
               input_dim=3),
        x_train, y_train, noise_variance=params["noise"],
        beta=params["beta"], mean_function=mean_fn)

    tau = float(np.min(grid.unit_maxes))
    v_grid = np.asarray(v(jnp.asarray(grid.all_points))).ravel()
    initial_set = np.where(v_grid <= 0.01)[0]
    return (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train,
            y_train, params)


def _oracle_margins(grid, a, x_train, y_train, params, lf, tau,
                    batch=100_000, points=None):
    """Float64 NumPy oracle: per-point margin ``decrease - threshold`` and
    Lyapunov values (negative margin <=> the point passes the check).

    ``points`` restricts the oracle to an explicit subsample (the 1e8
    giant sweep validates against a random subset; the full 1e8 oracle
    would take hours on the host)."""
    import scipy.linalg

    ls = params["lengthscales"]
    var = params["variance"]
    x64 = np.asarray(x_train, np.float64) / ls
    kxx = var * np.exp(-0.5 * ((x64[:, None, :] - x64[None, :, :]) ** 2)
                       .sum(axis=2))
    factor = scipy.linalg.cho_factor(
        kxx + params["noise"] * np.eye(len(x64)), lower=True)
    resid = (np.asarray(y_train, np.float64)
             - np.asarray(x_train[:, :2], np.float64) @ a.T)

    pts = (np.asarray(grid.all_points, np.float64) if points is None
           else np.asarray(points, np.float64))
    vals = np.sum(pts ** 2, axis=1)
    margin = np.empty(len(pts), dtype=np.float64)
    for i in range(0, len(pts), batch):
        chunk = pts[i:i + batch]
        xu = np.column_stack([chunk, np.zeros(len(chunk))]) / ls
        kxq = var * np.exp(-0.5 * ((x64[:, None, :] - xu[None, :, :]) ** 2)
                           .sum(axis=2))
        mean = chunk @ a.T + kxq.T @ scipy.linalg.cho_solve(factor, resid)
        vsolve = scipy.linalg.solve_triangular(factor[0], kxq, lower=True)
        std = np.sqrt(np.maximum(var - np.sum(vsolve ** 2, axis=0), 1e-12))
        err = params["beta"] * std
        lv_next = 2.0 * np.abs(mean)
        bound = np.sum(lv_next * err[:, None], axis=1)
        decrease = np.sum(mean ** 2, axis=1) - vals[i:i + batch] + bound
        lv_l1 = np.sum(2.0 * np.abs(chunk), axis=1)
        threshold = -lv_l1 * (1.0 + lf) * tau
        margin[i:i + batch] = decrease - threshold
    return margin, vals


def _oracle_c_max(grid, a, x_train, y_train, params, lf, tau, initial_set,
                  batch=100_000):
    """Float64 NumPy oracle of the certified level on the same instance."""
    margin, vals = _oracle_margins(grid, a, x_train, y_train, params, lf,
                                   tau, batch=batch)
    negative = margin < 0
    exempt = np.zeros(grid.nindex, dtype=bool)
    exempt[initial_set] = True
    eligible = negative | exempt
    v_bad = np.inf if eligible.all() else vals[~eligible].min()
    safe = vals < v_bad
    c_max = vals[safe].max() if safe.any() else -np.inf
    # Same definition as the device-side print (mean of the level set,
    # exempt states not ORed in) so the two warmup columns compare one
    # quantity.
    return float(c_max), float(safe.mean())


def _ensure_backend():
    """Probe the TPU tunnel; fall back to the CPU backend if it is down.

    This machine's TPU sits behind a relay that, when unreachable, makes
    backend init either fail (UNAVAILABLE) or block indefinitely — both
    inside ``jax.devices()``. Probing in a killable subprocess bounds the
    wait; after three failed probes the bench drops the tunnel's PJRT
    plugin and runs on CPU so it still prints its one JSON line (the
    ``vs_baseline`` field then reflects the CPU rate, and stderr says so).
    """
    import os
    import subprocess

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return  # explicit CPU smoke run
    probe = "import jax; jax.devices()"
    for attempt in range(3):
        try:
            result = subprocess.run(
                [sys.executable, "-c", probe], timeout=90,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            if result.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        print("bench: TPU backend unreachable (probe {}/3)".format(
            attempt + 1), file=sys.stderr)
        time.sleep(30)
    print("bench: TPU backend down — falling back to CPU",
          file=sys.stderr)
    import jax
    import jax._src.xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")


def main():
    _ensure_backend()

    import jax
    import jax.numpy as jnp

    from safe_learning_tpu.lyapunov import Lyapunov, _fused_update

    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance()
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

    # Warmup / compile + correctness gate: the accelerator's certified
    # level must match the float64 NumPy oracle on this nontrivial
    # instance.
    carry = jnp.zeros((), dtype=points.dtype)
    carry, c_max, safe, any_safe = sweep_jit(points, carry)
    safe_frac = float(jnp.mean(safe))
    c_dev = float(c_max)
    c_ref, frac_ref = _oracle_c_max(grid, a, x_train, y_train, params, lf,
                                    tau, initial_set)
    print("warmup: c_max={:.6g} (oracle {:.6g}) safe_frac={:.4f} "
          "(oracle {:.4f}) any_safe={}".format(
              c_dev, c_ref, safe_frac, frac_ref, bool(any_safe)),
          file=sys.stderr)
    assert 0.05 < safe_frac < 0.95, \
        "bench instance must discriminate (safe_frac={})".format(safe_frac)
    assert abs(c_dev - c_ref) <= 5e-4 * max(abs(c_ref), 1.0), \
        "certified level {} != f64 oracle {}".format(c_dev, c_ref)

    # Conservative-certificate gate (round 3): with the calibrated
    # margin installed, the device's certified level must never exceed
    # the exact-arithmetic one.
    from safe_learning_tpu.oracle import calibrate_certificate_margin

    margin = calibrate_certificate_margin(lyap, num_samples=4096)
    lyap.update_safe_set()
    print("conservative: margin={:.3g} level_margin={:.3g} "
          "c_max={:.6g} (<= oracle {:.6g}), safe_frac {:.4f}".format(
              margin, lyap.level_margin, lyap.c_max, c_ref,
              lyap.safe_set.mean()), file=sys.stderr)
    assert lyap.c_max <= c_ref + 1e-7 * max(abs(c_ref), 1.0), \
        "margin-guarded level {} exceeds f64 oracle {}".format(
            lyap.c_max, c_ref)

    # Timed: asynchronously dispatched sweeps chained through the carry
    # (sequential on device, pipelined dispatch), one final host sync.
    # A lax.scan over sweeps inside a single dispatch measures ~2.8x
    # slower on v5e: strict scan sequencing defeats the cross-dispatch
    # pipelining of DMA and compute. Best of 3 blocks: the TPU relay's
    # session latency varies ~+-30% and other processes draining their
    # exit phase inflate it further — the fastest block measures the
    # kernel, the slower ones measure interference.
    # Relay interference only affects the TPU path; the CPU smoke run
    # keeps a single block (3x its minutes-long sweep buys nothing).
    blocks = 3 if jax.default_backend() == "tpu" else 1
    best = float("inf")
    for _ in range(blocks):
        start = time.perf_counter()
        for _ in range(iters):
            carry, c_max, safe, any_safe = sweep_jit(points, carry)
        float(c_max)  # single host sync
        best = min(best, time.perf_counter() - start)
    elapsed = best

    checks_per_sec = grid.nindex * iters / elapsed
    # The timed sweep is a SINGLE-device jit program (points committed to
    # one chip), so the comparison target is the per-chip share of the
    # 8-chip north star regardless of how many chips are visible.
    target_for_ndev = 1e8 / 8.0

    print(json.dumps({
        "metric": "roa_1000x1000_gp_lyapunov_checks_per_sec",
        "value": float(checks_per_sec),
        "unit": "grid-point checks/s (full GP-dynamics decrease check)",
        "vs_baseline": float(checks_per_sec / target_for_ndev),
        # Which backend actually ran: "cpu" here means the TPU relay was
        # unreachable and _ensure_backend fell back (the value is then a
        # CPU rate, not the chip's — see BENCH history for TPU numbers).
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
