"""End-to-end safe active-learning iteration at notebook full scale.

The reference's flagship loop (`adaptive_safety_verification.ipynb`
cell 25, driven by `lyapunov.py:657-797`) alternates: pick the most
informative provably-safe state-action pair (`get_safe_sample`), measure
the true dynamics, append it to the GP (`add_data_point`), and re-verify
the certified level set (`update_safe_set`). The reference pays three
`session.run` round-trips per sample plus a full O(n^3) Cholesky
refactorization per append on a 4-core CPU; here the candidate scoring
is one fused device program, the append is an O(n^2) bordered Cholesky
update in a float64 host island, and the sweep is the fused adaptive
verification program.

This script times each phase separately at the notebook's full scale
(501^2 grid, 15 measurements per verification round) so the end-to-end
iteration cost — not just the sweep — is on record.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import safe_learning_tpu as sl  # noqa: E402

print("backend:", jax.default_backend())


def build(num_states=501, n_max=16):
    """The adaptive notebook's full-scale instance — imported from the
    example module so the benchmark times EXACTLY the example's
    instance — with the per-dim GPs batched as a StackedGaussianProcess
    (the TPU-native form) and capacity preallocated for the whole run
    (capacity growth re-traces every program that closes over the GP).
    """
    from examples.adaptive_safety_verification import build_instance

    lyap, true_pendulum = build_instance(num_states, capacity=256,
                                         stacked=True)
    return lyap, true_pendulum, n_max


def main():
    lyap, true_pendulum, n_max = build()
    sweep = dict(can_shrink=False, max_refinement=n_max, safety_factor=1.0)
    rng = np.random.default_rng(0)
    action_variation = np.array([[0.0]])
    action_limits = np.array([[-1.0, 1.0]])

    # The "true system" is the benchmark's environment: jit it so a
    # measurement is one dispatch, not an eager op-by-op ODE rollout.
    measure = jax.jit(lambda s, a: true_pendulum(s, a))

    lyap.update_safe_set(**sweep)  # compile + initial certificate
    print("grid {}  initial safe fraction {:.3f}".format(
        lyap.discretization.nindex, lyap.safe_set.mean()))

    # Warmup iteration: compiles the candidate-scoring size buckets and
    # the sweep; excluded from the steady-state numbers below.
    rng_w = np.random.default_rng(1)
    for _ in range(15):
        xu, _ = sl.get_safe_sample(lyap, action_variation, action_limits,
                                   positive=True, num_samples=1000,
                                   rng=rng_w)
        y = np.asarray(measure(jnp.asarray(xu[:, :2]),
                               jnp.asarray(xu[:, 2:])))
        lyap.dynamics = lyap.dynamics.add_data_point(xu, y)
    lyap.update_safe_set(**sweep)
    print("warmup done: safe fraction {:.3f}  n_data {}".format(
        lyap.safe_set.mean(), int(lyap.dynamics.count)))

    iters, per_iter = 4, 15
    t_sample = t_measure = t_append = t_sweep = 0.0
    n_samples = 0
    for it in range(iters):
        for _ in range(per_iter):
            t0 = time.perf_counter()
            xu, _ = sl.get_safe_sample(lyap, action_variation,
                                       action_limits, positive=True,
                                       num_samples=1000, rng=rng)
            t1 = time.perf_counter()
            y = np.asarray(measure(jnp.asarray(xu[:, :2]),
                                   jnp.asarray(xu[:, 2:])))
            t2 = time.perf_counter()
            lyap.dynamics = lyap.dynamics.add_data_point(xu, y)
            t3 = time.perf_counter()
            t_sample += t1 - t0
            t_measure += t2 - t1
            t_append += t3 - t2
            n_samples += 1
        t0 = time.perf_counter()
        lyap.update_safe_set(**sweep)
        jax.block_until_ready(lyap.c_max)
        t_sweep += time.perf_counter() - t0
        print("iter {}: safe fraction {:.3f}  c_max {:.4f}  n_data {}"
              .format(it + 1, lyap.safe_set.mean(), float(lyap.c_max),
                      int(lyap.dynamics.count)))

    total = t_sample + t_measure + t_append + t_sweep
    print("\nper exploration sample ({} samples, capacity {}):".format(
        n_samples, lyap.dynamics.capacity))
    print("  get_safe_sample   {:7.1f} ms".format(1e3 * t_sample / n_samples))
    print("  true measurement  {:7.1f} ms".format(1e3 * t_measure / n_samples))
    print("  add_data_point    {:7.1f} ms".format(1e3 * t_append / n_samples))
    print("per verification sweep (adaptive, 501^2, N<=16):")
    print("  update_safe_set   {:7.1f} ms".format(1e3 * t_sweep / iters))
    print("full iteration ({} samples + verify): {:.2f} s".format(
        per_iter, total / iters))

    # ---- round 3: the k-step fused sampler ----
    # All 15 sample/measure/append rounds of an iteration in ONE device
    # program (selection-grade on-device GP appends between steps) plus
    # one authoritative f64 refresh, then the adaptive sweep: the whole
    # iteration pays two dispatch round-trips instead of ~45.
    true_fn = sl.LambdaFunction(
        lambda sa: true_pendulum(sa[:, :2], sa[:, 2:]))
    # Warmup/compile for the batched program.
    sl.get_safe_sample_batch(lyap, true_fn, per_iter, action_variation,
                             action_limits, positive=True,
                             num_samples=1000, rng=rng)
    lyap.update_safe_set(**sweep)

    t_batch = t_bsweep = 0.0
    for it in range(iters):
        t0 = time.perf_counter()
        sas, ys, bounds, safes = sl.get_safe_sample_batch(
            lyap, true_fn, per_iter, action_variation, action_limits,
            positive=True, num_samples=1000, rng=rng)
        t1 = time.perf_counter()
        lyap.update_safe_set(**sweep)
        jax.block_until_ready(lyap.c_max)
        t2 = time.perf_counter()
        t_batch += t1 - t0
        t_bsweep += t2 - t1
        print("batched iter {}: safe fraction {:.3f}  c_max {:.4f}  "
              "n_data {}".format(it + 1, lyap.safe_set.mean(),
                                 float(lyap.c_max),
                                 int(lyap.dynamics.count)))
    print("\nbatched iteration ({} samples in ONE dispatch + f64 append): "
          "{:7.1f} ms".format(per_iter, 1e3 * t_batch / iters))
    print("  + adaptive update_safe_set {:7.1f} ms".format(
        1e3 * t_bsweep / iters))
    print("batched full iteration: {:.2f} s   (sequential was {:.2f} s)"
          .format((t_batch + t_bsweep) / iters, total / iters))


if __name__ == "__main__":
    main()
