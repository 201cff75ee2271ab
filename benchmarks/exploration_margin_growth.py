"""Measured growth cost of exploration-margin policies (r5).

The r4 sweep installs PER-POINT certificate margins, but exploration
used to collapse them to the grid-wide max before trimming candidates —
re-introducing at the exploration frontier the conservatism the
per-point installation removed from the sweep. r5's
``get_safe_sample`` derives each candidate's OWN bound instead
(``errorbounds.analytic_exploration_margin(per_candidate=True)``).

This runs the same active-learning loop (bench-shaped 2-D GP instance,
k sample/measure/append rounds, re-verification after each) under
three exploration policies and reports the certified-fraction
trajectory of each:

1. ``unguarded``   — margin 0 (no rigor; the growth ceiling),
2. ``collapsed``   — the per-point margins' grid-wide max as a scalar
                     (the pre-r5 behavior, forced via
                     ``exploration_margin``),
3. ``per-candidate`` — the r5 default under per-point sweep margins.

Measured (101^2, 15 steps): per-candidate matches the unguarded
trajectory EXACTLY (bit-equal certified fractions, 0 backup
fallbacks) — trimming each candidate by its own bound never changed
the argmax winner; the collapsed scalar (max 0.21 > c_max) finds NO
provably safe candidate on 12/15 steps and degenerates to the
not-provably-safe backup fallback (RuntimeWarning path). Containment
of the per-candidate certificates is property-tested separately
(``tests_f32/test_percand_explore.py``).

Usage:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python benchmarks/exploration_margin_growth.py
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build(n=101, seed=11):
    """Well-conditioned instance (noise 1e-2, smooth kernel): the
    regime where the DERIVED per-point sweep margins are usable end to
    end, so exploration policy — not sweep conservatism — controls the
    certified growth."""
    import jax.numpy as jnp

    import safe_learning_tpu as sl

    rng = np.random.default_rng(seed)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], n)
    a = np.array([[0.22, 0.03], [-0.02, 0.18]])
    policy = sl.LinearSystem(np.zeros((1, 2)))
    v = sl.QuadraticFunction(np.eye(2))
    lv = sl.LambdaFunction(lambda x: 2.0 * jnp.abs(x))
    lf = float(np.linalg.norm(a, 2))
    nt = 40
    xt = np.column_stack([rng.uniform(-0.5, 0.5, nt),
                          rng.uniform(-0.5, 0.5, nt), np.zeros(nt)])
    yt = xt[:, :2] @ a.T + 0.01 * np.sin(2 * xt[:, :2])
    gp = sl.GaussianProcess(
        sl.RBF(0.5, [0.8, 0.8, 1.0], input_dim=3), xt, yt,
        noise_variance=1e-2, beta=2.0,
        mean_function=sl.LinearSystem([a, np.zeros((2, 1))]),
        capacity=256)
    tau = float(np.min(grid.unit_maxes))
    vals = np.sum(grid.all_points ** 2, axis=1)
    initial = np.where(vals <= 0.01)[0]
    lyap = sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial)
    true_dyn = sl.LinearSystem([a, np.zeros((2, 1))])
    return lyap, true_dyn


def run_policy(mode, steps, seed=0):
    import jax.numpy as jnp

    import safe_learning_tpu as sl
    from safe_learning_tpu.errorbounds import analytic_certificate_margin

    lyap, true_dyn = build()
    if mode not in ("unguarded", "collapsed", "per-candidate"):
        raise ValueError(mode)

    # The SWEEP margin is identical (derived per-point, re-derived for
    # the CURRENT GP at every step in every mode) — only the
    # EXPLORATION margin policy varies, so growth and fallback
    # differences are attributable to exploration alone. (A margin
    # derived once for the initial GP would go stale as data arrives,
    # conflating exploration policy with margin freshness — r5 review.)
    def refresh_margins():
        m_pp = analytic_certificate_margin(lyap, per_point=True)
        if mode == "unguarded":
            lyap.exploration_margin = 0.0
        elif mode == "collapsed":
            lyap.exploration_margin = float(np.max(m_pp))
        # per-candidate: exploration_margin stays None and the
        # per-point certificate margin triggers the per-candidate
        # derivation.

    refresh_margins()

    pert = np.linspace(-0.2, 0.2, 9)[:, None]
    lyap.update_safe_set()
    fracs = [float(np.asarray(lyap.safe_set).mean())]
    rng = np.random.default_rng(seed)
    import warnings

    fallbacks = 0
    for _ in range(steps):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            sa, _ = sl.get_safe_sample(lyap, pert, num_samples=256,
                                       rng=rng)
            fallbacks += sum(issubclass(w.category, RuntimeWarning)
                             for w in caught)
        y = np.asarray(true_dyn(jnp.asarray(sa)))
        lyap.dynamics = lyap.dynamics.add_data_point(sa, y)
        refresh_margins()
        lyap.update_safe_set(can_shrink=False)
        fracs.append(float(np.asarray(lyap.safe_set).mean()))
    return fracs, fallbacks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    args = ap.parse_args()

    out = {}
    for mode in ("unguarded", "collapsed", "per-candidate"):
        fracs, fallbacks = run_policy(mode, args.steps)
        out[mode] = fracs
        print(json.dumps({"mode": mode, "final": fracs[-1],
                          "trajectory": [round(f, 4) for f in fracs],
                          "backup_fallbacks": fallbacks}), flush=True)
    gap_old = out["unguarded"][-1] - out["collapsed"][-1]
    gap_new = out["unguarded"][-1] - out["per-candidate"][-1]
    print(json.dumps({"section": "summary",
                      "growth_gap_collapsed": round(gap_old, 4),
                      "growth_gap_per_candidate": round(gap_new, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
