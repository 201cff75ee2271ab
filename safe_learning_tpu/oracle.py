"""Float64 oracle evaluation and conservative-certificate calibration.

A *verification* framework must never over-claim: a grid point whose
exact-arithmetic decrease margin lies inside the float32 noise band could
be certified by the f32 device sweep even though the exact condition
fails. The reference sidesteps this by running everything in float64
(``/root/reference/safe_learning/configuration.py:16``); on TPU the
native dtype is float32, so instead the framework certifies only
``decrease < threshold - margin`` (see ``config.certificate_margin``)
with a margin that dominates the f32 pipeline error.

This module supplies the two pieces that make the margin principled:

- :func:`oracle_margins` — evaluate the decrease-condition margin of a
  Lyapunov instance in exact (float64) arithmetic, with the SAME model
  parameters the f32 pipeline uses (weights widened bit-exactly; GP
  posteriors re-factorized in float64 from the raw data).
- :func:`calibrate_certificate_margin` — measure the worst f32-vs-f64
  margin deviation on a grid subsample and install ``safety`` times that
  as the instance's margin, making the f32 certified set a subset of the
  exact-arithmetic one (property-tested in
  ``tests_f32/test_f32_certificate.py``).

Float64 runs on the CPU backend (TPUs do not execute f64); calibration
is off the hot path — one subsampled sweep per problem instance.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .functions import gp as gp_mod
from .lyapunov import _decrease_bound, _threshold

__all__ = ["lift64", "oracle_margins", "oracle_safe_set",
           "calibrate_certificate_margin", "calibrate_extended_margin"]


def _lift_leaf(leaf):
    """Widen a floating leaf to float64 (exact); pass anything else."""
    arr = np.asarray(leaf)
    if np.issubdtype(arr.dtype, np.floating):
        return jnp.asarray(arr, dtype=jnp.float64)
    return leaf


def lift64(fn):
    """Float64 copy of a function pytree (must run under ``enable_x64``).

    Every floating leaf is widened bit-exactly, so the lifted object
    computes the exact-arithmetic value of the SAME model the float32
    pipeline evaluates. Gaussian processes are REBUILT from their raw
    data and widened hyperparameters instead of leaf-widened: their
    cached factors (``chol_inv``, ``alpha``) carry f32 kernel-assembly
    rounding that a bitwise lift would merely reproduce.
    """
    if fn is None or isinstance(fn, (int, float)):
        return fn
    if isinstance(fn, gp_mod.StackedGaussianProcess):
        return gp_mod.StackedGaussianProcess(
            tuple(jax.tree_util.tree_map(_lift_leaf, k)
                  for k in fn.kernels),
            np.asarray(fn.X, dtype=np.float64),
            np.asarray(fn.Y, dtype=np.float64),
            np.asarray(fn.noise_variances, dtype=np.float64),
            betas=np.asarray(fn.betas, dtype=np.float64),
            mean_functions=tuple(lift64(m) for m in fn.mean_functions),
            capacity=fn.capacity, scale=fn.scale)
    if isinstance(fn, gp_mod.GaussianProcess):
        return gp_mod.GaussianProcess(
            jax.tree_util.tree_map(_lift_leaf, fn.kernel),
            np.asarray(fn.X, dtype=np.float64),
            np.asarray(fn.Y, dtype=np.float64),
            float(fn.noise_variance), beta=fn.beta,
            mean_function=lift64(fn.mean_function),
            capacity=fn.capacity, scale=fn.scale)
    return jax.tree_util.tree_map(_lift_leaf, fn)


@contextlib.contextmanager
def _oracle_env():
    """Float64 tracing on the CPU backend, Pallas fast paths off."""
    cpus = _local_cpus()
    use_pallas = config.use_pallas
    config.use_pallas = False
    try:
        with jax.enable_x64(True):
            if cpus:
                with jax.default_device(cpus[0]):
                    yield
            else:
                yield
    finally:
        config.use_pallas = use_pallas


def _local_cpus():
    """Process-LOCAL CPU devices (may be empty on CPU-less backends).

    ``jax.devices('cpu')`` returns the *global* list under
    ``jax.distributed``; pinning the oracle island to another process's
    device would make every oracle output non-addressable here.
    """
    try:
        return jax.local_devices(backend="cpu")
    except RuntimeError:
        return []


def _has_cpu_backend():
    return bool(_local_cpus())


def oracle_margins(lyapunov, states, tau=None):
    """Exact-arithmetic margins ``decrease - threshold`` at ``states``.

    Evaluates the full decrease-condition pipeline — policy, dynamics
    (GP posterior re-factorized in float64), Lyapunov values, Lipschitz
    threshold — of the given :class:`~safe_learning_tpu.Lyapunov`
    instance in float64 on the CPU backend. Negative margin means the
    point passes the exact check. ``tau`` overrides the instance's
    discretization constant (the refined check uses ``tau / R``).
    Returns a float64 numpy array.
    """
    tau = lyapunov.tau if tau is None else tau
    with _oracle_env():
        policy = lift64(lyapunov.policy)
        dynamics = lift64(lyapunov.dynamics)
        v_fun = lift64(lyapunov.lyapunov_function)
        lip_v = lift64(lyapunov._lipschitz_lyapunov)
        lip_f = lift64(lyapunov._lipschitz_dynamics)
        points = jnp.asarray(np.asarray(states), dtype=jnp.float64)
        actions = policy(points)
        next_states = dynamics(points, actions)
        decrease = _decrease_bound(v_fun, lip_v, points, next_states)
        threshold = _threshold(lip_v, lip_f, points, tau)
        margins = decrease - jnp.broadcast_to(threshold, decrease.shape)
        return np.asarray(margins, dtype=np.float64).ravel()


def oracle_safe_set(lyapunov):
    """Exact-arithmetic certified level set of a Lyapunov instance.

    Runs the same construction as a fresh ``update_safe_set`` — decrease
    check, initial-set exemption, ``v_bad = min v(failing)`` level
    reduction — entirely in float64 (see :func:`oracle_margins`).
    Returns ``(safe_set, c_max)`` with the initial set OR-ed in, exactly
    like the device sweep.
    """
    grid = lyapunov.discretization
    points = grid.all_points
    margins = oracle_margins(lyapunov, points)
    with _oracle_env():
        v_fun = lift64(lyapunov.lyapunov_function)
        values = np.asarray(
            v_fun(jnp.asarray(np.asarray(points),
                              dtype=jnp.float64)).reshape(-1),
            dtype=np.float64)
    negative = margins < 0.0
    exempt = (np.asarray(lyapunov.initial_safe_set, dtype=bool)
              if lyapunov.initial_safe_set is not None
              else np.zeros(grid.nindex, dtype=bool))
    eligible = negative | exempt
    v_bad = np.inf if eligible.all() else values[~eligible].min()
    safe = values < v_bad
    c_max = float(values[safe].max()) if safe.any() else -np.inf
    safe |= exempt
    return safe, c_max


def calibrate_certificate_margin(lyapunov, num_samples=4096, safety=2.0,
                                 rng=None, set_margin=True, refinement=1):
    """Measure the f32 pipeline error and install a dominating margin.

    Compares the device (working-dtype) decrease margins against the
    float64 oracle on a random grid subsample and returns
    ``safety * max |margin_f32 - margin_f64|``. With the returned margin
    installed, every point the f32 sweep certifies satisfies the exact
    decrease condition as long as the subsample's worst error is
    representative (``safety`` covers the tail; the property test in
    ``tests_f32/test_f32_certificate.py`` checks subset-ness of the full
    safe set on randomized instances).

    Parameters
    ----------
    lyapunov : Lyapunov
    num_samples : int, optional
        Grid subsample size (the full grid is used when smaller).
    safety : float, optional
        Multiplier on the measured worst-case error.
    rng : numpy Generator, optional
    set_margin : bool, optional
        Install the results as ``lyapunov.certificate_margin`` and
        ``lyapunov.level_margin``.
    refinement : int, optional
        When the margin will guard adaptive sweeps
        (``update_safe_set(..., max_refinement=R)``), pass ``R``: a
        random half of the subsample is displaced onto random points of
        the ``R``-refined sub-grid AND measured against the refined
        threshold ``tau / R`` (the exact comparison
        ``_refined_negative_batch`` makes), so the measured error also
        covers the refined comparisons a base-grid sample would miss
        (e.g. a training input strictly inside a cell).
    """
    from .lyapunov import _negative_batch, _values_batch

    rng = np.random.default_rng(0) if rng is None else rng
    grid = lyapunov.discretization
    if grid.nindex > num_samples:
        idx = rng.choice(grid.nindex, size=num_samples, replace=False)
        pts = grid.all_points[np.sort(idx)]
    else:
        pts = grid.all_points
    refinement = int(refinement)
    pts = np.array(pts, dtype=config.np_dtype)
    refined_mask = np.zeros(pts.shape[0], dtype=bool)
    if refinement > 1:
        # Mirror _refined_negative_batch's sub-grid: offsets span
        # +-0.5*(1 - 1/R)*unit_maxes with R points per dim (inclusive).
        # A RANDOM half is displaced (the sample is grid-index sorted,
        # so displacing a prefix would only ever probe low-index
        # states).
        refined_mask = rng.random(pts.shape[0]) < 0.5
        n_ref = int(refined_mask.sum())
        j = rng.integers(0, refinement, size=(n_ref, pts.shape[1]))
        unit = -1.0 + 2.0 * j / (refinement - 1.0)
        half_width = (0.5 * (1.0 - 1.0 / refinement)
                      * np.asarray(lyapunov.discretization.unit_maxes))
        pts[refined_mask] = pts[refined_mask] + (
            half_width * unit).astype(config.np_dtype)

    def _measure(points, tau):
        if points.shape[0] == 0:
            return 0.0
        _, dec, thr = _negative_batch(
            lyapunov.policy, lyapunov.dynamics,
            lyapunov.lyapunov_function, lyapunov._lipschitz_lyapunov,
            lyapunov._lipschitz_dynamics, tau,
            jnp.asarray(points, dtype=config.dtype))
        margins_dev = (np.asarray(dec, dtype=np.float64)
                       - np.asarray(thr, dtype=np.float64))
        return float(np.max(np.abs(
            margins_dev - oracle_margins(lyapunov, points, tau=tau))))

    # Refined points are measured against the threshold the refined
    # check actually compares (tau / R): the decrease and threshold
    # errors can partially cancel at tau and not at tau / R.
    err = max(_measure(pts[~refined_mask], lyapunov.tau),
              _measure(pts[refined_mask],
                       lyapunov.tau / max(refinement, 1)))
    margin = float(safety) * err

    level_margin = _measured_level_margin(lyapunov, pts, safety)

    if set_margin:
        lyapunov.certificate_margin = margin
        lyapunov.level_margin = level_margin
    return margin


def _measured_level_margin(lyapunov, pts, safety):
    """Companion LEVEL margin (shared by both calibrators).

    The certified-level cut compares f32 Lyapunov values, so
    containment additionally needs
    ``level_margin >= 2 * max |v_f32 - v_f64|`` (one delta for the cut
    value, one for the compared state; exact ties at the cut are the
    classic violation). Floored at a few ULPs of the value scale so a
    zero measured delta on the subsample still excludes ties.
    """
    from .lyapunov import _values_batch

    v_dev = np.asarray(_values_batch(lyapunov.lyapunov_function,
                                     jnp.asarray(pts, dtype=config.dtype)),
                       dtype=np.float64)
    with _oracle_env():
        v64 = np.asarray(lift64(lyapunov.lyapunov_function)(
            jnp.asarray(np.asarray(pts),
                        dtype=jnp.float64)).reshape(-1), dtype=np.float64)
    delta_v = float(np.max(np.abs(v_dev - v64)))
    v_scale = float(np.max(np.abs(v64))) or 1.0
    eps = float(np.finfo(config.np_dtype).eps)
    return max(2.0 * float(safety) * delta_v, 4.0 * eps * v_scale)


def calibrate_extended_margin(lyapunov, num_samples=4096, safety=2.0,
                              rng=None, set_margin=True, refinement=1):
    """Measure the EXTENDED (double-word) pipeline's error; install a
    dominating margin.

    The measured fallback for instances the derived
    ``ops.extended_verify.extended_certificate_margin`` refuses — e.g.
    a ``GradientNorm``-of-PWL whose input uncertainty exceeds the
    inflated model's trigger-band headroom (full-scale
    ``inverted_pendulum --extended`` after enough GP data). Compares
    ``ExtendedSweep.margins`` against the float64 oracle on a random
    grid subsample (plus, with ``refinement=R``, a displaced half
    measured at ``tau / R`` — the comparison the refined checks make)
    and installs ``safety * max |margin_dw - margin_f64|`` tagged at
    ``U_EFF`` (the plain f32 sweep refuses it, exactly like the derived
    extended margin), with the measured f32-scale level margin.

    Soundness grade matches :func:`calibrate_certificate_margin`:
    measurement-based (the subsample's worst error must be
    representative; ``safety`` covers the tail), not derived.
    """
    from .ops.extended_verify import U_EFF

    rng = np.random.default_rng(0) if rng is None else rng
    grid = lyapunov.discretization
    if grid.nindex > num_samples:
        idx = rng.choice(grid.nindex, size=num_samples, replace=False)
        pts = grid.all_points[np.sort(idx)]
    else:
        pts = grid.all_points
    refinement = int(refinement)
    pts = np.array(pts, dtype=config.np_dtype)
    refined_mask = np.zeros(pts.shape[0], dtype=bool)
    if refinement > 1:
        refined_mask = rng.random(pts.shape[0]) < 0.5
        n_ref = int(refined_mask.sum())
        j = rng.integers(0, refinement, size=(n_ref, pts.shape[1]))
        unit = -1.0 + 2.0 * j / (refinement - 1.0)
        half_width = (0.5 * (1.0 - 1.0 / refinement)
                      * np.asarray(grid.unit_maxes))
        pts[refined_mask] = pts[refined_mask] + (
            half_width * unit).astype(config.np_dtype)

    sweep = lyapunov._get_extended_sweep()

    def _measure(points, tau):
        if points.shape[0] == 0:
            return 0.0
        margins_dw = sweep.margins(points, tau=tau)
        # ONE-SIDED: only margin UNDERSTATEMENT (dw more permissive
        # than exact) is unsound — overstating the margin merely
        # shrinks the certified set. The inflated GradientNorm-of-PWL
        # program legitimately overstates by the trigger-band
        # neighborhood max (that is its soundness argument); a
        # two-sided |diff| would measure that conservatism as if it
        # were rounding error (observed: margin 19.9 at c_max ~ 10 on
        # the full-scale pendulum — certification-killing).
        return float(np.max(np.maximum(
            oracle_margins(lyapunov, points, tau=tau) - margins_dw,
            0.0)))

    err = max(_measure(pts[~refined_mask], lyapunov.tau),
              _measure(pts[refined_mask],
                       lyapunov.tau / max(refinement, 1)))
    margin = float(safety) * err
    level_margin = _measured_level_margin(lyapunov, pts, safety)

    if set_margin:
        lyapunov.certificate_margin = margin
        lyapunov.level_margin = level_margin
        lyapunov._certificate_margin_unit = U_EFF
    return margin
