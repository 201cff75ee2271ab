"""Lyapunov stability verification on discretized state spaces.

TPU-native re-design of ``/root/reference/safe_learning/lyapunov.py``. The
reference streams 10 000-point batches through ``session.run`` with a Python
early-exit loop (``lyapunov.py:512-595``); here the decrease condition for an
entire (padded) batch of grid points — policy, dynamics (possibly GP
posterior), Lyapunov values, Lipschitz threshold — is a single fused jitted
program, and the certified level ``c_max`` is found with O(n) reductions
(``max{v < min v(failing)}``) instead of a sequential sorted scan. Batches
are only used to bound device memory on huge grids; each keeps one compiled
shape.

Semantics deviations from the reference (documented intentionally):
- If *no* sorted prefix is safe, ``c_max`` is ``-inf`` (the reference
  wraps ``max_index = -1`` and silently reports the *largest* value,
  ``lyapunov.py:589-595``).
- With ``can_shrink=False``, previously-safe states are always kept (the
  reference drops the tail of the first failing batch, a batch-size
  dependent artifact of ``lyapunov.py:583-587``).
- The adaptive refinement check evaluates the dynamics *at the refined
  sub-grid points*, with per-sub-point local thresholds, always at the
  maximum refinement R (the reference's ``refined_safety_check`` builds
  the sub-grid but compares the coarse-state decrease against the
  refined threshold at a per-state ``N(x)``, ``lyapunov.py:445-478`` —
  unsound; we implement the paper's intent, and checking at full R is
  free with the static sub-grid buffer and strictly stronger).
"""

from __future__ import annotations

import heapq
import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import config
from .functions.base import Function, as_deterministic
from .grids import GridWorld
from .utils import tracked_mask

__all__ = ["Lyapunov", "smallest_boundary_value", "get_lyapunov_region"]


def _as_lipschitz(lip):
    """Normalize a Lipschitz spec (reference ``lyapunov.py:227-263``).

    A scalar stays a scalar; a callable becomes a Function."""
    if lip is None:
        return None
    if callable(lip) or isinstance(lip, Function):
        return as_deterministic(lip)
    return float(lip)


def _eval_lipschitz(lip, states):
    if isinstance(lip, Function) or callable(lip):
        return lip(states)
    return lip


def _as_column_batch(lv):
    """Normalize a local-Lipschitz evaluation to a per-state column.

    A callable returning shape ``(N,)`` means one constant PER STATE —
    ``atleast_2d`` would turn it into a single ``(1, N)`` row and the
    L1 reduction would then sum constants ACROSS the batch (silently
    certifying nothing); reshape to ``(N, 1)`` instead. Scalars become
    ``(1, 1)`` and broadcast."""
    lv = jnp.asarray(lv)
    if lv.ndim == 1:
        return lv.reshape(-1, 1)
    if lv.ndim == 0:
        return lv.reshape(1, 1)
    return lv


def _lv_threshold_term(lipschitz_lyapunov, states):
    """L_v factor of the threshold (reference ``lyapunov.py:282-288``).

    Vector-valued local constants are reduced with the L1 norm."""
    lv = _eval_lipschitz(lipschitz_lyapunov, states)
    if isinstance(lipschitz_lyapunov, Function) or callable(
            lipschitz_lyapunov):
        lv = _as_column_batch(lv)
        if lv.shape[1] > 1:
            lv = jnp.sum(jnp.abs(lv), axis=1, keepdims=True)
    return lv


def _threshold(lipschitz_lyapunov, lipschitz_dynamics, states, tau):
    """``-L_v (1 + L_f) tau`` (reference ``lyapunov.py:265-288``)."""
    lv = _lv_threshold_term(lipschitz_lyapunov, states)
    lf = _eval_lipschitz(lipschitz_dynamics, states)
    return -lv * (1.0 + lf) * tau


def _decrease_bound(lyapunov_function, lipschitz_lyapunov, states,
                    next_states):
    """Upper confidence bound on ``v(f(x)) - v(x)``.

    (reference ``lyapunov.py:324-376``)."""
    if isinstance(next_states, (tuple, list)):
        next_states, error = next_states
        lv = _as_column_batch(_eval_lipschitz(lipschitz_lyapunov,
                                              next_states))
        bound = jnp.sum(lv * error, axis=1, keepdims=True)
    else:
        bound = 0.0
    v_decrease = (lyapunov_function(next_states).reshape(-1, 1)
                  - lyapunov_function(states).reshape(-1, 1))
    return v_decrease + bound


def _margin_operand(margin):
    """Normalize a scalar-or-per-point margin for ``(N, 1)`` comparisons.

    A per-point margin arrives as an ``(N,)`` array aligned with the
    batch's states; reshaping to a column keeps ``threshold - margin``
    an ``(N, 1)`` elementwise expression instead of an ``(N, N)``
    broadcast."""
    m = jnp.asarray(margin)
    return m.reshape(-1, 1) if m.ndim == 1 else m


@jax.jit
def _negative_batch(policy, dynamics, lyapunov_function, lipschitz_lyapunov,
                    lipschitz_dynamics, tau, states, margin=0.0):
    """Fused decrease-condition check for one batch of grid states.

    Computes ``v(f(x, pi(x))) - v(x) + L_v sigma < -L_v (1 + L_f) tau``
    (the whole pipeline of reference ``lyapunov.py:429-441`` in one
    compiled program). ``margin`` tightens the comparison by an absolute
    conservatism term absorbing float32 pipeline rounding (see
    ``config.certificate_margin``); a per-point ``(N,)`` margin array
    tightens each state by ITS derived bound
    (``errorbounds.analytic_certificate_margin(per_point=True)``)."""
    actions = policy(states)
    next_states = dynamics(states, actions)
    decrease = _decrease_bound(lyapunov_function, lipschitz_lyapunov,
                               states, next_states)
    threshold = _threshold(lipschitz_lyapunov, lipschitz_dynamics, states,
                           tau)
    negative = jnp.squeeze(decrease < threshold - _margin_operand(margin),
                           axis=1)
    return negative, jnp.squeeze(decrease, axis=1), \
        jnp.squeeze(jnp.broadcast_to(threshold, decrease.shape), axis=1)


@jax.jit
def _hybrid_filter_batch(policy, dynamics, lyapunov_function,
                         lipschitz_lyapunov, lipschitz_dynamics, tau,
                         states, w_hi, w_lo):
    """Pass-1 verdicts + ambiguity-band mask for the hybrid sweep.

    Runs the plain pipeline and classifies every point against the
    band width ON DEVICE with exact double-word compares
    (``two_sum(dec, -thr)`` is the exact difference as a pair;
    ``(w_hi, w_lo)`` is the conservative split of the f64 width) —
    only two boolean masks return to the host. Tie semantics match the
    definition in :meth:`Lyapunov._hybrid_negative`:
    ``negative = diff < -width``; ``band = -width <= diff <= width``.
    """
    from .ops.extended import df_less, two_sum

    _, dec, thr = _negative_batch(policy, dynamics, lyapunov_function,
                                  lipschitz_lyapunov,
                                  lipschitz_dynamics, tau, states, 0.0)
    d = two_sum(dec, -thr)
    negative = df_less(d, (-w_hi, -w_lo))
    band = ~negative & ~df_less((w_hi, w_lo), d)
    return negative, band


@partial(jax.jit, static_argnames=("max_refinement", "ndim"))
def _refined_negative_batch(policy, dynamics, lyapunov_function,
                            lipschitz_lyapunov, lipschitz_dynamics, tau,
                            states, unit_maxes, max_refinement, ndim,
                            margin=0.0):
    """Sound decrease check on ``R^d`` sub-grids at discretization tau/R.

    Each failing coarse cell is re-verified on the full
    ``max_refinement^d`` sub-grid covering it, with the threshold
    evaluated AT the sub-grid points (local Lipschitz constants vary
    inside the cell) and the refined discretization constant ``tau / R``.

    Always checking at the MAXIMUM refinement is sound (a finer cover
    needs a weaker threshold) and strictly stronger than using the
    reference's per-state ``N(x) = ceil(threshold / decrease)``
    (``lyapunov.py:445-454``): that ``N`` is calibrated for the
    reference's shortcut of comparing the *coarse-state* decrease against
    the refined threshold (``lyapunov.py:459-478``), which is unsound —
    and plugged into the sound sub-grid check it under-refines badly
    (measured: certifying 1% of what the fine grid certifies on a
    thin-margin instance, vs ~100% at full R). With the static ``R^d``
    buffer the device cost is identical for every ``n <= R``, so there is
    no reason to check at less than ``R``.
    """
    r = int(max_refinement)
    d = int(ndim)

    combos = np.stack(np.meshgrid(*[np.arange(r)] * d, indexing="ij"),
                      axis=-1).reshape(-1, d).astype(np.float64)
    if r > 1:
        unit = -1.0 + 2.0 * combos / (r - 1.0)  # (R^d, d) in [-1, 1]
    else:
        unit = np.zeros_like(combos)
    unit = jnp.asarray(unit, dtype=states.dtype)
    half_width = (0.5 * (1.0 - 1.0 / r)) * unit_maxes
    points = states[:, None, :] + half_width * unit[None, :, :]
    flat = points.reshape(-1, d)

    actions = policy(flat)
    next_states = dynamics(flat, actions)
    decrease = _decrease_bound(lyapunov_function, lipschitz_lyapunov, flat,
                               next_states)
    thresholds = _threshold(lipschitz_lyapunov, lipschitz_dynamics, flat,
                            tau / r)
    m = jnp.asarray(margin)
    if m.ndim == 1:
        # Per-STATE margin: repeat over that state's R^d sub-points.
        m = jnp.repeat(m, r ** d).reshape(-1, 1)
    ok = (decrease < jnp.broadcast_to(thresholds, decrease.shape) - m)
    return jnp.all(ok.reshape(states.shape[0], -1), axis=1)


@jax.jit
def _values_batch(fun, points):
    """Evaluate a scalar function on a batch of points, flattened."""
    return fun(points).reshape(-1)


@jax.jit
def _fused_update(policy, dynamics, lyapunov_function, lipschitz_lyapunov,
                  lipschitz_dynamics, tau, points, exempt, margin=0.0,
                  level_margin=0.0, values_direct=None):
    """Whole-grid safe-set update as ONE device program.

    Computes ``v`` on the grid, runs the fused decrease check for every
    point in parallel, and finds the certified level with O(n)
    reductions: the level-set prefix in value order is unbroken exactly
    up to the smallest value among failing states, so
    ``c_max = max{v(x) : v(x) < min v(failing)}`` — the TPU replacement
    for the reference's sequential batched early-exit loop
    (``lyapunov.py:512-595``; a full sort would cost ~3x the sweep).
    States tied with the smallest failing value are conservatively
    excluded (the reference's stable sort could include some of them).

    Returns ``(safe_set, c_max, values, any_safe)``.

    ``values_direct`` short-circuits ``v`` on the grid: a PWL candidate
    defined on this very grid takes its vertex values directly (exact,
    and skips one 13.4 ns/row corner-table gather per grid point — the
    measured per-row random-access floor, ``benchmarks/
    gather_probe_r3.py``).
    """
    if values_direct is not None:
        values = values_direct.reshape(-1)
    else:
        values = lyapunov_function(points).reshape(-1)
    # Inlined decrease check reusing ``values`` for v(x) — one candidate
    # evaluation per sweep instead of two (matters for PWL / neural
    # candidates, where v costs as much as the dynamics).
    actions = policy(points)
    next_states = dynamics(points, actions)
    if isinstance(next_states, (tuple, list)):
        next_states, error = next_states
        lv = _as_column_batch(_eval_lipschitz(lipschitz_lyapunov,
                                              next_states))
        bound = jnp.sum(lv * error, axis=1, keepdims=True)
    else:
        bound = 0.0
    decrease = (lyapunov_function(next_states).reshape(-1, 1)
                - values.reshape(-1, 1) + bound)
    threshold = _threshold(lipschitz_lyapunov, lipschitz_dynamics, points,
                           tau)
    negative = jnp.squeeze(decrease < threshold - _margin_operand(margin),
                           axis=1)
    eligible = negative | exempt

    inf = jnp.asarray(jnp.inf, dtype=values.dtype)
    v_bad = jnp.min(jnp.where(eligible, inf, values))
    # level_margin guards the VALUE comparison the same way margin
    # guards the decrease comparison: a state whose exact value ties or
    # crosses the exact level cut within f32 rounding must not slip into
    # the certified set (see oracle.calibrate_certificate_margin).
    safe_set = values < v_bad - level_margin
    any_safe = jnp.any(safe_set)
    c_max = jnp.where(any_safe,
                      jnp.max(jnp.where(safe_set, values, -inf)),
                      -inf)
    return safe_set, c_max, values, any_safe


class Lyapunov:
    """A Lyapunov function certificate over a discretized domain.

    Parameters mirror the reference class (``lyapunov.py:142-225``):

    Parameters
    ----------
    discretization : GridWorld
    lyapunov_function : Function or callable
        The candidate ``v(x)``.
    dynamics : Function or callable
        Closed-form or uncertain dynamics; uncertain dynamics return
        ``(mean, error_bound)`` tuples.
    lipschitz_dynamics : float or callable
        Closed-loop Lipschitz constant of the dynamics (global scalar or
        local values per state).
    lipschitz_lyapunov : float or callable
        Lipschitz constant of ``v`` (global or local).
    tau : float
        Discretization constant.
    policy : Function or callable
    initial_set : ndarray or index list, optional
        States known to be safe a priori.
    adaptive : bool, optional
        Enable adaptive refinement in :meth:`update_safe_set`.
    certificate_margin : float, optional
        Absolute conservatism margin for every safety comparison: the
        decrease check certifies only ``decrease < threshold - margin``.
        Absorbs float32 pipeline rounding so the certified set cannot
        over-claim relative to exact arithmetic; calibrate with
        :func:`safe_learning_tpu.oracle.calibrate_certificate_margin`.
        ``None`` (default) reads ``config.certificate_margin`` at each
        sweep.

    Examples
    --------
    A contracting linear system with ``v(x) = x^2`` certifies the whole
    grid at ``tau = 0`` (the origin itself is exempted via the initial
    set, matching reference ``test_lyapunov.py:48-74``):

    >>> import numpy as np
    >>> from safe_learning_tpu import (GridWorld, LinearSystem, Lyapunov,
    ...                                QuadraticFunction)
    >>> grid = GridWorld([[-1, 1]], 3)
    >>> dynamics = LinearSystem(np.array([[0.5, 1.0]]))  # f(x,u) = x/2 + u
    >>> policy = LinearSystem(np.array([[0.0]]))         # u = 0
    >>> lyap = Lyapunov(grid, QuadraticFunction(np.eye(1)), dynamics,
    ...                 0.5, 2.0, 0.0, policy, initial_set=[1])
    >>> lyap.update_safe_set()
    >>> bool(lyap.safe_set.all())
    True
    >>> float(lyap.c_max)
    1.0
    """

    def __init__(self, discretization, lyapunov_function, dynamics,
                 lipschitz_dynamics, lipschitz_lyapunov, tau, policy,
                 initial_set=None, adaptive=False, mesh=None,
                 certificate_margin=None):
        if not isinstance(discretization, GridWorld):
            raise TypeError("discretization must be a GridWorld")
        self.discretization = discretization
        self.mesh = mesh
        self.policy = as_deterministic(policy)
        self.dynamics = dynamics if isinstance(dynamics, Function) \
            else as_deterministic(dynamics)
        self.lyapunov_function = as_deterministic(lyapunov_function)
        self.tau = float(tau)
        self.adaptive = bool(adaptive)
        self._certificate_margin = (None if certificate_margin is None
                                    else float(certificate_margin))
        self._level_margin = None

        self._lipschitz_dynamics = _as_lipschitz(lipschitz_dynamics)
        self._lipschitz_lyapunov = _as_lipschitz(lipschitz_lyapunov)

        nindex = discretization.nindex
        self._safe_set_version = 0
        self._initial_set_version = 0
        self.safe_set = np.zeros(nindex, dtype=bool)
        self.initial_safe_set = None
        if initial_set is not None:
            mask = np.zeros(nindex, dtype=bool)
            mask[np.asarray(initial_set)] = True
            self.initial_safe_set = mask
            self.safe_set |= mask

        self.c_max = 0.0
        self.values = None
        self._refinement = np.zeros(nindex, dtype=int)
        if self.initial_safe_set is not None:
            self._refinement[self.initial_safe_set] = 1

        # Model of a callable ``lipschitz_lyapunov`` as the row-wise
        # absolute linear form ``L_v(x) = |x G^T|`` — required by the
        # extended-precision sweep (``update_safe_set(extended=True)``)
        # for non-constant L_v; installed by
        # ``ops.extended_verify.extended_certificate_margin``. The
        # property setter snapshots a READ-ONLY copy (see
        # ``extended_lv_matrix``).
        self.extended_lv_matrix = None
        # Companion model of a callable ``lipschitz_dynamics`` as the
        # single-row absolute linear form ``L_f(x) = |x H^T|`` for the
        # extended sweep (GradientNorm-of-Triangulation L_f compiles
        # directly and needs no model).
        self.extended_lf_matrix = None
        self._ext_sweep = None
        self._ext_sweep_key = None
        self._ext_matrix_keys = {}
        #: Unit roundoff each installed margin was DERIVED at (None =
        #: unrestricted: empirical/manual margins). A margin derived for
        #: a finer-than-f32 pipeline (``U_EFF``) cannot cover the plain
        #: float32 sweep/scorer; the f32 paths refuse to consume it
        #: (see :meth:`_require_f32_margin`).
        self._certificate_margin_unit = None
        self._exploration_margin_unit = None
        #: Dedicated conservatism margin for the exploration certificate
        #: (``v_future < c_max - margin``); installed by
        #: ``errorbounds.analytic_exploration_margin`` (or its extended
        #: twin) and preferred by ``explore._margin_of`` over
        #: ``certificate_margin`` when set.
        self.exploration_margin = None
        #: Manual override of the hybrid sweep's f32 band margin
        #: (scalar or per-grid-point array bounding the PLAIN f32
        #: pipeline's |computed - exact| decrease-threshold gap at
        #: every point). ``None`` (default) auto-derives it on first
        #: ``update_safe_set(extended="hybrid")`` via
        #: ``ops.extended_verify.hybrid_band_margin`` — the DERIVED
        #: band, which makes the hybrid certificate PROVABLY identical
        #: to ``extended=True``. Installing the measured
        #: ``oracle.calibrate_certificate_margin(..., set_margin=False)``
        #: value instead shrinks the band ~100x (the derived bound's
        #: abs-matvec conditioning overshoot) for near-plain-f32 cost;
        #: soundness is then measurement-grade — the same assumption
        #: the default plain sweep already makes with that margin —
        #: while band points still get exact-grade extended verdicts
        #: (measured on device in ``benchmarks/hybrid_sweep_bench.py``).
        self.hybrid_band_margin = None
        self._auto_band_margin = None
        self._auto_band_key = None
        #: Diagnostics: fraction of checked states the last hybrid
        #: sweep routed to the extended pipeline (its cost driver).
        self.last_band_fraction = None

        self.update_values()

    # ------------------------------------------------------------------
    @staticmethod
    def _freeze_matrix(value):
        """Install-time snapshot of an L_v/L_f model matrix.

        A read-only float64 copy: the compiled extended sweep and its
        identity-keyed value cache both reference THIS object, so the
        cache can never go stale through in-place mutation (mutating
        the installed array raises; installing a new model is an
        assignment, which re-keys and rebuilds)."""
        if value is None:
            return None
        arr = np.array(value, dtype=np.float64, copy=True)
        arr.setflags(write=False)
        return arr

    @property
    def extended_lv_matrix(self):
        """Row-wise absolute linear model ``L_v(x) = |x G^T|`` of a
        callable ``lipschitz_lyapunov`` for the extended sweep
        (read-only snapshot; assign to replace)."""
        return self._extended_lv_matrix

    @extended_lv_matrix.setter
    def extended_lv_matrix(self, value):
        self._extended_lv_matrix = self._freeze_matrix(value)

    @property
    def extended_lf_matrix(self):
        """Single-row absolute linear model ``L_f(x) = |x H^T|`` of a
        callable ``lipschitz_dynamics`` for the extended sweep
        (read-only snapshot; assign to replace)."""
        return self._extended_lf_matrix

    @extended_lf_matrix.setter
    def extended_lf_matrix(self, value):
        self._extended_lf_matrix = self._freeze_matrix(value)

    @property
    def safe_set(self):
        """Boolean mask of certified-safe grid states.

        Stored as a :class:`~safe_learning_tpu.utils.TrackedMask`: plain
        assignment, augmented assignment (``lyap.safe_set |= mask`` —
        the examples' idiom), AND direct item/slice assignment
        (``lyap.safe_set[i] = True``, ``lyap.safe_set[:] = False``) all
        invalidate the device-resident copies the exploration step
        caches, so a stale mask can never certify a sample.
        """
        return self._safe_set

    @safe_set.setter
    def safe_set(self, value):
        """Set the safe set and bump its version counter."""
        self._safe_set = tracked_mask(value)
        self._safe_set_version += 1

    @property
    def initial_safe_set(self):
        """States safe a priori (exempt from the decrease check).

        Same update contract as :attr:`safe_set`: assignment, augmented
        assignment, and item/slice assignment all invalidate the cached
        device copy of the exempt mask.
        """
        return self._initial_safe_set

    @initial_safe_set.setter
    def initial_safe_set(self, value):
        """Set the initial set and bump its version counter."""
        self._initial_safe_set = (None if value is None
                                  else tracked_mask(value))
        self._initial_set_version += 1

    @property
    def certificate_margin(self):
        """Active conservatism margin for safety comparisons.

        The per-instance value when one was passed to the constructor
        (or assigned), else ``config.certificate_margin``. Either a
        scalar, or a per-grid-point ``(nindex,)`` array (installed by
        ``errorbounds.analytic_certificate_margin(per_point=True)``)
        that tightens each state's comparison by ITS derived bound
        instead of the grid-wide worst case.
        """
        if self._certificate_margin is not None:
            return self._certificate_margin
        return float(getattr(config, "certificate_margin", 0.0))

    @certificate_margin.setter
    def certificate_margin(self, value):
        """Set (or with ``None`` clear) the per-instance margin.

        Direct assignment clears any recorded derivation unit: the
        caller takes responsibility for the margin covering whichever
        pipeline consumes it. A 1-D array installs per-grid-point
        margins (must have ``discretization.nindex`` entries, grid
        order).
        """
        if value is None:
            self._certificate_margin = None
        elif np.ndim(value):
            arr = np.asarray(value, dtype=np.float64)
            if arr.shape != (self.discretization.nindex,):
                raise ValueError(
                    "per-point certificate_margin must be a "
                    "(nindex,) array in grid order")
            self._certificate_margin = arr
        else:
            self._certificate_margin = float(value)
        self._certificate_margin_unit = None

    @property
    def level_margin(self):
        """Conservatism margin for the level comparison ``v < v_bad``.

        Guards the certified-level cut against f32 rounding of the
        Lyapunov values themselves (the decrease margin guards the
        decrease comparison). Per-instance value if set, else
        ``config.level_margin``.
        """
        if self._level_margin is not None:
            return self._level_margin
        return float(getattr(config, "level_margin", 0.0))

    @level_margin.setter
    def level_margin(self, value):
        """Set (or with ``None`` clear) the per-instance level margin."""
        self._level_margin = None if value is None else float(value)

    @property
    def exploration_margin(self):
        """Dedicated exploration-certificate margin (or ``None``)."""
        return self._exploration_margin

    @exploration_margin.setter
    def exploration_margin(self, value):
        """Set the exploration margin; clears its derivation unit."""
        self._exploration_margin = (None if value is None
                                    else float(value))
        self._exploration_margin_unit = None

    def _require_f32_margin(self):
        """Refuse to run the plain pipeline under a finer-unit margin.

        A margin derived at ``unit_roundoff < eps(dtype)/2`` (e.g. the
        extended double-word pipeline's ``U_EFF``) bounds only THAT
        pipeline's rounding; consuming it from the plain config-dtype
        sweep would certify states whose exact decrease condition
        fails. The comparison is against the CONSUMER's unit at check
        time — under float64 (``jax_enable_x64``) the plain sweep runs
        at eps64/2, so an analytic margin derived there validly covers
        it. Margins with no recorded unit (empirical calibration,
        manual assignment, ``config`` defaults) pass — their coverage
        is the installer's documented contract.
        """
        unit = getattr(self, "_certificate_margin_unit", None)
        consumer = float(np.finfo(config.np_dtype).eps) / 2
        if unit is not None and unit < consumer:
            raise RuntimeError(
                "certificate_margin was derived at unit roundoff "
                f"{unit:.2e} (the extended double-word pipeline); it "
                "cannot cover the plain sweep's rounding at unit "
                f"{consumer:.2e}. Run update_safe_set(extended=True), "
                "or install a plain-pipeline margin (oracle.calibrate_"
                "certificate_margin / errorbounds.analytic_certificate"
                "_margin).")

    def lipschitz_dynamics(self, states):
        """Global or local dynamics Lipschitz constant.

        (reference ``lyapunov.py:227-244``)."""
        return _eval_lipschitz(self._lipschitz_dynamics, states)

    def lipschitz_lyapunov(self, states):
        """Global or local Lyapunov Lipschitz constant.

        (reference ``lyapunov.py:246-263``)."""
        return _eval_lipschitz(self._lipschitz_lyapunov, states)

    def threshold(self, states, tau=None):
        """Safety threshold ``-L_v (1 + L_f) tau``.

        (reference ``lyapunov.py:265-288``)."""
        tau = self.tau if tau is None else tau
        return _threshold(self._lipschitz_lyapunov,
                          self._lipschitz_dynamics, states, tau)

    def is_safe(self, state):
        """Whether states lie in the current safe set.

        (reference ``lyapunov.py:290-303``)."""
        idx = np.asarray(self.discretization.state_to_index(state))
        return self.safe_set[idx]

    def _device_points(self):
        """Device-resident copy of the static grid, keyed on the mesh.

        Uploading the grid per call costs 108 MB of H2D at 51^4; a mesh
        change re-shards instead of silently reusing the old placement."""
        pts = getattr(self, "_points_dev", None)
        if pts is None or getattr(self, "_points_mesh", None) is not \
                self.mesh:
            pts = self.discretization.all_points
            if (self.mesh is not None
                    and pts.shape[0] % int(self.mesh.devices.size) == 0):
                # Shard only when the mesh divides the grid; otherwise
                # keep the copy replicated (correct either way — XLA
                # still partitions the sweep internally). put_global is
                # a plain device_put on single-process meshes and the
                # per-process shard-callback path on multi-host ones.
                from jax.sharding import NamedSharding, PartitionSpec
                from .parallel.distributed import put_global

                axis = self.mesh.axis_names[0]
                pts = put_global(
                    np.asarray(pts, dtype=config.np_dtype),
                    NamedSharding(self.mesh, PartitionSpec(axis, None)))
            else:
                pts = jnp.asarray(pts)
            self._points_dev = pts
            self._points_mesh = self.mesh
        return pts

    def _direct_grid_values(self):
        """Vertex values of a PWL candidate defined on THIS grid.

        A :class:`~safe_learning_tpu.Triangulation` whose discretization
        equals the verification grid has ``v(grid) == parameters``
        exactly — reading them directly skips one corner-table row
        gather per grid point (the measured ~13.4 ns/row random-access
        floor; at 51^4 that is ~90 ms per sweep). Returns ``None`` for
        every other candidate.
        """
        from .functions.simplex import Triangulation

        lf = self.lyapunov_function
        if (isinstance(lf, Triangulation) and lf.output_dim == 1
                and lf.discretization == self.discretization):
            return lf.parameters.reshape(-1)
        return None

    def update_values(self, batch_size=None):
        """Re-evaluate ``v`` on the whole grid.

        (reference ``lyapunov.py:305-322``)."""
        direct = self._direct_grid_values()
        if direct is not None:
            self.values = direct
            return
        grid = self.discretization
        points = grid.all_points
        batch = batch_size or max(int(config.gp_batch_size), 1)
        fused_limit = max(batch,
                          int(getattr(config, "fused_sweep_limit", 0)))
        if batch_size is None and grid.nindex <= fused_limit:
            # One device pass; keep the result device-resident (host
            # consumers convert lazily). Multi-process meshes allgather
            # to the host right away: a global array's value is not
            # addressable from any single process.
            vals = _values_batch(self.lyapunov_function,
                                 self._device_points())
            if self.mesh is not None:
                from .parallel.distributed import (fetch_global,
                                                   is_multiprocess_mesh)

                if is_multiprocess_mesh(self.mesh):
                    vals = fetch_global(vals)
            self.values = vals
            return
        fun = _values_batch
        out = np.empty(grid.nindex, dtype=points.dtype)
        for i in range(0, grid.nindex, batch):
            chunk = points[i:i + batch]
            pad = batch - len(chunk)
            if pad:
                chunk = np.vstack([chunk, np.broadcast_to(chunk[-1:],
                                                          (pad,
                                                           grid.ndim))])
            vals = np.asarray(fun(self.lyapunov_function, chunk))
            out[i:i + batch] = vals[:len(points[i:i + batch])]
        self.values = out

    def v_decrease_confidence(self, states, next_states):
        """Mean decrease + error bound (reference ``lyapunov.py:324-354``)."""
        if isinstance(next_states, (tuple, list)):
            next_states, error = next_states
            lv = _as_column_batch(self.lipschitz_lyapunov(next_states))
            bound = jnp.sum(lv * error, axis=1, keepdims=True)
        else:
            bound = jnp.zeros((), dtype=config.dtype)
        v_decrease = (self.lyapunov_function(next_states).reshape(-1, 1)
                      - self.lyapunov_function(states).reshape(-1, 1))
        return v_decrease, bound

    def v_decrease_bound(self, states, next_states):
        """Upper bound on the decrease (reference ``lyapunov.py:356-376``)."""
        v_dot, error = self.v_decrease_confidence(states, next_states)
        return v_dot + error

    def safety_constraint(self, policy, include_initial=True):
        """Pointwise safety constraint for a policy's actions on the grid.

        (reference ``lyapunov.py:378-405``)."""
        points = jnp.asarray(self.discretization.all_points)
        actions = as_deterministic(policy)(points)
        prediction = self.dynamics(points, actions)
        bound = self.v_decrease_bound(points, prediction)
        negative = np.array(
            jnp.squeeze(bound < self.threshold(points), axis=1))
        if include_initial and self.initial_safe_set is not None:
            negative |= self.initial_safe_set
        return negative

    # ------------------------------------------------------------------
    def _get_extended_sweep(self):
        """Build (or reuse) the double-word sweep for the current model.

        Keyed on the model objects' identities and the GP data count, so
        online learning (``dynamics`` replaced by ``add_data_point``)
        rebuilds the parameter snapshot while the compiled pipeline is
        reused across instances with the same structure.
        """
        from .ops.extended_verify import ExtendedSweep

        lf = self._lipschitz_dynamics
        try:
            # Any real scalar (python float, int, numpy scalar) keys by
            # value so value-equal reassignments reuse the sweep.
            lf_key = float(lf)
        except (TypeError, ValueError):
            lf_key = id(lf)

        def _matrix_key(m, slot):
            # The L_v / L_f linear-form models are baked into the
            # compiled sweep; key them by VALUE so replacing either
            # matrix rebuilds instead of silently certifying with the
            # stale model. The O(size) byte dump is cached on the
            # attribute object's identity — recomputed only when the
            # matrix object itself is swapped, not per sweep call.
            if m is None:
                return None
            cached = self._ext_matrix_keys.get(slot)
            if cached is not None and cached[0] is m:
                return cached[1]
            arr = np.asarray(m)
            key_m = (arr.shape, str(arr.dtype), arr.tobytes())
            self._ext_matrix_keys[slot] = (m, key_m)
            return key_m

        key = (id(self.dynamics), int(getattr(self.dynamics, "count", -1)),
               id(self.policy), id(self.lyapunov_function),
               id(self._lipschitz_lyapunov),
               lf_key, self.tau,
               _matrix_key(self.extended_lv_matrix, "lv"),
               _matrix_key(self.extended_lf_matrix, "lf"))
        if self._ext_sweep is None or self._ext_sweep_key != key:
            self._ext_sweep = ExtendedSweep(
                self, lv_matrix=self.extended_lv_matrix,
                lf_matrix=self.extended_lf_matrix)
            self._ext_sweep_key = key
            # Hold strong references to the keyed objects: the key
            # stores ids, and a freed model object's id can be reused
            # by a NEW object (the stale-cache hazard the safe-set
            # caches guard with content hashes elsewhere).
            self._ext_sweep_refs = (self.dynamics, self.policy,
                                    self.lyapunov_function,
                                    self._lipschitz_lyapunov,
                                    self._lipschitz_dynamics)
        return self._ext_sweep

    def _get_hybrid_band_margin(self):
        """Per-point f32 band margin for the hybrid sweep (cached).

        A manually installed :attr:`hybrid_band_margin` wins; otherwise
        the derived array is cached on the extended sweep's structure
        key (model changes re-derive it).
        """
        if self.hybrid_band_margin is not None:
            return self.hybrid_band_margin
        from .ops.extended_verify import hybrid_band_margin

        key = self._ext_sweep_key
        if self._auto_band_margin is None or self._auto_band_key != key:
            self._auto_band_margin = hybrid_band_margin(
                self, lv_matrix=self.extended_lv_matrix)
            self._auto_band_key = key
        return self._auto_band_margin

    def _hybrid_negative(self, ext_sweep, states, m_ext, m_band, tau,
                         shard, to_host, pad_unit, states_dev=None,
                         n_valid=None):
        """Two-pass decrease verdicts for one host batch of states.

        Pass 1 runs the plain f32 pipeline and keeps every verdict
        whose computed ``decrease - threshold`` clears the band
        ``m_band + 2 m_ext`` on either side; pass 2 re-checks only the
        remaining ambiguity band with the double-word pipeline. The
        returned mask is IDENTICAL to a full extended sweep's: with
        ``|diff32 - exact| <= m_band`` (the derived f32 bound; the
        on-device ``two_sum(dec, -thr)`` pair is the exact difference)
        and ``|diff_dw - exact| <= m_ext``,

        - ``diff32 < -(m_band + 2 m_ext)`` forces ``exact < -2 m_ext``
          and hence ``diff_dw < -m_ext`` (the extended PASS verdict);
        - ``diff32 >= m_band + 2 m_ext`` forces ``exact >= 2 m_ext``
          and hence ``diff_dw >= m_ext`` (the extended FAIL verdict);
        - band points take the extended verdict verbatim.

        The band classification happens ON DEVICE (exact double-word
        compares), so only two boolean masks cross back to the host —
        transferring the f32 decrease/threshold grids per batch cost
        ~0.8 s/Mpoint through the TPU relay, ~5x the plain sweep
        itself (measured, ``benchmarks/hybrid_sweep_bench.py``).

        Returns ``(negative, n_band)``.
        """
        n = len(states)
        m_ext64 = np.broadcast_to(np.asarray(m_ext, np.float64), (n,))
        width = (np.broadcast_to(np.asarray(m_band, np.float64), (n,))
                 + 2.0 * m_ext64)
        # The (hi, lo) f32 split reproduces the f64 width to ~2^-48
        # relative; inflate so the representable band can only widen.
        w64 = width * (1.0 + 2.0 ** -40)
        if np.ndim(m_band) == 0 and np.ndim(m_ext) == 0:
            w64 = w64[:1].reshape(())  # scalar width: no H2D per batch
        w_hi = w64.astype(np.float32)
        w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
        neg_dev, band_dev = _hybrid_filter_batch(
            self.policy, self.dynamics, self.lyapunov_function,
            self._lipschitz_lyapunov, self._lipschitz_dynamics, tau,
            shard(states) if states_dev is None else states_dev,
            w_hi, w_lo)
        negative = np.array(to_host(neg_dev))
        band = np.array(to_host(band_dev))
        if n_valid is not None and n_valid < n:
            # Padded tail rows duplicate the last valid state; the
            # caller discards their verdicts, so routing them through
            # the double-word re-check would only inflate
            # last_band_fraction and burn extended-pipeline work.
            band[n_valid:] = False
        n_band = int(band.sum())
        if n_band:
            bstates = states[band]
            bmargin = m_ext64[band]
            # The pass-1 batch can be fused-sweep-sized (plain-pipeline
            # memory); the double-word re-check cannot — chunk the band
            # at gp_batch_size, each chunk padded to a power-of-two
            # multiple of the mesh unit (bounded compile count).
            cap = max(int(config.gp_batch_size), pad_unit)
            verdicts = np.empty(n_band, dtype=bool)
            for j in range(0, n_band, cap):
                hi = min(j + cap, n_band)
                bucket = pad_unit
                while bucket < hi - j:
                    bucket *= 2
                chunk = bstates[j:hi]
                mchunk = bmargin[j:hi]
                if bucket > hi - j:
                    chunk = np.vstack([
                        chunk, np.broadcast_to(chunk[-1:],
                                               (bucket - (hi - j),
                                                states.shape[1]))])
                    mchunk = np.concatenate([
                        mchunk, np.broadcast_to(mchunk[-1:],
                                                (bucket - (hi - j),))])
                verdicts[j:hi] = to_host(ext_sweep.negative_batch(
                    shard(chunk), tau=tau, margin=mchunk))[:hi - j]
            negative[band] = verdicts
        return negative, n_band

    def update_safe_set(self, can_shrink=True, max_refinement=1,
                        safety_factor=1.0, parallel_iterations=None,
                        batch_size=None, extended=False):
        """Compute the largest certified level set and update ``safe_set``.

        TPU formulation of reference ``lyapunov.py:407-606``: grid points
        are processed in value-sorted order in large fused device batches;
        the certified level is the value at the end of the longest verified
        prefix. Optional adaptive refinement re-checks failing states on
        ``max_refinement^d`` sub-grids at ``tau / max_refinement`` (see
        :func:`_refined_negative_batch` for why full-R beats the
        reference's per-state ``N(x)``).

        ``parallel_iterations`` and ``safety_factor`` are accepted for
        reference-API compatibility and ignored (the former tuned
        ``tf.map_fn``; the latter inflated the reference's ``N(x)``
        formula, which the sound full-R check supersedes). Passing a
        non-default value raises a one-time ``RuntimeWarning`` so ported
        reference code is not silently reinterpreted.

        ``extended=True`` runs the decrease checks in double-word
        float32 arithmetic (``ops/extended_verify``, ~2^-45 effective
        precision) so the instance's ``certificate_margin`` can be the
        tiny derived ``extended_certificate_margin`` instead of an
        f32-scale one — the rigorous option on ill-conditioned
        instances. The level comparison still uses the f32-stored
        values, so ``level_margin`` stays at f32 scale.

        ``extended="hybrid"`` delivers the IDENTICAL extended-rigor
        certificate at near-plain-f32 cost: a plain f32 pass with the
        derived f32 band margin decides every point whose computed
        ``decrease - threshold`` clears the band on either side, and
        only the ambiguity band (a sliver of the grid on
        well-conditioned instances) is re-checked by the double-word
        pipeline (see :meth:`_hybrid_negative` for the identity
        argument; band incidence is reported in
        :attr:`last_band_fraction`). Requires the same extended margin
        installation as ``extended=True`` plus an f32 band margin
        (auto-derived via ``ops.extended_verify.hybrid_band_margin``,
        or installed manually as :attr:`hybrid_band_margin`). Adaptive
        refinement re-checks go straight to the extended pipeline
        (they only cover the failing suffix).
        """
        if safety_factor != 1.0 or parallel_iterations is not None:
            import warnings

            warnings.warn(
                "safety_factor/parallel_iterations are accepted for "
                "reference-API compatibility but have no effect: the "
                "adaptive check always re-verifies failing cells on the "
                "full max_refinement^d sub-grid (sound and stronger "
                "than the reference's safety_factor-scaled N(x); see "
                "Lyapunov.update_safe_set docs)", RuntimeWarning,
                stacklevel=2)
        del parallel_iterations, safety_factor
        grid = self.discretization
        nindex = grid.nindex
        batch = batch_size or max(int(config.gp_batch_size), 1)

        if extended not in (False, True, "hybrid"):
            raise ValueError(
                "extended must be False, True, or 'hybrid'; got "
                f"{extended!r}")
        hybrid = extended == "hybrid"
        ext_sweep = self._get_extended_sweep() if extended else None
        band_margin = self._get_hybrid_band_margin() if hybrid else None
        if not extended:
            self._require_f32_margin()

        fused_limit = max(batch,
                          int(getattr(config, "fused_sweep_limit", 0)))
        if not self.adaptive and nindex <= fused_limit and not extended:
            return self._update_safe_set_fused(can_shrink)
        if (self.adaptive or hybrid) and batch_size is None:
            # One device pass for the main decrease check when the grid
            # fits; the batched loop below then only iterates once and
            # the chunked refinement (adaptive) / chunked band re-check
            # (hybrid, see _hybrid_negative) handles the small subset —
            # pass-1 at gp_batch_size cost 16 relay round trips per
            # Mpoint where the plain mode runs one fused program.
            batch = max(batch, min(nindex, fused_limit))
        # Round the batch UP to a multiple of 256 (lane-friendly) and of
        # the mesh's grid-axis size (jax.device_put rejects a sharded
        # axis the device count does not divide — e.g. a 6-device mesh),
        # capped at the grid size rounded the same way (no huge padding).
        unit = 256
        if self.mesh is not None:
            import math

            unit = math.lcm(256, int(self.mesh.devices.size))
        batch = -(-min(batch, nindex) // unit) * unit

        multiproc = False
        if self.mesh is not None:
            from .parallel.distributed import (fetch_global,
                                               is_multiprocess_mesh,
                                               put_global)

            # The extended (double-word) pipeline is pure SPMD
            # arithmetic: its batches shard through the same
            # put_global/fetch_global path as the plain sweep (verified
            # bit-equal to single-process by
            # scripts/multiprocess_dryrun.py's extended phase).
            multiproc = is_multiprocess_mesh(self.mesh)

        def _shard(states_dev):
            """Shard a batch over the active mesh's grid axis (SPMD:

            the decrease check is per-point; reductions ride the ICI).
            Multi-process meshes go through the callback path — every
            process holds the same host batch and fills only its own
            shards (plain device_put cannot address remote devices)."""
            if self.mesh is None:
                return jnp.asarray(states_dev)
            from .parallel.mesh import grid_sharding

            sharding = grid_sharding(self.mesh, 2)
            if multiproc:
                return put_global(states_dev, sharding)
            return jax.device_put(jnp.asarray(states_dev), sharding)

        def _to_host(x):
            """Materialize a sweep verdict on the host (allgather when
            the mesh spans processes; plain copy otherwise)."""
            return fetch_global(x) if multiproc else np.asarray(x)

        # Refresh v on the grid first: the fused path recomputes values
        # inside its program, so the batched/adaptive path must not rank
        # states (or report c_max) from values of a superseded candidate
        # while _negative_batch evaluates the current one.
        self.update_values()
        values = np.asarray(self.values)
        order = np.argsort(values, kind="stable")
        all_points = grid.all_points

        initial = (self.initial_safe_set
                   if self.initial_safe_set is not None
                   else np.zeros(nindex, dtype=bool))
        # Plain-ndarray copies: .copy() of a TrackedMask shares the
        # mutation counter, so the |= below would spuriously invalidate
        # the device caches keyed on initial_safe_set.mutations.
        prev_safe = np.array(self.safe_set)

        # Points that count as safe without passing the decrease check.
        exempt = np.array(initial)
        if not can_shrink:
            exempt |= prev_safe
        exempt_sorted = exempt[order]

        refinement_sorted = np.zeros(nindex, dtype=int)
        tau = self.tau
        margin = self.certificate_margin
        # Per-point margins ride next to the states through the same
        # value-order gather and padding.
        margin_sorted = (np.asarray(margin)[order] if np.ndim(margin)
                         else None)
        band_sorted = (np.asarray(band_margin)[order]
                       if hybrid and np.ndim(band_margin) else None)
        band_total = 0
        n_checked = 0

        def _pad_tail(arr, n):
            if len(arr) >= n:
                return arr
            return np.concatenate(
                [arr, np.broadcast_to(arr[-1:], (n - len(arr),))])

        # Device cache of the value-sorted padded grid batches. The
        # batched sweeps are H2D-bound through the TPU relay (measured
        # ~0.5 s to re-upload the 1M-point grid vs ~3 ms of kernel),
        # and the sorted states depend only on (values, batch) — reuse
        # them across sweeps while neither changes. Capped at 2^21
        # points so giant streamed sweeps do not pin the grid in HBM.
        batch_dev_cache = None
        if nindex <= 2 ** 21:
            import hashlib

            cache_key = (hashlib.sha1(values.tobytes()).hexdigest(),
                         batch, nindex, id(self.mesh))
            cached = getattr(self, "_sorted_batch_cache", None)
            if cached is None or cached[0] != cache_key:
                # The held mesh reference keeps id(self.mesh) from
                # being reused by a NEW mesh while the key lives.
                cached = (cache_key, {}, self.mesh)
                self._sorted_batch_cache = cached
            batch_dev_cache = cached[1]

        def _batch_dev(i, states):
            if batch_dev_cache is None:
                return _shard(states)
            dev = batch_dev_cache.get(i)
            if dev is None:
                dev = _shard(states)
                batch_dev_cache[i] = dev
            return dev

        unit_maxes = jnp.asarray(grid.unit_maxes, dtype=config.dtype)

        max_index = -1  # last sorted position of the verified prefix
        for i in range(0, nindex, batch):
            idx = order[i:i + batch]
            n_valid = len(idx)
            states = all_points[idx]
            if n_valid < batch:
                states = np.vstack([
                    states,
                    np.broadcast_to(states[-1:], (batch - n_valid,
                                                  grid.ndim))])
            m_b = (margin if margin_sorted is None
                   else _pad_tail(margin_sorted[i:i + batch], batch))
            # Only the boolean verdict comes back to the host (the
            # decrease/threshold outputs exist for diagnostics callers;
            # transferring them here would add two f32 grid-sized D2H
            # copies per batch — except the hybrid pass, which needs
            # them for its band filter).
            if hybrid:
                band_b = (band_margin if band_sorted is None
                          else _pad_tail(band_sorted[i:i + batch],
                                         batch))
                negative, n_band = self._hybrid_negative(
                    ext_sweep, states, m_b, band_b, tau, _shard,
                    _to_host, unit, states_dev=_batch_dev(i, states),
                    n_valid=n_valid)
                band_total += n_band
            elif ext_sweep is not None:
                negative = _to_host(ext_sweep.negative_batch(
                    _batch_dev(i, states), tau=tau, margin=m_b))
            else:
                negative = _to_host(_negative_batch(
                    self.policy, self.dynamics, self.lyapunov_function,
                    self._lipschitz_lyapunov, self._lipschitz_dynamics,
                    tau, _batch_dev(i, states), m_b)[0])
            negative = negative[:n_valid]
            n_checked += n_valid
            safe_b = negative | exempt_sorted[i:i + n_valid]
            refinement_sorted[i:i + n_valid][safe_b] = 1

            if safe_b.all():
                max_index = i + n_valid - 1
                continue

            bound = int(np.argmin(safe_b))  # first failing position
            refine_bound = 0

            if self.adaptive and max_refinement > 1:
                # Every failing point in the suffix is re-checked on the
                # full R^d sub-grid at tau / R (sound, and strictly
                # stronger than the reference's N(x) gating — see
                # _refined_negative_batch). safety_factor only tuned the
                # reference's N(x) formula and no longer has an effect.
                stop = n_valid - bound
                if stop > 0:
                    # Sub-grids blow the point count up by R^d; chunk the
                    # refinable suffix so each dispatch stays near `batch`
                    # evaluated points.
                    chunk = max(64, batch // int(max_refinement) ** grid.ndim)
                    if self.mesh is not None:
                        # Mesh divisibility; unsharded sweeps keep the
                        # small chunk (R^d inflates memory per point).
                        chunk = -(-chunk // unit) * unit
                    refine_bound = 0
                    for j in range(0, stop, chunk):
                        hi = min(j + chunk, stop)
                        check_states = states[bound + j:bound + hi]
                        m_chunk = (margin if margin_sorted is None
                                   else _pad_tail(
                                       np.asarray(m_b)[bound + j:
                                                       bound + hi],
                                       chunk))
                        pad = chunk - (hi - j)
                        if pad:
                            check_states = np.vstack([
                                check_states,
                                np.broadcast_to(check_states[-1:],
                                                (pad, grid.ndim))])
                        if ext_sweep is not None:
                            refined = _to_host(
                                ext_sweep.refined_negative_batch(
                                    _shard(check_states),
                                    int(max_refinement),
                                    margin=m_chunk))[:hi - j]
                        else:
                            refined = _to_host(_refined_negative_batch(
                                self.policy, self.dynamics,
                                self.lyapunov_function,
                                self._lipschitz_lyapunov,
                                self._lipschitz_dynamics,
                                tau, _shard(check_states),
                                unit_maxes, int(max_refinement),
                                grid.ndim, margin=m_chunk))[:hi - j]
                        # A state passes if its COARSE check passed (the
                        # suffix beyond the first failure contains such
                        # states — their tau-level certificate stands;
                        # the refined sub-grid test is a different
                        # sufficient condition they need not satisfy),
                        # if it is exempt (initial set; previous safe
                        # set when can_shrink=False; reference
                        # lyapunov.py:545-548 marks both N=1), or if the
                        # refined check rescues it.
                        coarse_seg = safe_b[bound + j:bound + hi]
                        refined = (refined | coarse_seg
                                   | exempt_sorted[i + bound + j:
                                                   i + bound + hi])
                        seg_ok = (len(refined) if refined.all()
                                  else int(np.argmin(refined)))
                        # Refined-only rescues get N = R; coarse passes
                        # keep N = 1.
                        ok_abs = slice(i + bound + j,
                                       i + bound + j + seg_ok)
                        refinement_sorted[ok_abs] = np.where(
                            coarse_seg[:seg_ok], 1, int(max_refinement))
                        refine_bound += seg_ok
                        if seg_ok < hi - j:
                            break

                max_index = i + bound + refine_bound - 1
                if refine_bound < stop:
                    break
                # The whole failing suffix was rescued by refinement.
                continue

            max_index = i + bound - 1
            break

        if hybrid:
            self.last_band_fraction = band_total / max(n_checked, 1)

        # Level-comparison guard, mirroring _fused_update: trim the
        # certified prefix so no state within level_margin of the first
        # failing state's value is certified (f32 value rounding could
        # otherwise admit a state the exact level cut excludes).
        level_margin = self.level_margin
        if level_margin > 0.0 and 0 <= max_index < nindex - 1:
            v_bad = values[order[max_index + 1]]
            trimmed = int(np.searchsorted(values[order],
                                          v_bad - level_margin,
                                          side="left")) - 1
            max_index = min(max_index, trimmed)

        # Certified level set (deviation: -inf instead of the reference's
        # wrapped index when nothing verifies, lyapunov.py:589-595).
        if max_index >= 0:
            self.c_max = float(values[order[max_index]])
        else:
            self.c_max = -np.inf

        safe = np.zeros(nindex, dtype=bool)
        safe[order[:max_index + 1]] = True
        refinement = np.zeros(nindex, dtype=int)
        refinement[order] = refinement_sorted
        refinement[~safe] = 0
        if not can_shrink:
            safe |= prev_safe
            refinement[prev_safe & (refinement == 0)] = \
                np.maximum(self._refinement[prev_safe & (refinement == 0)],
                           1)
        if self.initial_safe_set is not None:
            safe |= initial
            refinement[initial] = np.maximum(refinement[initial], 1)

        self.safe_set = safe
        self._refinement = refinement

    def _update_safe_set_fused(self, can_shrink):
        """Whole-grid single-program path (non-adaptive grids).

        Optionally SPMD over ``self.mesh``: the grid-point axis is sharded
        across devices and XLA inserts the collectives for the sort and
        the prefix reduction.
        """
        grid = self.discretization
        nindex = grid.nindex
        if self.mesh is not None:
            from .parallel.distributed import (is_multiprocess_mesh,
                                               sharded_certified_level)

            if is_multiprocess_mesh(self.mesh):
                # Plain device_put cannot address remote devices; the
                # multi-host fused form builds its global arrays from
                # per-process shard callbacks.
                sharded_certified_level(self, self.mesh,
                                        can_shrink=can_shrink)
                return
        initial = (self.initial_safe_set
                   if self.initial_safe_set is not None
                   else np.zeros(nindex, dtype=bool))
        # Plain copies — see the matching note in the adaptive sweep:
        # TrackedMask.copy() shares the counter and the |= would bump it.
        prev_safe = np.array(self.safe_set)
        exempt = np.array(initial)
        if not can_shrink:
            exempt |= prev_safe

        points = self._device_points()
        # The exempt mask is static across sweeps when it is just the
        # initial set (can_shrink=True, the common loop): cache its device
        # copy next to the grid (saves an H2D upload per sweep — ~7 MB
        # at 51^4).
        cacheable = can_shrink
        key = (id(self.initial_safe_set), self._initial_set_version,
               getattr(self.initial_safe_set, "mutations", None),
               self.mesh)
        exempt_dev = (getattr(self, "_exempt_dev", None)
                      if cacheable and getattr(self, "_exempt_key",
                                               None) == key
                      else None)
        if exempt_dev is None:
            exempt_dev = jnp.asarray(exempt)
            if (self.mesh is not None
                    and exempt_dev.shape[0]
                    % int(self.mesh.devices.size) == 0):
                # Same divisibility guard as _device_points: meshes that
                # do not divide the grid keep the mask replicated.
                from jax.sharding import NamedSharding, PartitionSpec

                axis = self.mesh.axis_names[0]
                exempt_dev = jax.device_put(
                    exempt_dev,
                    NamedSharding(self.mesh, PartitionSpec(axis)))
            if cacheable:
                self._exempt_dev = exempt_dev
                self._exempt_key = key

        safe_dev, c_max, values, any_safe = _fused_update(
            self.policy, self.dynamics, self.lyapunov_function,
            self._lipschitz_lyapunov, self._lipschitz_dynamics, self.tau,
            points, exempt_dev, self.certificate_margin,
            self.level_margin, self._direct_grid_values())

        # Keep the values device-resident: consumers that need them on
        # the host (sorting, checkpoints) convert lazily, and fused
        # re-sweeps never pay the D2H transfer (27 MB at 1M points).
        self.values = values
        # One combined D2H for the three host-needed outputs: separate
        # np.array/float/bool conversions each block on their own relay
        # round trip (~100-300 ms apiece on this machine's tunnel).
        safe, c_max, any_safe = jax.device_get((safe_dev, c_max, any_safe))
        safe = np.array(safe)  # device_get may return read-only views
        self.c_max = float(c_max) if bool(any_safe) else -np.inf
        refinement = np.where(safe, 1, 0)

        if not can_shrink:
            safe |= prev_safe
            keep = prev_safe & (refinement == 0)
            refinement[keep] = np.maximum(self._refinement[keep], 1)
        if self.initial_safe_set is not None:
            safe |= initial
            refinement[initial] = np.maximum(refinement[initial], 1)
        self.safe_set = safe
        self._refinement = refinement


def smallest_boundary_value(fun, discretization):
    """Smallest value of ``fun`` on the discretization boundary.

    (reference ``lyapunov.py:22-56``)."""
    fun = as_deterministic(fun)
    min_value = np.inf
    for i in range(discretization.ndim):
        axes = list(discretization.discrete_points)
        axes[i] = axes[i][[0, -1]]
        mesh = np.meshgrid(*axes, indexing="ij")
        points = np.column_stack([col.ravel() for col in mesh])
        smallest = float(jnp.min(fun(jnp.asarray(points))))
        min_value = min(min_value, smallest)
    return min_value


def get_lyapunov_region(lyapunov, discretization, init_node,
                        use_native=None):
    """Region on which a function decreases monotonically toward a point.

    Priority-queue flood fill from ``init_node`` in increasing-value order,
    stopping at the domain boundary or at non-monotonicity (reference
    ``lyapunov.py:59-139``; also fixes its py2-only ``tiebreaker.next()``
    bug at ``lyapunov.py:101``). The values are evaluated on device; the
    inherently sequential heap expansion runs in the native C++ extension
    (``native/flood_fill.cpp``) when a compiler is available, else in
    Python. ``use_native=False`` forces the Python path.
    """
    fun = as_deterministic(lyapunov)
    values = np.asarray(fun(jnp.asarray(discretization.all_points)))
    lyapunov_values = values.reshape(discretization.shape)

    if use_native is None or use_native:
        from .native import flood_fill

        flat_init = int(np.ravel_multi_index(tuple(init_node),
                                             discretization.shape))
        native = flood_fill(lyapunov_values, discretization.shape,
                            flat_init)
        if native is not None:
            return native
        if use_native:
            raise RuntimeError("native flood fill unavailable")

    init_node = tuple(init_node)
    init_value = lyapunov_values[init_node]
    ndim = discretization.ndim
    num_points = np.asarray(discretization.shape)

    neighbor_offsets = np.array(
        list(itertools.product(*[(0, -1, 1)] * ndim))[1:])

    visited = np.zeros(discretization.shape, dtype=bool)
    visited[init_node] = True

    tiebreaker = itertools.count()
    last_value = init_value
    priority_queue = [(init_value, next(tiebreaker), np.asarray(init_node))]

    while priority_queue:
        value, _, node = heapq.heappop(priority_queue)
        if np.any(node == 0) or np.any(node == num_points - 1):
            visited[tuple(node)] = False
            break
        if value < last_value:
            break
        last_value = value

        neighbors = node + neighbor_offsets
        keys = tuple(neighbors.T)
        is_new = ~visited[keys]
        neighbors = neighbors[is_new]
        if neighbors.size:
            keys = tuple(neighbors.T)
            visited[keys] = True
            for val, neighbor in zip(lyapunov_values[keys], neighbors):
                heapq.heappush(priority_queue,
                               (val, next(tiebreaker), neighbor))

    for _, _, node in priority_queue:
        visited[tuple(node)] = False

    return visited
