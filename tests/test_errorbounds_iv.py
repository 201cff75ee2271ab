"""Realization-level fuzz of the ``_iv_*`` interval scaffolding.

``errorbounds`` documents a contract for its ``(value, error)`` pairs
(errorbounds.py, "Interval scaffolding"): ``e`` bounds
``|y_any - y_exact|`` for ANY realization rounding at ``u`` per op,
evaluated at any input within the tracked input uncertainty, against
the exact-real-arithmetic value of the stored parameters — and every
rule preserves the anchor invariant ``|y_any| <= |v| + 2 e``.

These tests CHECK that contract directly: they run the same programs
twice in float64 — once cleanly (standing in for the anchor chain,
whose own roundoff at 2^-53 is far inside any modeled ``u``) and once
with per-op relative perturbations drawn at the FULL budget
``u = 2^-8`` — and assert the propagated ``e`` dominates the measured
deviation. The random fuzz alone does NOT discriminate the
pre-round-4 single-``e`` activation anchor (verified: 0/8 seeds) —
the violation needs the anchor at one edge of the input uncertainty
and the realization at the other, simultaneously with coherent ``+u``
rounding — so ``test_directed_corner_anchor_realization_split``
constructs that corner explicitly and does fail against the old rule.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from safe_learning_tpu.errorbounds import (  # noqa: E402
    _gamma, _iv_activation, _iv_add, _iv_const_mul, _iv_cos, _iv_div,
    _iv_matmul, _iv_mul, _iv_sin)

U = 2.0 ** -8  #: per-op rounding budget for the fuzz (deliberately huge)


def _rel(rng, shape):
    """A worst-case-leaning relative perturbation factor ``(1 + d)``.

    Half the draws sit exactly on the budget boundary ``|d| = u`` —
    the adversarial corner a uniform draw almost never hits.
    """
    d = rng.uniform(-U, U, shape)
    edge = rng.random(shape) < 0.5
    return 1.0 + np.where(edge, np.sign(d + 1e-300) * U, d)


class _Chain:
    """Paired exact / perturbed-realization / interval evaluation."""

    def __init__(self, rng, x_exact, e0):
        self.rng = rng
        self.exact = x_exact
        # The realization and the anchor are BOTH just realizations:
        # each may sit anywhere within e0 of the exact input.
        self.any = x_exact + e0 * rng.uniform(-1, 1, x_exact.shape)
        anchor = x_exact + e0 * rng.uniform(-1, 1, x_exact.shape)
        self.iv = (jnp.asarray(anchor), jnp.full(x_exact.shape, e0))

    def _arg_reduction(self):
        """Argument-reduction perturbation of a trig realization.

        Both consumers reduce the argument against an approximate pi:
        an ABSOLUTE error in the reduced argument scaling with ``|x|``,
        at a unit at most ``u / 2`` (df_sin's Cody-Waite residual is
        ``2^-49.6 |x|`` vs ``U_EFF = 2^-45``; f32 ``jnp.sin`` reduction
        rounds at ``eps32 |x|`` vs ``u = 2 eps32``)."""
        cap = (U / 2.0) * np.abs(self.any)
        red = cap * self.rng.uniform(-1, 1, self.any.shape)
        edge = self.rng.random(self.any.shape) < 0.5
        return np.where(edge, np.sign(red + 1e-300) * cap, red)

    def sin(self):
        self.exact = np.sin(self.exact)
        self.any = (np.sin(self.any + self._arg_reduction())
                    * _rel(self.rng, self.any.shape))
        self.iv = _iv_sin(self.iv, U)
        return self

    def cos(self):
        self.exact = np.cos(self.exact)
        self.any = (np.cos(self.any + self._arg_reduction())
                    * _rel(self.rng, self.any.shape))
        self.iv = _iv_cos(self.iv, U)
        return self

    def act(self, name):
        import jax
        fn = {"tanh": np.tanh, "relu": lambda x: np.maximum(x, 0.0),
              "sigmoid": lambda x: np.asarray(jax.nn.sigmoid(x))}[name]
        self.exact = fn(self.exact)
        rel = 1.0 if name == "relu" else _rel(self.rng, self.any.shape)
        self.any = fn(self.any) * rel
        self.iv = _iv_activation(self.iv, name, U)
        return self

    def const_mul(self, c):
        self.exact = self.exact * c
        self.any = self.any * c * _rel(self.rng, self.any.shape)
        self.iv = _iv_const_mul(self.iv, jnp.asarray(c), U)
        return self

    def add(self, other):
        self.exact = self.exact + other.exact
        self.any = (self.any + other.any) * _rel(self.rng, self.any.shape)
        self.iv = _iv_add(self.iv, other.iv, U)
        return self

    def mul(self, other):
        self.exact = self.exact * other.exact
        self.any = (self.any * other.any) * _rel(self.rng, self.any.shape)
        self.iv = _iv_mul(self.iv, other.iv, U)
        return self

    def div(self, other):
        self.exact = self.exact / other.exact
        self.any = (self.any / other.any) * _rel(self.rng, self.any.shape)
        self.iv = _iv_div(self.iv, other.iv, U)
        return self

    def matmul(self, w, bias=None, dw=None):
        w = np.asarray(w, np.float64)
        # y_exact is exact arithmetic ON THE STORED params; dw lets the
        # realization use params anywhere within dw of stored (the
        # on-the-fly f32 parameter-assembly model).
        self.exact = self.exact @ w + (0.0 if bias is None else bias)
        w_real = w if dw is None else (
            w + dw * self.rng.uniform(-1, 1, w.shape))
        anchor = np.abs(self.any) @ np.abs(w_real) + (
            0.0 if bias is None else np.abs(bias))
        g = _gamma(w.shape[0] + (2 if bias is not None else 1), U)
        theta = g * self.rng.uniform(-1, 1, anchor.shape)
        edge = self.rng.random(anchor.shape) < 0.5
        theta = np.where(edge, np.sign(theta + 1e-300) * g, theta)
        self.any = (self.any @ w_real + (0.0 if bias is None else bias)
                    + theta * anchor)
        self.iv = _iv_matmul(
            self.iv, jnp.asarray(w), U,
            bias=None if bias is None else jnp.asarray(bias),
            dw=None if dw is None else jnp.asarray(dw))
        return self

    def check(self):
        v = np.asarray(self.iv[0], np.float64)
        e = np.asarray(self.iv[1], np.float64)
        slack = 1e-12 * (np.abs(self.exact) + e) + 1e-300
        dev = np.abs(self.any - self.exact)
        assert np.all(np.isfinite(e))
        assert np.all(dev <= e + slack), (
            "realization escaped the propagated bound by "
            f"{np.max(dev - e):.3e}")
        # Anchor invariant |y_any| <= |v| + 2e.
        assert np.all(np.abs(self.any) <= np.abs(v) + 2.0 * e + slack)
        return self


@pytest.mark.parametrize("seed", range(8))
def test_mlp_chain_realizations_stay_inside_bound(seed):
    """matmul(+bias, +dw) / tanh / sigmoid / relu / const_mul chains."""
    rng = np.random.default_rng(seed)
    n, layers = 32, [3, 8, 8, 1]
    x = rng.uniform(-1.5, 1.5, (n, layers[0]))
    c = _Chain(rng, x, e0=1e-3)
    for i, (din, dout) in enumerate(zip(layers[:-1], layers[1:])):
        w = rng.normal(size=(din, dout)) / np.sqrt(din)
        bias = rng.normal(size=(dout,)) * 0.1 if i % 2 == 0 else None
        dw = np.full((din, dout), 1e-4) if i == 1 else None
        c.matmul(w, bias=bias, dw=dw).check()
        c.act(("tanh", "sigmoid", "relu")[i % 3]).check()
    c.const_mul(0.8).check()


@pytest.mark.parametrize("seed", range(8))
def test_dynamics_chain_realizations_stay_inside_bound(seed):
    """sin / cos / mul / add / div chains shaped like the ODE rules."""
    rng = np.random.default_rng(100 + seed)
    n = 64
    theta = _Chain(rng, rng.uniform(-2.0, 2.0, (n, 1)), e0=1e-3)
    omega = _Chain(rng, rng.uniform(-1.0, 1.0, (n, 1)), e0=1e-3)
    sin_t = _Chain.__new__(_Chain)  # copy of theta's state, then sin
    sin_t.rng, sin_t.exact, sin_t.any, sin_t.iv = (
        rng, theta.exact.copy(), theta.any.copy(), theta.iv)
    sin_t.sin().check()
    cos_t = _Chain.__new__(_Chain)
    cos_t.rng, cos_t.exact, cos_t.any, cos_t.iv = (
        rng, theta.exact.copy(), theta.any.copy(), theta.iv)
    cos_t.cos().check()
    num = sin_t.const_mul(9.81).add(omega.mul(cos_t).check()).check()
    # Denominator bounded away from zero so the div rule stays finite.
    den = _Chain(rng, rng.uniform(2.0, 3.0, (n, 1)), e0=1e-3)
    num.div(den).check()


def test_div_reports_inf_when_denominator_can_vanish():
    rng = np.random.default_rng(0)
    a = _Chain(rng, np.ones((4, 1)), e0=1e-3)
    b = _Chain(rng, np.full((4, 1), 1e-4), e0=1e-3)  # interval reaches 0
    _, e = _iv_div(a.iv, b.iv, U)
    assert np.all(np.isinf(np.asarray(e)))


def test_sin_bound_covers_argument_reduction_at_pi():
    """At ``x ~= pi`` the output-relative model alone collapses: the
    true deviation of a reduced-argument realization is
    ``~|x| * u_red`` (absolute in the argument) while ``|sin x| ~= 0``.
    The corrected rule's ``u * arg`` term must dominate it; the
    pre-round-4 output-only bound (``~u |sin pi| = 5e-19``) does not."""
    x = np.pi
    iv = (jnp.asarray([[x]]), jnp.asarray([[0.0]]))
    _, e = _iv_sin(iv, U)
    e = float(np.asarray(e)[0, 0])
    # Realization: reduction at the consumers' u/2 cap, then output
    # rounding at the full budget.
    y_any = np.sin(x + (U / 2.0) * x) * (1.0 + U)
    dev = abs(y_any - np.sin(x))
    assert dev > U * abs(np.sin(x)) + U * 1e-10  # old rule fails
    assert dev <= e
    # cos at pi/2 is the same corner.
    ivc = (jnp.asarray([[np.pi / 2]]), jnp.asarray([[0.0]]))
    _, ec = _iv_cos(ivc, U)
    y_any = np.cos(np.pi / 2 + (U / 2.0) * (np.pi / 2)) * (1.0 + U)
    assert abs(y_any - np.cos(np.pi / 2)) <= float(np.asarray(ec)[0, 0])


@pytest.mark.parametrize("op", ["sin", "cos", "tanh", "sigmoid"])
def test_directed_corner_anchor_realization_split(op):
    """The adversarial corner the random fuzz almost never hits: the
    anchor sits at the LOW edge of the input uncertainty, the
    realization at the HIGH edge, own rounding coherently at ``+u``.
    The measured deviation then exceeds the pre-round-4 single-``e``
    activation anchor (verified: it violates that bound by ~``u e``)
    while staying inside the corrected ``2 e`` anchor."""
    import jax
    c, e0 = 0.01, 0.005
    iv = (jnp.asarray([[c - e0]]), jnp.asarray([[e0]]))
    fn = {"sin": np.sin, "cos": np.cos, "tanh": np.tanh,
          "sigmoid": lambda x: np.asarray(jax.nn.sigmoid(x))}[op]
    if op in ("sin", "cos"):
        # cos's slope-1 point is at pi/2: shift the window there.
        if op == "cos":
            c0 = np.pi / 2 + c
            iv = (jnp.asarray([[c0 - e0]]), jnp.asarray([[e0]]))
            _, e = _iv_cos(iv, U)
            y_exact, y_any = np.cos(c0), np.cos(c0 + e0) * (1 + U)
        else:
            _, e = _iv_sin(iv, U)
            y_exact, y_any = np.sin(c), np.sin(c + e0) * (1 + U)
    else:
        _, e = _iv_activation(iv, op, U)
        y_exact, y_any = fn(c), fn(c + e0) * (1 + U)
    assert abs(y_any - y_exact) <= float(np.asarray(e)[0, 0])
