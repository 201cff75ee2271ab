"""Extended-precision (double-word float32) verification sweep.

The float32 device sweep certifies ``decrease < threshold - margin``
with a margin absorbing the f32 pipeline error. The *derived* margin
(:func:`~safe_learning_tpu.errorbounds.analytic_certificate_margin`) is
rigorous but scales with the cached GP factor's condition number — on
ill-conditioned instances it can exceed the threshold itself (measured
0.27 on the ill-conditioned property instance, ``docs/performance.md``),
leaving only the empirically calibrated margin usable there.

This module runs the ENTIRE decrease pipeline — policy, GP posterior
(mean and confidence), Lyapunov values, Lipschitz threshold, comparison
— in double-word float32 arithmetic (:mod:`~safe_learning_tpu.ops
.extended`): every value is an unevaluated ``(hi, lo)`` pair and every
operation rounds at ~2^-45 relative, on any IEEE f32 backend (TPU VPU
included; no MXU, no hardware transcendentals). The same Higham-style
analysis then yields a margin at unit roundoff ``U_EFF = 2^-40`` —
about ``2^18`` tighter than the f32 bound on the same instance — making
the DERIVED certificate usable in exactly the conditioning regime that
defeats it in plain f32.

Soundness chain (each link checked by tests):

1. ``eft_selfcheck()`` proves the error-free transformations hold on
   the live backend before any sweep runs.
2. The GP factors are EXACT double-word splits of the float64 host
   island's factors (``functions/gp.py:_host_factorize``) — which are
   bitwise the arrays the float64 oracle uses (``_cache_parts`` routes
   BOTH dtype modes through the same numpy factorization), so there is
   no cross-implementation f64 discrepancy for the margin to absorb.
3. Every pipeline stage mirrors the float64 oracle's formula
   (``oracle.oracle_margins``) term by term; the derived margin bounds
   ``|margin_dw - margin_oracle|`` because both realizations round at
   <= U_EFF per operation under the parametric analysis
   (``errorbounds.analytic_certificate_margin(unit_roundoff=U_EFF)``).

Supported instance shape:

- **policies** — LinearSystem / Saturation / Constant, and
  :class:`~safe_learning_tpu.functions.neural.NeuralNetwork` MLPs with
  relu/tanh/sigmoid/linear activations (the NeurIPS-17 flagship);
- **dynamics** — (Stacked)GaussianProcess over RBF / Matern / Linear
  kernels and their sums/products/ActiveDims with LinearSystem-or-None
  prior means, or DETERMINISTIC LinearSystem / InvertedPendulum /
  CartPole / VanDerPol (the CoRL-18 flagship; no error term);
- **candidates** — QuadraticFunction, Triangulation (piecewise-linear),
  :class:`~safe_learning_tpu.functions.neural.LyapunovNetwork`, scalar
  NeuralNetwork, each optionally scaled by a constant (``-value_
  function``);
- **L_f** — a real scalar, a callable modeled by the row form
  ``L_f(x) = |x H^T|`` (``lf_matrix``), or a ``GradientNorm`` of a
  scalar Triangulation;
- **L_v** — a scalar, the row-wise absolute linear form
  ``L_v(x) = |x G^T|`` (``lv_matrix``, covering the reference
  notebooks' ``2 |P x|``-style local constants), or a ``GradientNorm``
  of a scalar Triangulation (conservatively inflated near simplex
  faces — see :func:`_compile_gradnorm_pwl`); at ``tau == 0`` with
  deterministic dynamics L_v is unused and may be anything.

Anything else raises ``NotImplementedError``.

No reference counterpart: the reference runs float64 end to end
(``/root/reference/safe_learning/configuration.py:16``); this is the
TPU-native answer to certifying in a 32-bit-native dtype without giving
up rigor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import config
from ..functions.base import (ConstantFunction, FunctionStack,
                              GradientNorm, MultipliedFunction,
                              Saturation)
from ..functions.gp import (RBF, ActiveDims, GaussianProcess,
                            LinearKernel, Matern12, Matern32, Matern52,
                            ProductKernel, StackedGaussianProcess,
                            SumKernel, _StationaryKernel, coerce_stacked)
from ..functions.linear import LinearSystem, QuadraticFunction
from ..functions.neural import LyapunovNetwork, NeuralNetwork
from ..functions.simplex import Triangulation, _vertex_strides
from .extended import (df_abs, df_add, df_add_f32, df_cos, df_div,
                       df_dot, df_exp, df_from_f64, df_less, df_matmul,
                       df_max, df_mul, df_mul_f32, df_neg, df_pow2_scale,
                       df_relu, df_select, df_sigmoid, df_sin, df_sqrt,
                       df_sub, df_tanh, eft_selfcheck, two_sum)

__all__ = ["U_EFF", "ExtendedSweep", "extended_gp_evaluate",
           "extended_certificate_margin", "extended_exploration_margin",
           "hybrid_band_margin"]

#: Appended to every model-shape refusal: the supported alternatives a
#: refused instance can ALWAYS use instead of the extended pipeline.
_FALLBACK = (" [fallback: run the plain f32 sweep/scorer with a derived"
             " margin (errorbounds.analytic_certificate_margin /"
             " analytic_exploration_margin) or a measured one"
             " (oracle.calibrate_certificate_margin)]")


#: Unit roundoff the extended pipeline is certified at. Double-word ops
#: round at a few 2^-48 relative (Joldes et al. 2017) and the scan
#: accumulations at ~n * 2^-46; ``df_exp`` at ~2^-41; 2^-40 dominates
#: all of them AND the float64 oracle's own 2^-53-per-op rounding, so
#: one parametric analysis covers the deviation between the two
#: realizations.
U_EFF = 2.0 ** -40

_F32 = jnp.float32

#: The stationary kernels' sqrt guard (gp.py `_from_sqdist`: 1e-36) and
#: Matern-5/2's 1/3, as exact double-word constants of the f64 values
#: the oracle uses.
_TINY = None  # initialized lazily (needs a live backend)
_THIRD = None
_CLAMP = None  # predict's variance floor 1e-12


def _consts():
    global _TINY, _THIRD, _CLAMP
    if _TINY is None:
        _TINY = _split_np(1e-36)
        _THIRD = _split_np(1.0 / 3.0)
        _CLAMP = _split_np(1e-12)
    return _TINY, _THIRD, _CLAMP


# One source for the exact f64 -> (hi, lo) split rule: the soundness
# claim "the sweep's factors are exact double-word splits" must not
# depend on which of two drifting copies a call site used.
_split_np = df_from_f64


def _df_maximum(x, c):
    """Elementwise max of a pair with a (broadcast) pair ``c``."""
    lt = df_less(x, c)
    ch = jnp.broadcast_to(c[0], x[0].shape)
    cl = jnp.broadcast_to(c[1], x[1].shape)
    return df_select(lt, (ch, cl), x)


def _sum_cols(x):
    """Row sum of a double-word (N, k) pair -> (N,)."""
    acc = (x[0][:, 0], x[1][:, 0])
    for j in range(1, x[0].shape[1]):
        acc = df_add(acc, (x[0][:, j], x[1][:, j]))
    return acc


# ---------------------------------------------------------------------------
# Kernel compiler: structure -> double-word covariance program
# ---------------------------------------------------------------------------
def _compile_kernel(kernel, dims, params):
    """Compile a kernel tree to double-word entry/diag closures.

    Returns ``(entry, diag, sig)`` where ``entry(kp, x, qh, ql)`` maps
    the double-word training rows ``x = (hi, lo)`` of shape
    ``(cap, nd)`` (an exact split: ``lo == 0`` in float32 mode) and the
    double-word query rows ``(qh, ql) (N, nd)`` to the df covariance
    ``(cap, N)``,
    and ``diag(kp, qh, ql)`` to the df prior variance ``(N,)``. All
    hyperparameters are exact double-word splits appended to ``params``
    and consumed positionally from the ``kp`` tuple, so compiled
    closures are reusable across instances with the same structure
    ``sig`` (the jit cache key). Mirrors the recursive error program in
    ``errorbounds._kernel_program``; formulas mirror the float64
    oracle's (``functions/gp.py`` kernel classes) term by term.
    """
    dims = np.asarray(dims, dtype=int)

    if isinstance(kernel, ActiveDims):
        entry, diag, sig = _compile_kernel(
            kernel.kernel, dims[list(kernel.dims)], params)
        return entry, diag, ("active", tuple(int(d) for d in kernel.dims),
                             sig)

    if isinstance(kernel, (SumKernel, ProductKernel)):
        e1, g1, s1 = _compile_kernel(kernel.k1, dims, params)
        e2, g2, s2 = _compile_kernel(kernel.k2, dims, params)
        if isinstance(kernel, SumKernel):
            def entry(kp, x, qh, ql):
                return df_add(e1(kp, x, qh, ql), e2(kp, x, qh, ql))

            def diag(kp, qh, ql):
                return df_add(g1(kp, qh, ql), g2(kp, qh, ql))
            return entry, diag, ("sum", s1, s2)

        def entry(kp, x, qh, ql):
            return df_mul(e1(kp, x, qh, ql), e2(kp, x, qh, ql))

        def diag(kp, qh, ql):
            return df_mul(g1(kp, qh, ql), g2(kp, qh, ql))
        return entry, diag, ("prod", s1, s2)

    cols = [int(c) for c in dims]

    if isinstance(kernel, _StationaryKernel):
        fam = type(kernel)
        if fam not in (RBF, Matern12, Matern32, Matern52):
            raise NotImplementedError(
                "extended sweep: unsupported stationary kernel {}"
                .format(fam.__name__) + _FALLBACK)
        m = len(cols)
        ls64 = np.broadcast_to(np.atleast_1d(
            np.asarray(kernel.lengthscales, dtype=np.float64)), (m,))
        idx = len(params)
        params.append((_split_np(1.0 / ls64),
                       _split_np(np.asarray(kernel.variance, np.float64))))
        tiny, third, _ = _consts()

        def entry(kp, x, qh, ql):
            (ih, il), var = kp[idx]
            cap = x[0].shape[0]
            n = qh.shape[0]
            t = (jnp.zeros((cap, n), _F32), jnp.zeros((cap, n), _F32))
            for j, c in enumerate(cols):
                diff = df_sub((x[0][:, c:c + 1], x[1][:, c:c + 1]),
                              (qh[:, c][None, :], ql[:, c][None, :]))
                z = df_mul(diff, (ih[j], il[j]))
                t = df_add(t, df_mul(z, z))
            if fam is RBF:
                e = df_exp(df_pow2_scale(t, -0.5))
            elif fam is Matern12:
                r = df_sqrt(df_add(t, tiny))
                e = df_exp(df_neg(r))
            elif fam is Matern32:
                r = df_sqrt(df_add(df_mul_f32(t, np.float32(3.0)), tiny))
                e = df_mul(df_add_f32(r, np.float32(1.0)),
                           df_exp(df_neg(r)))
            else:  # Matern52
                r = df_sqrt(df_add(df_mul_f32(t, np.float32(5.0)), tiny))
                rr = df_mul(r, r)
                poly = df_add_f32(df_add(r, df_mul(rr, third)),
                                  np.float32(1.0))
                e = df_mul(poly, df_exp(df_neg(r)))
            return df_mul(e, var)

        def diag(kp, qh, ql):
            var = kp[idx][1]
            n = qh.shape[0]
            return (jnp.broadcast_to(var[0], (n,)),
                    jnp.broadcast_to(var[1], (n,)))
        return entry, diag, (fam.__name__.lower(), m,
                             tuple(cols))

    if isinstance(kernel, LinearKernel):
        m = len(cols)
        vv64 = np.broadcast_to(np.atleast_1d(
            np.asarray(kernel.variances, dtype=np.float64)), (m,))
        idx = len(params)
        params.append((_split_np(vv64),))

        def entry(kp, x, qh, ql):
            (vh, vl), = kp[idx]
            cap = x[0].shape[0]
            n = qh.shape[0]
            acc = (jnp.zeros((cap, n), _F32), jnp.zeros((cap, n), _F32))
            for j, c in enumerate(cols):
                xv = df_mul((x[0][:, c:c + 1], x[1][:, c:c + 1]),
                            (vh[j], vl[j]))
                acc = df_add(acc, df_mul(
                    xv, (qh[:, c][None, :], ql[:, c][None, :])))
            return acc

        def diag(kp, qh, ql):
            (vh, vl), = kp[idx]
            n = qh.shape[0]
            acc = (jnp.zeros((n,), _F32), jnp.zeros((n,), _F32))
            for j, c in enumerate(cols):
                qc = (qh[:, c], ql[:, c])
                acc = df_add(acc, df_mul(df_mul(qc, qc), (vh[j], vl[j])))
            return acc
        return entry, diag, ("linear", m, tuple(cols))

    raise NotImplementedError(
        "extended sweep: unsupported kernel node {}"
        .format(type(kernel).__name__) + _FALLBACK)


# ---------------------------------------------------------------------------
# Policy / candidate compilers
# ---------------------------------------------------------------------------
def _df_identity(p):
    return p


_DF_ACTS = {None: _df_identity, "linear": _df_identity, "relu": df_relu,
            "tanh": df_tanh, "sigmoid": df_sigmoid}


def _df_activation(name):
    """df activation by name; callables/unsupported names raise."""
    if not (name is None or isinstance(name, str)):
        raise NotImplementedError(
            "extended sweep needs named activations (relu/tanh/sigmoid/"
            "linear); got a callable" + _FALLBACK)
    try:
        return _DF_ACTS[name]
    except KeyError:
        raise NotImplementedError(
            "extended sweep supports relu/tanh/sigmoid/linear "
            "activations; got {!r}".format(name) + _FALLBACK)


def _compile_mlp(net, params):
    """Compile a :class:`NeuralNetwork` forward pass to a df program.

    Weights/biases are exact double-word splits of the stored values
    (bitwise in float32 mode); matmuls run on the VPU scan
    (:func:`df_matmul`); activations are the backend-independent df
    kernels (``df_tanh`` ~2^-41 relative). Covers the NeurIPS-17
    flagship policy (reference ``functions.py:1665-1786`` network with
    relu/relu/tanh, ``examples/inverted_pendulum.py``).
    """
    acts = [_df_activation(a) for a in net.nonlinearities]
    idx = len(params)
    layers = []
    for w, b in zip(net.weights, net.biases):
        layers.append((
            _split_np(np.asarray(w, np.float64)),
            None if b is None else _split_np(np.asarray(b, np.float64))))
    scale = float(net.output_scale)
    params.append((tuple(layers), _split_np(np.float64(scale))))
    scaled = scale != 1.0

    def fn(pp, xh, xl):
        layer_ps, sc = pp[idx]
        netv = (xh, xl)
        for (wp, bp), act in zip(layer_ps, acts):
            netv = df_matmul(netv, wp)
            if bp is not None:
                netv = df_add(netv, (bp[0][None, :], bp[1][None, :]))
            netv = act(netv)
        if scaled:
            netv = df_mul(netv, sc)
        return netv

    sig = ("mlp", net.layers, net.nonlinearities,
           tuple(b is not None for b in net.biases), scaled)
    return fn, sig


def _compile_policy(policy, params):
    """Compile a policy to ``fn(pp, xh, xl) -> df (N, m)`` + signature."""
    if isinstance(policy, Saturation):
        inner, sig = _compile_policy(policy.fun, params)
        idx = len(params)
        params.append((_split_np(np.asarray(policy.lower, np.float64)),
                       _split_np(np.asarray(policy.upper, np.float64))))

        def fn(pp, xh, xl):
            v = inner(pp, xh, xl)
            lo, hi = pp[idx]
            # jnp.clip = min(max(v, lo), hi), mirrored exactly.
            v = _df_maximum(v, lo)
            gt = df_less((jnp.broadcast_to(hi[0], v[0].shape),
                          jnp.broadcast_to(hi[1], v[1].shape)), v)
            return df_select(gt,
                             (jnp.broadcast_to(hi[0], v[0].shape),
                              jnp.broadcast_to(hi[1], v[1].shape)), v)
        return fn, ("sat", sig)

    if isinstance(policy, LinearSystem):
        idx = len(params)
        params.append(
            (_split_np(np.asarray(policy.matrix, np.float64).T),))

        def fn(pp, xh, xl):
            return df_matmul((xh, xl), pp[idx][0])
        return fn, ("linear", tuple(np.asarray(policy.matrix).shape))

    if isinstance(policy, ConstantFunction):
        c = np.atleast_2d(np.asarray(policy.constant, np.float64))
        idx = len(params)
        params.append((_split_np(c),))
        width = c.shape[-1]

        def fn(pp, xh, xl):
            ch, cl = pp[idx][0]
            n = xh.shape[0]
            return (jnp.broadcast_to(ch, (n, width)),
                    jnp.broadcast_to(cl, (n, width)))
        return fn, ("const", int(width))

    if isinstance(policy, NeuralNetwork):
        return _compile_mlp(policy, params)

    raise NotImplementedError(
        "extended sweep supports LinearSystem/Saturation/Constant/"
        "NeuralNetwork policies; got {}".format(type(policy).__name__)
        + _FALLBACK)


def _build_pwl_locate(v_fun):
    """Shared Kuhn-locate compiler for a :class:`Triangulation`.

    Returns ``(locate, consts, sig, d, strides)``: ``consts = (theta,
    off, inv_unit)`` (exact f32 table + double-word geometry splits) to
    append to a params list, and ``locate(consts, x)`` running the
    double-word locate — the floor is corrected against the full pair
    so it matches the pair's value; Kuhn ranks come from pairwise
    double-word comparisons with ties by index (mirroring
    ``simplex._locate_all``); vertex math is exact integers. Returns
    ``(weights, vertices, onehot, cell_i, z_clip)``.
    """
    grid_v = v_fun.discretization
    d = grid_v.ndim
    shape = tuple(int(n) for n in grid_v.shape)
    strides = np.asarray(_vertex_strides(grid_v), dtype=np.int32)
    num_cells = np.asarray(grid_v.num_points, dtype=np.int32) - 2
    project = bool(v_fun.project)
    # EXACT (float64) grid geometry, matching the float64 oracle: the
    # GridWorld properties round to config dtype, so using the f32
    # offset/unit here would evaluate a ~2^-25-perturbed interpolant —
    # an input shift the 2^-40 margins cannot cover (measured 1.7e-7
    # value deviation on the flagship-shaped candidate).
    lim64 = np.asarray(grid_v._limits, np.float64)
    npts64 = np.asarray(grid_v.num_points, np.float64)
    unit64 = (lim64[:, 1] - lim64[:, 0]) / (npts64 - 1.0)
    consts = (
        jnp.asarray(np.asarray(v_fun.parameters)[:, 0],
                    dtype=_F32),                       # exact table
        _split_np(lim64[:, 0]),
        _split_np(1.0 / unit64),
    )

    def locate(consts_in, x):
        _, off, inv_unit = consts_in
        n = x[0].shape[0]
        # Double-word fractional coordinates.
        frac = df_mul(df_sub(x, (off[0][None, :], off[1][None, :])),
                      (inv_unit[0][None, :], inv_unit[1][None, :]))
        # Floor of the PAIR's value: floor(hi), corrected when the
        # lo word crosses an integer (|lo| <= ulp(hi)/2, so the
        # correction is at most one).
        c0 = jnp.floor(frac[0])
        c0 = jnp.where(df_less(frac, (c0, jnp.zeros_like(c0))),
                       c0 - 1.0, c0)
        nxt = c0 + 1.0
        c0 = jnp.where(~df_less(frac, (nxt, jnp.zeros_like(nxt))),
                       nxt, c0)
        cell_i = jnp.clip(c0.astype(jnp.int32), 0,
                          jnp.asarray(num_cells)[None, :])
        cell_f = cell_i.astype(_F32)  # exactly representable
        z_raw = df_add(frac, (-cell_f, jnp.zeros_like(cell_f)))
        one = jnp.ones((), _F32)
        zero = jnp.zeros((), _F32)
        z_clip = _df_maximum(z_raw, (zero, zero))
        lt_one = df_less(z_clip, (one, zero))
        z_clip = df_select(lt_one, z_clip,
                           (jnp.broadcast_to(one, z_clip[0].shape),
                            jnp.broadcast_to(zero, z_clip[1].shape)))
        z = z_clip if project else z_raw

        # Kuhn rank from pairwise double-word comparisons (ties by
        # index, mirroring simplex._locate_all).
        zi = (z_clip[0][:, :, None], z_clip[1][:, :, None])
        zj = (z_clip[0][:, None, :], z_clip[1][:, None, :])
        greater = df_less(zi, zj)                 # z_j > z_i
        eq = ~greater & ~df_less(zj, zi)
        dim_idx = jnp.arange(d, dtype=jnp.int32)
        tie_prior = eq & (dim_idx[None, None, :]
                          < dim_idx[None, :, None])
        rank = jnp.sum(greater | tie_prior, axis=2,
                       dtype=jnp.int32)           # (N, d)
        onehot = (rank[:, :, None]
                  == dim_idx[None, None, :]).astype(_F32)
        # z_sorted[k] = sum_i onehot[i, k] * z_i (0/1 products are
        # exact; the d-term accumulation is double-word).
        zs_h = jnp.zeros((n, d), _F32)
        zs_l = jnp.zeros((n, d), _F32)
        for i in range(d):
            term = (onehot[:, i, :] * z[0][:, i:i + 1],
                    onehot[:, i, :] * z[1][:, i:i + 1])
            zs_h, zs_l = df_add((zs_h, zs_l), term)
        z_sorted = (zs_h, zs_l)

        # Chain weights: w_0 = 1 - z_(1); w_k = z_(k) - z_(k+1);
        # w_d = z_(d).
        w_first = df_sub((jnp.ones((n, 1), _F32),
                          jnp.zeros((n, 1), _F32)),
                         (z_sorted[0][:, :1], z_sorted[1][:, :1]))
        if d > 1:
            w_mid = df_sub((z_sorted[0][:, :-1], z_sorted[1][:, :-1]),
                           (z_sorted[0][:, 1:], z_sorted[1][:, 1:]))
        else:
            w_mid = (jnp.zeros((n, 0), _F32), jnp.zeros((n, 0), _F32))
        w_last = (z_sorted[0][:, -1:], z_sorted[1][:, -1:])
        weights = _concat_pairs([w_first, w_mid, w_last])  # (N, d+1)

        # Vertex chain (exact integer math, as in the f32 path).
        strides_dev = jnp.asarray(strides)
        corner = jnp.sum(cell_i * strides_dev[None, :], axis=-1,
                         keepdims=True)
        step = jnp.sum(onehot.astype(jnp.int32)
                       * strides_dev[:, None], axis=1)
        vertices = jnp.concatenate(
            [corner, corner + jnp.cumsum(step, axis=-1)], axis=1)
        return weights, vertices, onehot, cell_i, z_clip

    return locate, consts, ("pwl", shape, project), d, strides


def _compile_candidate(v_fun, params):
    """Lyapunov candidate ``v(x)`` in double words.

    Quadratic: ``x^T P x`` (mirrors ``QuadraticFunction``). Piecewise
    linear (``Triangulation``): the Kuhn locate runs on exact integer
    math (:func:`_build_pwl_locate`); any residual cell/simplex
    disagreement with the float64 oracle near faces is covered by the
    margin analysis's Lipschitz-times-coordinate-uncertainty term (the
    interpolant is continuous); barycentric weights are double-word
    arithmetic; vertex-value gathers are EXACT (the table is stored
    f32). Scalar-constant ``MultipliedFunction`` wrappers (e.g.
    ``-value_function``, the NeurIPS-17 flagship candidate,
    ``examples/inverted_pendulum.py``) fold into an exact df multiply.
    :class:`LyapunovNetwork` (the CoRL-18 flagship candidate, reference
    ``examples/utilities.py:48-120``) precomputes each layer's
    positive-definite kernel ``W0^T W0 + eps I`` in float64 on the host
    (exact split; the 2^-53 construction residual is far below U_EFF)
    and runs the df matmul + activation chain;
    :class:`NeuralNetwork` candidates with scalar output reuse the MLP
    program.
    """
    if isinstance(v_fun, QuadraticFunction):
        idx = len(params)
        params.append((_split_np(np.asarray(v_fun.matrix, np.float64)),))

        def fn(vp, x):
            xp = df_matmul(x, vp[idx][0])
            return df_dot(xp, x, axis=1)
        return fn, ("quad", int(np.asarray(v_fun.matrix).shape[0]))

    if isinstance(v_fun, MultipliedFunction):
        const, inner = v_fun.split_scalar_factor("extended sweep")
        inner_fn, isig = _compile_candidate(inner, params)
        idx = len(params)
        params.append((_split_np(np.float64(np.asarray(const.constant))),))

        def fn(vp, x):
            return df_mul(inner_fn(vp, x), vp[idx][0])
        return fn, ("scaled", isig)

    if isinstance(v_fun, Triangulation):
        if v_fun.output_dim != 1:
            raise NotImplementedError(
                "extended sweep needs a scalar PWL candidate" + _FALLBACK)
        locate, consts, sig, d, _ = _build_pwl_locate(v_fun)
        idx = len(params)
        params.append(consts)

        def fn(vp, x):
            theta = vp[idx][0]
            weights, vertices, _, _, _ = locate(vp[idx], x)
            vals = theta[vertices]                    # (N, d+1), exact
            acc = df_mul((weights[0][:, 0], weights[1][:, 0]),
                         (vals[:, 0], jnp.zeros_like(vals[:, 0])))
            for k in range(1, d + 1):
                term = df_mul((weights[0][:, k], weights[1][:, k]),
                              (vals[:, k], jnp.zeros_like(vals[:, k])))
                acc = df_add(acc, term)
            return acc
        return fn, sig

    if isinstance(v_fun, LyapunovNetwork):
        acts = [_df_activation(a) for a in v_fun.activations]
        idx = len(params)
        kernels = []
        in_dim = v_fun.input_dim
        for w0, w1, out_dim in zip(v_fun.posdef_weights,
                                   v_fun.extra_weights, v_fun.layer_dims):
            w0_64 = np.asarray(w0, np.float64)
            kern = w0_64.T @ w0_64 + v_fun.eps * np.eye(in_dim)
            if w1 is not None:
                kern = np.vstack([kern, np.asarray(w1, np.float64)])
            kernels.append(_split_np(kern.T))          # (in, out)
            in_dim = out_dim
        params.append(tuple(kernels))

        def fn(vp, x):
            netv = x
            for kp, act in zip(vp[idx], acts):
                netv = act(df_matmul(netv, kp))
            return df_dot(netv, netv, axis=1)
        return fn, ("lyapnet", v_fun.input_dim, v_fun.layer_dims,
                    v_fun.activations)

    if isinstance(v_fun, NeuralNetwork):
        if v_fun.output_dim != 1:
            raise NotImplementedError(
                "extended sweep needs a scalar NN candidate" + _FALLBACK)
        mlp_fn, msig = _compile_mlp(v_fun, params)

        def fn(vp, x):
            out = mlp_fn(vp, x[0], x[1])
            return out[0][:, 0], out[1][:, 0]
        return fn, ("nncand", msig)

    raise NotImplementedError(
        "extended sweep supports QuadraticFunction / Triangulation / "
        "LyapunovNetwork / NeuralNetwork candidates (optionally scaled "
        "by a constant); got {}".format(type(v_fun).__name__)
        + _FALLBACK)


def _auto_lv_matrix(lyapunov):
    """Derive ``lv_matrix`` when the form is known exactly or probeable.

    - ``GradientNorm(QuadraticFunction, ord=None)`` — the repo's
      first-class local-Lipschitz helper for quadratic candidates — IS
      the row-wise absolute linear form:
      ``|grad v(x)| = |x (P + P^T)|``.
    - A GENERIC callable L_v paired with a ``QuadraticFunction``
      candidate is probed against the same form (the ubiquitous
      ``2|Px|`` pattern, e.g.
      ``LambdaFunction(lambda x: jnp.abs(x @ (2 * p)))``): when the
      callable reproduces ``|x (P + P^T)^T|`` on a grid sample
      (:meth:`ExtendedSweep._spotcheck_lv`, within
      :meth:`~ExtendedSweep._model_reltol` — 32 working-dtype unit
      roundoffs — on the positive anchor, the exact slack the f32-unit
      rounding models add back), the matrix is adopted. Sweep
      construction
      re-runs the full spot-check, so a mismatch still fails loudly;
      ``GradientNorm`` of anything non-quadratic keeps its dedicated
      inflated-program model instead of this probe.
    """
    from ..functions.base import GradientNorm

    lv = lyapunov._lipschitz_lyapunov
    if (isinstance(lv, GradientNorm) and lv.ord is None
            and isinstance(lv.fun, QuadraticFunction)):
        pm = np.asarray(lv.fun.matrix, np.float64)
        return pm + pm.T
    if (callable(lv)
            and not isinstance(lv, (ConstantFunction, GradientNorm))
            and isinstance(lyapunov.lyapunov_function,
                           QuadraticFunction)):
        pm = np.asarray(lyapunov.lyapunov_function.matrix, np.float64)
        g = pm + pm.T
        try:
            ExtendedSweep._spotcheck_lv(lyapunov, g, g.shape[0])
        except ValueError:
            return None
        return g
    return None


def _compile_lv(lipschitz_lyapunov, lv_matrix, d, params):
    """L_v evaluator: ``fn(lp, x) -> df (N, dv)`` + (sig, dv).

    A scalar/constant L_v becomes an exact df constant; a callable
    REQUIRES the explicit row-wise absolute linear model ``lv_matrix``
    (``L_v(x) = |x G^T|``) — the caller spot-checks it against the
    callable (see :class:`ExtendedSweep`).
    """
    if isinstance(lipschitz_lyapunov, ConstantFunction):
        lipschitz_lyapunov = np.asarray(lipschitz_lyapunov.constant)
    if isinstance(lipschitz_lyapunov, (int, float)) or (
            isinstance(lipschitz_lyapunov, np.ndarray)
            and lipschitz_lyapunov.size == 1):
        idx = len(params)
        params.append((_split_np(float(lipschitz_lyapunov)),))

        def fn(lp, x):
            c = lp[idx][0]
            n = x[0].shape[0]
            return (jnp.broadcast_to(c[0], (n, 1)),
                    jnp.broadcast_to(c[1], (n, 1)))
        return fn, ("scalar",), 1

    if lv_matrix is None and isinstance(lipschitz_lyapunov, GradientNorm):
        if isinstance(lipschitz_lyapunov.fun, NeuralNetwork):
            return _compile_gradnorm_spectral(lipschitz_lyapunov, params)
        return _compile_gradnorm_pwl(lipschitz_lyapunov, d, params)

    if lv_matrix is None:
        raise NotImplementedError(
            "extended sweep needs lv_matrix (the G of L_v(x) = |x G^T|) "
            "for a non-constant L_v; got {} with no model".format(
                type(lipschitz_lyapunov).__name__) + _FALLBACK)
    g = np.atleast_2d(np.asarray(lv_matrix, dtype=np.float64))
    if g.shape[1] != d:
        raise ValueError("lv_matrix must have one column per state dim")
    idx = len(params)
    params.append((_split_np(g.T),))

    def fn(lp, x):
        return df_abs(df_matmul(x, lp[idx][0]))
    return fn, ("linabs", g.shape), int(g.shape[0])


#: Face-ambiguity trigger width, in fractional-coordinate (z) units.
#: When a locate decision (cell assignment or Kuhn rank) sits within
#: DELTA of its boundary, the PWL gradient program switches to the
#: CELL-MAX gradient — an upper bound on every adjacent simplex's —
#: so realization disagreement on the decision cannot change the value
#: in the unsound direction. 2^-10 is ~2^28 above the double-word
#: coordinate error, and its half-band headroom cap
#: (``ErrorModel.max_input_shift``) comfortably admits the flagship's
#: ill-conditioned GP posterior uncertainty (measured ~2^-11.4 of a
#: cell on the NeurIPS-17-shaped instance at 1e-6 noise), while
#: triggering on only an O(d^2 * DELTA) ~ 0.4% fraction of generic
#: points.
_PWL_GRAD_DELTA = np.float32(2.0 ** -10)


def _pwl_gradient_cell_table(tri):
    """Per-cell per-axis max |simplex gradient| of a scalar PWL.

    Computed exactly in float64 from the f32 vertex table. The Kuhn
    triangulation's simplex gradients ARE single-axis corner
    differences, so the cell's max over its 2^(d-1) edges along each
    axis bounds every simplex's gradient component in that cell.
    Returns ``(g_tab (cells..., d), cells_shape, unit64)``.
    """
    grid_v = tri.discretization
    d = grid_v.ndim
    shape = tuple(int(s) for s in grid_v.shape)
    cells_shape = tuple(s - 1 for s in shape)
    theta64 = np.asarray(tri.parameters, np.float64)[:, 0]
    vals_nd = theta64.reshape(shape)
    lim64 = np.asarray(grid_v._limits, np.float64)
    unit64 = ((lim64[:, 1] - lim64[:, 0])
              / (np.asarray(grid_v.num_points, np.float64) - 1.0))
    g_tab = np.zeros(cells_shape + (d,))
    for ax in range(d):
        diff = np.abs(np.diff(vals_nd, axis=ax)) / unit64[ax]
        # Max over the cell's 2^(d-1) edges along ax = max over the
        # other axes' {0, 1} corner choices.
        for other in range(d):
            if other != ax:
                lo_s = [slice(None)] * d
                hi_s = [slice(None)] * d
                lo_s[other] = slice(0, -1)
                hi_s[other] = slice(1, None)
                diff = np.maximum(diff[tuple(lo_s)], diff[tuple(hi_s)])
        g_tab[..., ax] = diff
    return g_tab, cells_shape, unit64


#: ``sup |act'|`` per supported activation name — the chain-rule factor
#: of the spectral gradient bound (tanh'/relu'/identity' <= 1,
#: sigmoid' <= 1/4).
_ACT_DERIV_SUP = {None: 1.0, "linear": 1.0, "relu": 1.0, "tanh": 1.0,
                  "sigmoid": 0.25}

#: Relative inflation applied to each f64-computed singular value so the
#: spectral product PROVABLY upper-bounds the exact one: LAPACK's SVD is
#: backward stable (computed sigma are exact for ``A + dA`` with
#: ``||dA|| <= p(n) eps64 ||A||``), so a 2^-30 headroom towers over the
#: ~2^-50 perturbation of any layer these networks use.
_SVD_HEADROOM = 1.0 + 2.0 ** -30


def _spectral_grad_bound(net):
    """Global f64 bound on ``||grad net(x)||_2`` for a scalar MLP.

    Chain rule over ``net(x) = scale * act_L(W_L ... act_1(W_1 x + b_1))``:
    the Jacobian is a product of weight matrices and activation-derivative
    diagonals, so ``||grad net(x)||_2 <= |scale| prod_l sigma_max(W_l)
    sup|act_l'|`` at EVERY input — biases shift the activation operating
    point but never its derivative bound. This is the same per-layer
    spectral product the reference uses as the network's global Lipschitz
    constant (``functions.py:1742-1786``), computed here on the host in
    float64 from the stored weights with a documented headroom factor
    (:data:`_SVD_HEADROOM`). Returns ``None`` for non-MLP / vector-output
    functions; raises for activations outside the table.
    """
    if not isinstance(net, NeuralNetwork) or int(net.layers[-1]) != 1:
        return None
    c = abs(float(net.output_scale))
    for w, act in zip(net.weights, net.nonlinearities):
        if not (act is None or isinstance(act, str)):
            raise NotImplementedError(
                "spectral gradient bound needs named activations "
                "(relu/tanh/sigmoid/linear); got a callable" + _FALLBACK)
        if act not in _ACT_DERIV_SUP:
            raise NotImplementedError(
                "spectral gradient bound supports relu/tanh/sigmoid/"
                "linear activations; got {!r}".format(act) + _FALLBACK)
        smax = float(np.linalg.svd(np.asarray(w, np.float64),
                                   compute_uv=False)[0])
        c *= smax * _SVD_HEADROOM * _ACT_DERIV_SUP[act]
    return c


def _spectral_ord(lv):
    """``(dv, constant)`` bounding ``GradientNorm(MLP, ord).evaluate``.

    From the 2-norm bound ``C`` on the gradient row: every entry of the
    elementwise ``|grad|`` (ord=None, ``d`` columns) is ``<= C``; the max
    (ord=inf) is ``<= C``; the L1 sum (ord=1) is ``<= sqrt(d) C``.
    Returns ``None`` when the inner function has no spectral bound.
    """
    c = _spectral_grad_bound(lv.fun)
    if c is None:
        return None
    d_in = int(lv.fun.input_dim)
    ordv = lv.ord
    if ordv is None:
        return d_in, c
    if np.isinf(ordv):
        return 1, c
    if ordv == 1:
        return 1, float(np.sqrt(d_in)) * c
    raise NotImplementedError(
        "spectral gradient bound supports GradientNorm ord in "
        "{{None, 1, inf}}; got ord={!r}".format(ordv) + _FALLBACK)


def _compile_gradnorm_spectral(lv, params):
    """``GradientNorm(NeuralNetwork, ord)`` as a baked constant bound.

    The per-layer spectral product (:func:`_spectral_grad_bound`)
    DOMINATES the callable's value at every evaluation site — grid
    states, refined sub-points, and next-state means that may exit the
    grid domain — and dominating L_v/L_f is the certificate's
    conservative direction (a larger constant tightens both the
    threshold and the error term), so the baked constant keeps the
    sweep sound wherever the pipeline evaluates it. The constant's df
    split is exact (zero representation error). Closes the support-
    matrix hole for neural local Lipschitz callables; the reference
    accepts arbitrary callables everywhere (``lyapunov.py:227-263``).
    """
    dv_c = _spectral_ord(lv)
    if dv_c is None:
        raise NotImplementedError(
            "spectral gradient bound needs a scalar-output "
            "NeuralNetwork; got GradientNorm({})"
            .format(type(lv.fun).__name__) + _FALLBACK)
    dv, cord = dv_c
    idx = len(params)
    params.append((_split_np(np.float64(cord)),))

    def fn(lp, x):
        cst = lp[idx][0]
        n = x[0].shape[0]
        return (jnp.broadcast_to(cst[0], (n, dv)),
                jnp.broadcast_to(cst[1], (n, dv)))
    return fn, ("gradspec", dv), dv


def _compile_gradnorm_pwl(lv, d, params):
    """``GradientNorm(Triangulation, ord)`` as a conservative df program.

    The interpolant's gradient is piecewise constant: per simplex, the
    axis introduced at Kuhn rank ``k`` has gradient
    ``(theta[v_{k+1}] - theta[v_k]) / unit_axis`` (exact f32 table
    reads; exact two_sum differences). Because the gradient JUMPS across
    simplex faces, points whose locate decisions are within
    :data:`_PWL_GRAD_DELTA` of a boundary use the located CELL's
    per-axis maximum absolute corner difference instead — an upper
    bound on the gradient of every simplex any realization (this df
    program, the f32 sweep, or the f64 oracle) could select, which is
    conservative in the certificate's direction (larger ``L_v`` makes
    both the threshold and the error term stricter). Covers the
    NeurIPS-17 flagship's local Lipschitz constant
    (``GradientNorm(value_function, ord=inf)``,
    ``examples/inverted_pendulum.py``; reference notebook cell 14).
    """
    inner = lv.fun
    ordv = lv.ord
    if not (isinstance(inner, Triangulation) and inner.output_dim == 1):
        raise NotImplementedError(
            "extended sweep supports GradientNorm of a scalar "
            "Triangulation or NeuralNetwork; got GradientNorm({})"
            .format(type(inner).__name__) + _FALLBACK)
    locate, consts, isig, dpwl, strides = _build_pwl_locate(inner)
    if dpwl != d:
        raise ValueError("GradientNorm grid dimension mismatch")
    # Per-cell per-axis max |gradient| table, precomputed exactly in
    # float64 from the f32 vertex values and stored as a df split: the
    # inflated branch gathers rows of this table. Ambiguous points take
    # the elementwise max over the located cell AND every
    # boundary-adjacent neighbor cell (all 2^d near-axis shift subsets)
    # — a realization within DELTA of a cell face can be located in the
    # neighbor by the f32 sweep or the f64 oracle, whose simplex
    # gradients the located cell's row does not bound.
    g_tab, cells_shape, unit64 = _pwl_gradient_cell_table(inner)
    cell_strides = np.asarray(
        np.cumprod((cells_shape[1:] + (1,))[::-1])[::-1], np.int32)
    n_cells = int(np.prod(cells_shape))
    # Validate ord BEFORE mutating the shared params list: a caller
    # that catches the NotImplementedError must not be left with a
    # stale entry.
    ord_key = "inf" if (ordv is not None and np.isinf(ordv)) else ordv
    if ord_key is not None and ord_key != "inf":
        if ord_key != 1:
            # Mirror GradientNorm.evaluate's ValueError: compiling an
            # unknown ord as the L1 sum would certify a silently
            # different condition from the declared L_v.
            raise NotImplementedError(
                "extended sweep supports GradientNorm ord in "
                "{{None, 1, inf}}; got ord={!r}".format(ordv)
                + _FALLBACK)
        ord_key = 1
    idx = len(params)
    params.append(consts + (_split_np(g_tab.reshape(n_cells, d)),))
    delta = _PWL_GRAD_DELTA
    shift_subsets = np.stack(
        np.meshgrid(*([[0, 1]] * d), indexing="ij"),
        axis=-1).reshape(-1, d).astype(np.int32)

    def fn(lp, x):
        theta, _, inv_unit, g_pair = lp[idx]
        _, vertices, onehot, cell_i, z_clip = locate(lp[idx][:3], x)
        n = x[0].shape[0]
        vals = theta[vertices]                        # (N, d+1) exact
        # Simplex gradient numerators: exact f32 differences as pairs.
        dh, dl = two_sum(vals[:, 1:], -vals[:, :-1])  # (N, d) exact
        gh = jnp.zeros((n, d), _F32)
        gl = jnp.zeros((n, d), _F32)
        for k in range(d):
            # g_axis_i += onehot[i, k] * diff_k (0/1 products exact).
            term = (onehot[:, :, k] * dh[:, k][:, None],
                    onehot[:, :, k] * dl[:, k][:, None])
            gh, gl = df_add((gh, gl), term)
        g = df_abs(df_mul((gh, gl), (inv_unit[0][None, :],
                                     inv_unit[1][None, :])))

        # Ambiguity trigger on the f32 hi coordinates (the trigger band
        # only needs to CONTAIN the decision boundary; DELTA towers
        # over the pair's lo word and the analysis' input shifts).
        zh = z_clip[0]
        near_lo = zh < delta
        near_hi = zh > 1.0 - delta
        near_cell = jnp.any(near_lo | near_hi, axis=1)
        pair_diff = jnp.abs(zh[:, :, None] - zh[:, None, :])
        iu = jnp.triu_indices(d, k=1)
        near_face = (jnp.any(pair_diff[:, iu[0], iu[1]] < delta, axis=1)
                     if d > 1 else jnp.zeros((n,), bool))
        amb = near_cell | near_face

        # Neighborhood max over the precomputed per-cell table.
        shift = jnp.where(near_lo, -1, jnp.where(near_hi, 1, 0))
        cstr = jnp.asarray(cell_strides)
        cmax = jnp.asarray(
            np.asarray(cells_shape, np.int32) - 1)[None, :]
        g_nb_h = None
        for s in shift_subsets:
            nb = jnp.clip(cell_i + shift * jnp.asarray(s)[None, :],
                          0, cmax)
            lin = jnp.sum(nb * cstr[None, :], axis=1)
            row = (g_pair[0][lin], g_pair[1][lin])    # (N, d) exact
            g_nb = (row if g_nb_h is None
                    else df_max(g_nb_h, row))
            g_nb_h = g_nb
        g = df_select(amb[:, None], g_nb_h, g)

        if ord_key is None:
            return g                                  # (N, d) columns
        if ord_key == "inf":
            cur = (g[0][:, 0], g[1][:, 0])
            for i in range(1, d):
                cur = df_max(cur, (g[0][:, i], g[1][:, i]))
        else:                                         # ord == 1
            cur = (g[0][:, 0], g[1][:, 0])
            for i in range(1, d):
                cur = df_add(cur, (g[0][:, i], g[1][:, i]))
        return cur[0][:, None], cur[1][:, None]

    dv = d if ord_key is None else 1
    return fn, ("gradpwl", isig, ord_key), dv


def _compile_lf(lipschitz_dynamics, lf_matrix, d, params):
    """L_f evaluator for the threshold, or ``None`` for scalars.

    Scalar ``L_f`` keeps the baked ``one_plus_lf`` constant (returns
    ``None``). A callable ``L_f`` (reference ``lyapunov.py:227-244``
    accepts local Lipschitz functions) requires the row-wise absolute
    linear model ``lf_matrix`` (``L_f(x) = |x H^T|``, one output row),
    spot-checked against the callable like ``lv_matrix``; a
    ``GradientNorm`` of a scalar Triangulation compiles directly via
    :func:`_compile_gradnorm_pwl` (same conservative inflation).
    """
    if not callable(lipschitz_dynamics) or isinstance(
            lipschitz_dynamics, ConstantFunction):
        return None, ("scalar",)

    if lf_matrix is None and isinstance(lipschitz_dynamics, GradientNorm):
        if isinstance(lipschitz_dynamics.fun, NeuralNetwork):
            fn, sig, dv = _compile_gradnorm_spectral(lipschitz_dynamics,
                                                     params)
        else:
            fn, sig, dv = _compile_gradnorm_pwl(lipschitz_dynamics, d,
                                                params)
        if dv != 1:
            raise NotImplementedError(
                "extended sweep needs a scalar L_f; use ord=1 or "
                "ord=inf on the GradientNorm" + _FALLBACK)
        return fn, ("gradlf", sig)

    if lf_matrix is None:
        raise NotImplementedError(
            "extended sweep needs lf_matrix (the H of L_f(x) = |x H^T|) "
            "for a callable L_f; got {} with no model".format(
                type(lipschitz_dynamics).__name__) + _FALLBACK)
    h = np.atleast_2d(np.asarray(lf_matrix, dtype=np.float64))
    if h.shape != (1, d):
        raise ValueError("lf_matrix must be one row with one column "
                         "per state dim")
    idx = len(params)
    params.append((_split_np(h.T),))

    def fn(lp, x):
        return df_abs(df_matmul(x, lp[idx][0]))
    return fn, ("linabs_lf", h.shape)


# ---------------------------------------------------------------------------
# GP blocks
# ---------------------------------------------------------------------------
def _gp_blocks(dynamics):
    """Normalize dynamics into per-factor blocks with float64 mirrors."""
    if isinstance(dynamics, StackedGaussianProcess):
        gps = dynamics.unstack()
    elif isinstance(dynamics, GaussianProcess):
        gps = [dynamics]
    else:
        raise NotImplementedError(
            "extended sweep supports GaussianProcess / "
            "StackedGaussianProcess dynamics; got {}"
            .format(type(dynamics).__name__) + _FALLBACK)
    blocks = []
    for gp in gps:
        host = getattr(gp, "_host_cache", None)
        if host is None or host.count != int(gp.count):
            raise RuntimeError(
                "extended sweep needs the float64 host mirror of the GP "
                "factors (lost when the instance crossed a pytree "
                "boundary) — rebuild the GP or add a data point to "
                "refresh it")
        if not host.fresh:
            # Bordered-append factors differ from a fresh factorization
            # at f64-roundoff-times-condition scale — absorbed by the
            # f32 margins, NOT by the 2^-40 one. Refactorize from
            # scratch (the same code path the oracle's rebuilt GP runs,
            # hence bitwise its factors) for this sweep only.
            from ..functions.gp import _host_factorize

            host = _host_factorize(gp.kernel, gp.X_buf, gp.Y_buf,
                                   gp.mean_function, gp.count,
                                   float(gp.noise_variance), gp.scale)
        if host.jitter != 0.0:
            raise RuntimeError(
                "the GP factorization needed jitter {:.2e}; the jittered "
                "factor is a different model than the oracle's and the "
                "derived margin does not cover it".format(host.jitter))
        mean = gp.mean_function
        if mean is not None and not isinstance(mean, LinearSystem):
            raise NotImplementedError(
                "extended sweep supports LinearSystem prior means; "
                "got {}".format(type(mean).__name__) + _FALLBACK)
        blocks.append({"gp": gp, "host": host, "mean": mean})
    return blocks


def _block_params(blk):
    """Per-block df parameter pytree (factors split EXACTLY from f64)."""
    gp = blk["gp"]
    host = blk["host"]
    p = {
        "chol_inv": _split_np(host.chol_inv),
        "alpha": _split_np(host.alpha),
        "mask": jnp.asarray(
            (np.arange(gp.capacity) < host.count).astype(np.float32)),
        "beta": _split_np(np.float64(gp.beta)),
    }
    if blk["mean"] is not None:
        p["mean_t"] = _split_np(
            np.asarray(blk["mean"].matrix, np.float64).T)
    s = float(gp.scale)
    if s != 1.0:
        p["s2"] = _split_np(np.float64(s) ** 2)
        p["inv_scale"] = _split_np(1.0 / np.float64(s))
        p["inv_s2"] = _split_np(1.0 / np.float64(s) ** 2)
    return p


def _build_block_predict(blk, dims, params_kernel):
    """Compile one block's df posterior: (predict, sig).

    ``predict(bp, kp, x_rows, qh, ql) -> (mean df (N, p), err df (N, p))``
    mirrors ``GaussianProcess.predict`` + ``evaluate``'s XLA path in
    float64 (the oracle's realization): ``kx = s2 K(X, q) * mask``,
    ``a = L^-1 kx``, ``mean = a^T alpha / s + m(q)``,
    ``var = max(diag - sum a^2 / s2, 1e-12)``, ``err = beta sqrt(var)``.
    """
    gp = blk["gp"]
    entry, diag, ksig = _compile_kernel(gp.kernel, dims, params_kernel)
    has_mean = blk["mean"] is not None
    scaled = float(gp.scale) != 1.0
    width = int(gp.output_dim)
    _, _, clamp = _consts()

    def predict(bp, kp, x_rows, qh, ql):
        k = entry(kp, x_rows, qh, ql)
        mask = bp["mask"]
        k = (k[0] * mask[:, None], k[1] * mask[:, None])
        if scaled:
            k = df_mul(k, bp["s2"])
        a = df_matmul(bp["chol_inv"], k)                    # (cap, N)
        mean = df_matmul((a[0].T, a[1].T), bp["alpha"])     # (N, p)
        if scaled:
            mean = df_mul(mean, bp["inv_scale"])
        if has_mean:
            mean = df_add(mean, df_matmul((qh, ql), bp["mean_t"]))
        a2 = df_dot(a, a, axis=0)                           # (N,)
        if scaled:
            a2 = df_mul(a2, bp["inv_s2"])
        var = df_sub(diag(kp, qh, ql), a2)
        var = _df_maximum(var, clamp)
        err = df_mul(bp["beta"], df_sqrt(var))              # (N,)
        err = (jnp.broadcast_to(err[0][:, None], (err[0].shape[0], width)),
               jnp.broadcast_to(err[1][:, None], (err[1].shape[0], width)))
        return mean, err

    sig = (ksig, has_mean, scaled, width, gp.capacity)
    return predict, sig


# ---------------------------------------------------------------------------
# Deterministic dynamics compiler
# ---------------------------------------------------------------------------
def _check_trig_domain(dyn, grid):
    """Refuse instances whose angles could leave df_sin's domain.

    :func:`~safe_learning_tpu.ops.extended.df_sin` / ``df_cos`` are
    rigorous only for ``|x| < 2^22`` (the Cody-Waite quadrant index must
    be exactly representable); beyond it they return garbage SILENTLY.
    The sweep's trig arguments are denormalized grid states (plus
    ``2 theta`` for CartPole) drifted by the Euler sub-steps, whose
    growth over one ``dt`` is a tiny multiple of the state magnitude for
    any physical instance — a 2^9 headroom factor over the grid's
    denormalized infinity norm towers over it while still catching
    pathological normalizers at compile time instead of certifying with
    out-of-contract trig values.
    """
    from ..dynamics import CartPole, InvertedPendulum

    if not isinstance(dyn, (InvertedPendulum, CartPole)):
        return
    # Only the angle dimension feeds df_sin/df_cos (state layouts:
    # pendulum (theta, omega), cart-pole (x, theta, v, omega)), so only
    # its limit x its own normalizer entry bounds the trig argument — a
    # large velocity/position normalizer must not reject the instance.
    angle_dim = 0 if isinstance(dyn, InvertedPendulum) else 1
    amax = float(np.max(np.abs(
        np.asarray(grid.limits, np.float64)[angle_dim])))
    norm = dyn._norm_arrays()
    if norm is not None:
        # Broadcast semantics match the dynamics' ``state / tx``: a
        # scalar (size-1) normalizer applies to every dim including the
        # angle; a per-dim vector indexes the angle's own entry.
        tx = np.abs(np.asarray(norm[0], np.float64)).reshape(-1)
        amax *= float(tx[angle_dim] if tx.size > angle_dim else tx[0])
    if 2.0 * amax * 512.0 >= 2.0 ** 22:
        raise NotImplementedError(
            "extended sweep: denormalized grid states reach {:.3g}, too "
            "close to df_sin's |x| < 2^22 validity domain".format(amax)
            + _FALLBACK)


def _compile_dynamics_det(dyn, params):
    """Deterministic dynamics ``f(x, u)`` in double words.

    Returns ``(fn, sig)`` with ``fn(dp, qh, ql) -> df (N, d) pair``
    mirroring the f32 pipeline's formula term by term: the benchmark
    systems' normalization + ``inner_euler_steps`` fixed-step Euler
    integration (``dynamics.py:_OdeDynamics.evaluate``) with df_sin /
    df_cos for the trigonometry, or a LinearSystem matmul. Derived
    scalar constants (``g/l``, ``1/inertia``, reciprocal normalizers)
    are computed in float64 on the host and split exactly — their
    2^-53 residual against the exact real-arithmetic semantics of the
    stored parameters is far below ``U_EFF``. Covers the CoRL-18
    flagship's deterministic pendulum
    (``examples/lyapunov_function_learning.py``; reference
    ``examples/utilities.py:144-289``).
    """
    from ..dynamics import GRAVITY, CartPole, InvertedPendulum, VanDerPol

    if isinstance(dyn, LinearSystem):
        idx = len(params)
        params.append((_split_np(np.asarray(dyn.matrix, np.float64).T),))

        def fn(dp, qh, ql):
            return df_matmul((qh, ql), dp[idx][0])
        return fn, ("lin_dyn", tuple(np.asarray(dyn.matrix).shape))

    if isinstance(dyn, (InvertedPendulum, VanDerPol, CartPole)):
        steps = int(dyn.inner_euler_steps)
        dt_i = float(dyn.dt) / steps
        d = int(dyn.state_dim)
        norm = dyn._norm_arrays()
        if norm is None:
            txp = tup = itxp = None
        else:
            tx64 = np.asarray(norm[0], np.float64)
            txp = _split_np(tx64)
            itxp = _split_np(1.0 / tx64)
            tup = (None if norm[1] is None
                   else _split_np(np.asarray(norm[1], np.float64)))
        idx = len(params)

        def col(p, j):
            return p[0][:, j:j + 1], p[1][:, j:j + 1]

        if isinstance(dyn, InvertedPendulum):
            m = float(np.asarray(dyn.mass))
            length = float(np.asarray(dyn.length))
            fric = float(np.asarray(dyn.friction))
            inertia = m * length * length
            params.append((
                _split_np(GRAVITY / length), _split_np(1.0 / inertia),
                _split_np(fric / inertia), _split_np(dt_i),
                txp, tup, itxp))

            def ode(dp, x, u):
                gl, ii, fi = dp[idx][0], dp[idx][1], dp[idx][2]
                ang, om = col(x, 0), col(x, 1)
                acc = df_add(df_sub(df_mul(gl, df_sin(ang)),
                                    df_mul(fi, om)), df_mul(ii, u))
                return _concat_pairs([om, acc])
            sig = ("pend", steps, norm is not None)

        elif isinstance(dyn, VanDerPol):
            damping = float(np.asarray(dyn.damping))
            params.append((_split_np(damping), _split_np(dt_i),
                           txp, tup, itxp))

            def ode(dp, x, u):
                damp = dp[idx][0]
                xx, yy = col(x, 0), col(x, 1)
                x_dot = df_neg(yy)
                x2m1 = df_add_f32(df_mul(xx, xx), np.float32(-1.0))
                y_dot = df_add(xx, df_mul(df_mul(damp, x2m1), yy))
                return _concat_pairs([x_dot, y_dot])
            sig = ("vdp", steps, norm is not None)

        else:  # CartPole
            m = float(np.asarray(dyn.pendulum_mass))
            big_m = float(np.asarray(dyn.cart_mass))
            length = float(np.asarray(dyn.length))
            b = float(np.asarray(dyn.rot_friction))
            params.append((
                _split_np(m), _split_np(big_m), _split_np(length),
                _split_np(b * (m + big_m) / (m * length)), _split_np(b),
                _split_np((m + big_m) * GRAVITY),
                _split_np(0.5 * m * GRAVITY * length),
                _split_np(0.5 * m * length), _split_np(dt_i),
                txp, tup, itxp))

            def ode(dp, x, u):
                (mp, bmp, lp, bml, bp, mg, mgl_half, ml_half,
                 _, _, _, _) = dp[idx]
                theta, v, om = col(x, 1), col(x, 2), col(x, 3)
                sin_t = df_sin(theta)
                cos_t = df_cos(theta)
                sin_2t = df_sin(df_pow2_scale(theta, 2.0))
                om2 = df_mul(om, om)
                det = df_mul(lp, df_add(
                    (jnp.broadcast_to(bmp[0], sin_t[0].shape),
                     jnp.broadcast_to(bmp[1], sin_t[1].shape)),
                    df_mul(mp, df_mul(sin_t, sin_t))))
                v_num = df_add(
                    df_sub(df_sub(u, df_mul(df_mul(ml_half,
                                                   df_pow2_scale(om2,
                                                                 2.0)),
                                            sin_t)),
                           df_mul(df_mul(bp, om), cos_t)),
                    df_mul(mgl_half, sin_2t))
                v_dot = df_div(df_mul(v_num, lp), det)
                om_num = df_add(
                    df_sub(df_sub(df_mul(u, cos_t),
                                  df_mul(df_mul(ml_half, om2), sin_2t)),
                           df_mul(bml, om)),
                    df_mul(mg, sin_t))
                om_dot = df_div(om_num, det)
                return _concat_pairs([v, om, v_dot, om_dot])
            sig = ("cartpole", steps, norm is not None)

        has_act = int(dyn.action_dim) > 0
        dt_pair_pos = {"pend": 3, "vdp": 1, "cartpole": 8}[sig[0]]

        def fn(dp, qh, ql):
            x = (qh[:, :d], ql[:, :d])
            u = ((qh[:, d:], ql[:, d:]) if has_act
                 else (jnp.zeros((qh.shape[0], 1), _F32),) * 2)
            p = dp[idx]
            if p[-3] is not None:                      # denormalize
                x = df_mul(x, (p[-3][0][None, :], p[-3][1][None, :]))
            if p[-2] is not None and has_act:
                u = df_mul(u, (p[-2][0][None, :], p[-2][1][None, :]))
            dt_pair = p[dt_pair_pos]
            for _ in range(steps):
                dxdt = ode(dp, x, u)
                x = df_add(x, df_mul(dt_pair, dxdt))
            if p[-1] is not None:                      # normalize
                x = df_mul(x, (p[-1][0][None, :], p[-1][1][None, :]))
            return x
        return fn, sig

    raise NotImplementedError(
        "extended sweep supports GaussianProcess/StackedGaussianProcess "
        "(uncertain) or LinearSystem/InvertedPendulum/CartPole/VanDerPol "
        "(deterministic) dynamics; got {}".format(type(dyn).__name__)
        + _FALLBACK)


# ---------------------------------------------------------------------------
# The sweep
# ---------------------------------------------------------------------------
_PIPELINES = {}


def _concat_pairs(pairs, axis=1):
    return (jnp.concatenate([p[0] for p in pairs], axis=axis),
            jnp.concatenate([p[1] for p in pairs], axis=axis))


class ExtendedSweep:
    """Double-word decrease-condition sweep for one Lyapunov instance.

    Construction compiles (or reuses, keyed on structure) the jitted
    pipeline and snapshots the instance's parameters as exact df splits;
    rebuild after any model change (``Lyapunov._get_extended_sweep``
    does this automatically, keyed on the model object identities).

    Parameters
    ----------
    lyapunov : Lyapunov
    lv_matrix : array (dv, d), optional
        Model of a callable ``L_v`` as the row-wise absolute linear
        form ``L_v(x) = |x G^T|``. Spot-checked against the callable on
        a grid sample at construction (1e-4 relative) — a mismatched
        model fails loudly instead of certifying the wrong condition.
    """

    def __init__(self, lyapunov, lv_matrix=None, lf_matrix=None):
        eft_selfcheck()
        if lv_matrix is None:
            lv_matrix = _auto_lv_matrix(lyapunov)
        d = lyapunov.discretization.ndim
        self._tau = float(lyapunov.tau)

        dynamics = lyapunov.dynamics
        if isinstance(dynamics, FunctionStack):
            # The reference's per-dimension stack idiom (reference
            # functions.py:254-307): batch it to the prediction-
            # identical StackedGaussianProcess twin so the df pipeline
            # needs no hand-conversion.
            try:
                dynamics = coerce_stacked(dynamics)
            except ValueError as exc:
                raise NotImplementedError(
                    "extended sweep: this FunctionStack of GPs cannot "
                    "be batched ({}); construct a "
                    "StackedGaussianProcess directly, or use the plain "
                    "sweep with a margin from errorbounds."
                    "analytic_certificate_margin / oracle."
                    "calibrate_certificate_margin".format(exc)) from exc
        det = not isinstance(dynamics,
                             (GaussianProcess, StackedGaussianProcess))
        if det:
            blocks, predicts, bsigs, widths = [], [], [], []
            nd = None
        else:
            blocks = _gp_blocks(dynamics)
            nd = blocks[0]["gp"].input_dim
            for blk in blocks:
                if blk["gp"].input_dim != nd:
                    raise ValueError("stacked GP members disagree on "
                                     "input_dim")

        kparams, pparams, vparams, lparams = [], [], [], []
        fparams, dparams = [], []
        policy_fn, psig = _compile_policy(lyapunov.policy, pparams)
        v_fn, vsig = _compile_candidate(lyapunov.lyapunov_function,
                                        vparams)
        # At tau == 0 with deterministic dynamics, L_v multiplies only
        # the (zero) threshold and there is no error term: the sweep
        # does not evaluate it at all (the CoRL-18 flagship's
        # GradientNorm(LyapunovNetwork) L_v, examples/
        # lyapunov_function_learning.py, needs no df compilation).
        lv_trivial = det and self._tau == 0.0
        if lv_trivial:
            lv_fn, lsig, dv = None, ("zero_tau",), 1
        else:
            lv_fn, lsig, dv = _compile_lv(lyapunov._lipschitz_lyapunov,
                                          lv_matrix, d, lparams)
            self._spotcheck_lv(lyapunov, lv_matrix, dv)
        self._requires_zero_tau = lv_trivial

        if lv_trivial:
            # The threshold is exactly zero: L_f multiplies nothing, so
            # the sweep accepts any L_f without compiling or modeling it
            # (mirrors the L_v elision above).
            lf_fn, lfsig = None, ("zero_tau",)
            one_plus_lf = _split_np(0.0)  # unused placeholder
        else:
            lf_fn, lfsig = _compile_lf(lyapunov._lipschitz_dynamics,
                                       lf_matrix, d, fparams)
            if lf_fn is None:
                lf_scalar = lyapunov._lipschitz_dynamics
                if isinstance(lf_scalar, ConstantFunction):
                    # Valid for the plain sweep via _eval_lipschitz;
                    # the baked scalar path serves it here.
                    lf_scalar = np.asarray(lf_scalar.constant)
                try:
                    # Any real scalar (python float, int, numpy scalar,
                    # size-1 array).
                    one_plus_lf = _split_np(1.0 + np.asarray(
                        lf_scalar, dtype=np.float64).reshape(()).item())
                except (TypeError, ValueError):
                    raise NotImplementedError(
                        "extended sweep needs a scalar L_f (or a "
                        "callable with an lf_matrix model / a "
                        "GradientNorm of a Triangulation)")
            else:
                one_plus_lf = _split_np(0.0)  # unused placeholder
                self._spotcheck_lf(lyapunov, lf_matrix)

        if det:
            _check_trig_domain(dynamics, lyapunov.discretization)
            dyn_fn, dsig = _compile_dynamics_det(dynamics, dparams)
            n_out = d
        else:
            dyn_fn, dsig = None, ("gp",)
            dims = np.arange(nd)
            predicts = []
            bsigs = []
            for blk in blocks:
                predict, bsig = _build_block_predict(blk, dims, kparams)
                predicts.append(predict)
                bsigs.append(bsig)
            widths = [int(blk["gp"].output_dim) for blk in blocks]
            n_out = sum(widths)
        if dv not in (1, n_out):
            raise ValueError(
                "lv_matrix rows ({}) must be 1 or the number of "
                "dynamics outputs ({})".format(dv, n_out))

        sig = (psig, vsig, lsig, lfsig, dsig, tuple(bsigs), d, nd, dv,
               det)
        self._sig = sig
        self._d = d
        self._det = det
        self._params = {
            "kernels": tuple(kparams),
            "policy": tuple(pparams),
            "v": tuple(vparams),
            "lv": tuple(lparams),
            "lf": tuple(fparams),
            "dynamics": tuple(dparams),
            "blocks": tuple(_block_params(blk) for blk in blocks),
            # Exact double-word split of the training rows. In float32
            # mode this is (X, 0) bit for bit (the rows ARE f32); in
            # float64 mode the split reproduces the f64 rows the host
            # factors were built from to ~2^-49 relative — far below
            # the U_EFF = 2^-40 unit the derived margins model, so the
            # representation residual is dominated by the analysis'
            # per-op slack (ops round at ~2^-45-2^-48 against U_EFF).
            "x_rows": (_split_np(
                np.asarray(blocks[0]["gp"].X_buf, np.float64))
                if blocks else _split_np(np.zeros((1, 1)))),
            "one_plus_lf": one_plus_lf,
        }
        self._unit_maxes = np.asarray(lyapunov.discretization.unit_maxes,
                                      dtype=np.float64)

        if sig not in _PIPELINES:
            def core(params, points, tau):
                """(decrease, threshold) as df pairs at ``points``.

                The residual split is exact-zero for f32 points (the
                f32-mode program is unchanged) and carries the f64
                remainder in float64 mode, so the sweep evaluates at
                the f64 grid points themselves instead of silently
                rounding them to f32 (a ~2^-24 input perturbation the
                2^-40 margins could not cover)."""
                xh = points.astype(_F32)
                xl = (points - xh.astype(points.dtype)).astype(_F32)
                u = policy_fn(params["policy"], xh, xl)
                qh = jnp.concatenate([xh, u[0]], axis=1)
                ql = jnp.concatenate([xl, u[1]], axis=1)
                if det:
                    mean = dyn_fn(params["dynamics"], qh, ql)
                    err = None
                else:
                    outs = [pred(bp, params["kernels"],
                                 params["x_rows"], qh, ql)
                            for pred, bp in zip(predicts,
                                                params["blocks"])]
                    mean = _concat_pairs([o[0] for o in outs])
                    err = _concat_pairs([o[1] for o in outs])

                vx = v_fn(params["v"], (xh, xl))
                vn = v_fn(params["v"], mean)
                dec = df_sub(vn, vx)
                if err is not None:
                    lvn = lv_fn(params["lv"], mean)      # (N, dv)
                    if dv == 1:
                        serr = (_sum_cols(err) if err[0].shape[1] > 1
                                else (err[0][:, 0], err[1][:, 0]))
                        bound = df_mul((lvn[0][:, 0], lvn[1][:, 0]),
                                       serr)
                    else:
                        bound = _sum_cols(df_mul(lvn, err))
                    dec = df_add(dec, bound)

                n = dec[0].shape[0]
                if lv_fn is None:
                    # tau == 0, deterministic: the threshold is exactly
                    # zero whatever L_v is.
                    thr = (jnp.zeros((n,), _F32), jnp.zeros((n,), _F32))
                    return dec, thr
                lvx = lv_fn(params["lv"], (xh, xl))
                lt = (_sum_cols(df_abs(lvx)) if dv > 1
                      else (lvx[0][:, 0], lvx[1][:, 0]))
                if lf_fn is None:
                    opl = params["one_plus_lf"]
                else:
                    lfx = lf_fn(params["lf"], (xh, xl))
                    opl = df_add_f32((lfx[0][:, 0], lfx[1][:, 0]),
                                     np.float32(1.0))
                thr = df_neg(df_mul(df_mul(lt, opl), tau))
                thr = (jnp.broadcast_to(thr[0], (n,)),
                       jnp.broadcast_to(thr[1], (n,)))
                return dec, thr

            def body(params, points, tau, margin):
                dec, thr = core(params, points, tau)
                return df_less(dec, df_sub(thr, margin))

            def refined_body(params, states, half_unit, tau, margin,
                             r, nd_):
                # Mirror _refined_negative_batch's f32 sub-point
                # construction EXACTLY (same expression, same dtype),
                # then check the df condition at those points.
                combos = np.stack(
                    np.meshgrid(*[np.arange(r)] * nd_, indexing="ij"),
                    axis=-1).reshape(-1, nd_).astype(np.float64)
                if r > 1:
                    unit = -1.0 + 2.0 * combos / (r - 1.0)
                else:
                    unit = np.zeros_like(combos)
                unit = jnp.asarray(unit, dtype=states.dtype)
                points = states[:, None, :] + half_unit * unit[None, :, :]
                flat = points.reshape(-1, nd_)
                ok = body(params, flat, tau, margin)
                return jnp.all(ok.reshape(states.shape[0], -1), axis=1)

            def explore_body(params, state_actions, cmax, margin):
                """df exploration scoring (explore._score_candidates).

                ``v(mu) + sum_j |lv_j| err_j < c_max - margin`` at exact
                f32 candidate rows; also returns the f32 selection
                score (summed confidence widths) and the rounded mean
                next state for membership checks. Same exact residual
                split as ``core``: float64-mode candidates are scored
                at their own coordinates, not f32 roundings of them."""
                qh = state_actions.astype(_F32)
                ql = (state_actions
                      - qh.astype(state_actions.dtype)).astype(_F32)
                outs = [pred(bp, params["kernels"], params["x_rows"],
                             qh, ql)
                        for pred, bp in zip(predicts, params["blocks"])]
                mean = _concat_pairs([o[0] for o in outs])
                err = _concat_pairs([o[1] for o in outs])
                vn = v_fn(params["v"], mean)
                lvn = df_abs(lv_fn(params["lv"], mean))
                if dv == 1:
                    serr = (_sum_cols(err) if err[0].shape[1] > 1
                            else (err[0][:, 0], err[1][:, 0]))
                    errterm = df_mul((lvn[0][:, 0], lvn[1][:, 0]), serr)
                else:
                    errterm = _sum_cols(df_mul(lvn, err))
                future = df_add(vn, errterm)
                inside = df_less(future, df_sub(cmax, margin))
                score = jnp.sum(err[0], axis=1)
                return score, inside, mean[0] + mean[1]

            _PIPELINES[sig] = (
                jax.jit(body),
                jax.jit(refined_body, static_argnames=("r", "nd_")),
                jax.jit(core), body,
                None if det else jax.jit(explore_body))
        (self._jit_body, self._jit_refined, self._jit_core,
         self._body_raw, self._jit_explore) = _PIPELINES[sig]

    @staticmethod
    def _model_reltol():
        """Spot-check tolerance, matched by the f32-unit model slack.

        A genuine working-dtype realization of the row-wise absolute
        linear form rounds at most ``(d+2)`` unit roundoffs relative to
        the POSITIVE form ``|x| |G|^T``; 32 units admits reassociated
        but mathematically equal formulas (``|x (2P)^T|`` vs
        ``2 |x P^T|``) across the supported dims while refusing
        callables that genuinely differ from the form. Crucially the
        same 32-unit slack is added back into the f32-unit rounding
        models (:func:`_lv_error_model` / :func:`_lf_error_model`), so
        ANY callable that passes the check deviates from the certified
        form by less than the margins those models derive — the hybrid
        sweep's extended-identity argument holds for probed and
        installed models alike (round-5 review)."""
        from ..errorbounds import _unit_roundoff
        return 32.0 * _unit_roundoff()

    @staticmethod
    def _spotcheck_lf(lyapunov, lf_matrix):
        """Fail loudly if lf_matrix disagrees with the callable L_f."""
        lf = lyapunov._lipschitz_dynamics
        if lf_matrix is None or not callable(lf):
            return
        grid = lyapunov.discretization
        rng = np.random.default_rng(1)
        idx = rng.choice(grid.nindex, size=min(grid.nindex, 256),
                         replace=False)
        pts = np.asarray(grid.all_points[idx], dtype=config.np_dtype)
        got = np.asarray(lf(jnp.asarray(pts)), dtype=np.float64)
        h64 = np.asarray(lf_matrix, np.float64)
        want = np.abs(pts.astype(np.float64) @ h64.T)
        got = got.reshape(len(pts), -1)
        # Scale on the POSITIVE form |x| |H|^T: at cancelling points the
        # f32 callable legitimately rounds |x H^T| ~ 0 at eps32 of the
        # term magnitudes, not of the tiny result.
        scale = np.maximum(np.abs(pts).astype(np.float64) @ np.abs(h64).T,
                           1e-6)
        if got.shape != want.shape or np.max(
                np.abs(got - want) / scale) > ExtendedSweep._model_reltol():
            raise ValueError(
                "lf_matrix does not reproduce the callable "
                "lipschitz_dynamics on a grid sample — the extended "
                "sweep would certify a different condition")

    @staticmethod
    def _spotcheck_lv(lyapunov, lv_matrix, dv):
        """Fail loudly if lv_matrix disagrees with the callable L_v."""
        lv = lyapunov._lipschitz_lyapunov
        if lv_matrix is None or not callable(lv):
            return
        grid = lyapunov.discretization
        rng = np.random.default_rng(0)
        idx = rng.choice(grid.nindex, size=min(grid.nindex, 256),
                         replace=False)
        pts = np.asarray(grid.all_points[idx], dtype=config.np_dtype)
        got = np.asarray(lv(jnp.asarray(pts)), dtype=np.float64)
        g64 = np.asarray(lv_matrix, np.float64)
        want = np.abs(pts.astype(np.float64) @ g64.T)
        got = got.reshape(len(pts), -1)
        # Positive-form scale: see _spotcheck_lf.
        scale = np.maximum(np.abs(pts).astype(np.float64) @ np.abs(g64).T,
                           1e-6)
        if got.shape != want.shape or np.max(
                np.abs(got - want) / scale) > ExtendedSweep._model_reltol():
            raise ValueError(
                "lv_matrix does not reproduce the callable "
                "lipschitz_lyapunov on a grid sample — the extended "
                "sweep would certify a different condition")

    # -- public API -------------------------------------------------------
    def negative_batch(self, states, tau=None, margin=0.0):
        """Double-word decrease check; returns a device bool (N,)."""
        tau = self._tau if tau is None else float(tau)
        if self._requires_zero_tau and tau != 0.0:
            raise ValueError(
                "this sweep was compiled for tau == 0 (L_v was elided "
                "from the zero threshold); rebuild with a nonzero "
                "instance tau to use one")
        # Native dtype in (see ``core``): f32 states pass through
        # bit-exactly; f64 states ride the exact residual split.
        # ``margin`` may be a per-point (N,) array aligned with states.
        return self._jit_body(self._params, jnp.asarray(states),
                              _split_np(tau),
                              _split_np(np.asarray(margin, np.float64)))

    def margins(self, states, tau=None):
        """Double-word ``decrease - threshold`` at ``states``, as float64.

        Diagnostics / test hook: the returned values carry the full
        double-word precision (rounding ``hi + lo`` into f64 is exact up
        to one f64 ulp), so comparing them against
        ``oracle.oracle_margins`` measures the extended pipeline's true
        deviation."""
        tau = self._tau if tau is None else float(tau)
        dec, thr = self._jit_core(self._params, jnp.asarray(states),
                                  _split_np(tau))
        dec64 = (np.asarray(dec[0], np.float64)
                 + np.asarray(dec[1], np.float64))
        thr64 = (np.asarray(thr[0], np.float64)
                 + np.asarray(thr[1], np.float64))
        return dec64 - thr64

    def score_candidates(self, state_actions, c_max, margin=0.0):
        """Double-word exploration check at exact f32 candidate rows.

        Returns ``(score, inside, mean_next)`` device arrays: the f32
        selection score (summed confidence widths, the argmax
        criterion), the certified ``v_future < c_max - margin``
        verdict, and the rounded mean next state (for the
        safe-set-membership filter). The candidate values themselves
        are the model inputs — any construction realization is covered
        by the exploration margin's policy/perturbation rounding terms
        (``errorbounds.analytic_exploration_margin``)."""
        if self._jit_explore is None:
            raise NotImplementedError(
                "extended exploration scoring needs uncertain (GP) "
                "dynamics — deterministic dynamics have no predictive "
                "variance to rank candidates by")
        # Native dtype in: explore_body's exact residual split scores
        # float64-mode candidates at their own coordinates (an f32 cast
        # here would score a perturbed point but return the unperturbed
        # candidate).
        return self._jit_explore(self._params,
                                 jnp.asarray(state_actions),
                                 _split_np(float(c_max)),
                                 _split_np(float(margin)))

    def refined_negative_batch(self, states, max_refinement, margin=0.0):
        """Sound df check on the R^d sub-grids at ``tau / R``.

        A per-point (N,) margin is repeated over each state's R^d
        sub-points (the flat layout is state-major)."""
        r = int(max_refinement)
        half = jnp.asarray(
            ((0.5 * (1.0 - 1.0 / r)) * self._unit_maxes)
            .astype(config.np_dtype))
        m = np.asarray(margin, np.float64)
        if m.ndim == 1:
            m = np.repeat(m, r ** self._d)
        return self._jit_refined(self._params, jnp.asarray(states),
                                 half, _split_np(self._tau / r),
                                 _split_np(m), r=r, nd_=self._d)


# ---------------------------------------------------------------------------
# Standalone df GP evaluation (testing / diagnostics)
# ---------------------------------------------------------------------------
def extended_gp_evaluate(gp, points):
    """Double-word ``(mean, beta * std)`` of a GP, as float64 arrays.

    Runs the same df posterior the sweep uses, standalone; the returned
    float64 values carry the full ~2^-45 double-word precision (rounding
    hi + lo into one f64 is exact). Useful for validating the df
    pipeline against the float64 oracle without a Lyapunov instance.
    """
    eft_selfcheck()
    blocks = _gp_blocks(gp)
    dims = np.arange(blocks[0]["gp"].input_dim)
    outs = []
    qh, ql = _split_np(np.asarray(points, np.float64))
    for blk in blocks:
        kparams = []  # fresh per block: entry closures index from 0
        predict, _ = _build_block_predict(blk, dims, kparams)
        bp = _block_params(blk)
        x_pair = _split_np(np.asarray(blk["gp"].X_buf, np.float64))
        mean, err = jax.jit(predict)(bp, tuple(kparams), x_pair,
                                     qh, ql)
        outs.append((mean, err))
    mean = _concat_pairs([o[0] for o in outs])
    err = _concat_pairs([o[1] for o in outs])
    to64 = lambda p: (np.asarray(p[0], np.float64)  # noqa: E731
                      + np.asarray(p[1], np.float64))
    return to64(mean), to64(err)


# ---------------------------------------------------------------------------
# The derived margin at U_EFF
# ---------------------------------------------------------------------------
def _gradnorm_error_model(lv):
    """One-sided ``ErrorModel`` of the INFLATED GradientNorm program.

    Valid ONLY for the extended pipeline's realizations. A
    ``GradientNorm(NeuralNetwork)`` compiles to the baked spectral
    constant (:func:`_compile_gradnorm_spectral`): it dominates the
    exact callable everywhere, so the unsound deviation is zero, the
    one-sided excess over the plain anchor is at most the constant
    itself (the callable is nonnegative), and a constant has no input
    sensitivity, so shifts need no headroom cap.

    A ``GradientNorm(Triangulation)`` compiles to the inflated PWL
    program (:func:`_compile_gradnorm_pwl`), whose cell-max inflation
    inside the ``DELTA`` trigger band makes locate disagreement
    conservative; the remaining deviation in the unsound direction is
    pure df rounding, bounded relative to the neighborhood gradient
    magnitude. The magnitude table is dilated by TWO cells per axis:
    one for the df program's distance-1 neighborhood max, one for the
    bound sweep's own f32 locate misassignment. ``max_input_shift``
    caps the input uncertainty at half the trigger band (in state
    units per dim) so a non-ambiguous df locate implies every
    realization (df, f64 oracle) sits in the same simplex.
    """
    from scipy.ndimage import maximum_filter

    from ..errorbounds import ErrorModel

    inner = lv.fun
    if isinstance(inner, NeuralNetwork):
        try:
            dv_c = _spectral_ord(lv)
        except NotImplementedError:
            return None
        if dv_c is None:
            return None
        dv, cord = dv_c
        cst = jnp.asarray(cord, dtype=config.dtype)

        def _zero(x):
            return jnp.zeros((x.shape[0], dv), dtype=config.dtype)

        def _anchor(x):
            return jnp.full((x.shape[0], dv), cst, dtype=config.dtype)

        return ErrorModel(_zero, 0.0, anchor_bound=_anchor)
    if not (isinstance(inner, Triangulation) and inner.output_dim == 1):
        return None
    ordv = lv.ord
    g_tab, cells_shape, unit64 = _pwl_gradient_cell_table(inner)
    d = len(cells_shape)
    dil = maximum_filter(g_tab, size=tuple([5] * d + [1]),
                         mode="nearest")
    if ordv is not None and np.isinf(ordv):
        red = dil.max(axis=-1, keepdims=True)
    elif ordv == 1:
        red = dil.sum(axis=-1, keepdims=True)
    elif ordv is None:
        red = dil
    else:
        return None
    n_cells = int(np.prod(cells_shape))
    table = jnp.asarray(red.reshape(n_cells, -1), dtype=config.dtype)
    grid_v = inner.discretization
    lim64 = np.asarray(grid_v._limits, np.float64)
    off = jnp.asarray(lim64[:, 0], dtype=config.dtype)
    inv_unit = jnp.asarray(1.0 / unit64, dtype=config.dtype)
    cmax = jnp.asarray(np.asarray(cells_shape, np.int32) - 1)
    cell_strides = jnp.asarray(np.asarray(
        np.cumprod((tuple(cells_shape[1:]) + (1,))[::-1])[::-1],
        np.int32))
    gam = (2 * d + 8) * U_EFF / (1.0 - (2 * d + 8) * U_EFF)

    def _rows(x):
        cell = jnp.clip(jnp.floor((x - off[None, :])
                                  * inv_unit[None, :]).astype(jnp.int32),
                        0, cmax[None, :])
        lin = jnp.sum(cell * cell_strides[None, :], axis=1)
        return table[lin]

    def eval_bound(x):
        return gam * _rows(x)

    return ErrorModel(eval_bound, 0.0, anchor_bound=_rows,
                      max_input_shift=0.5 * float(_PWL_GRAD_DELTA)
                      * unit64)


def _lv_error_model(lyapunov, lv_matrix, unit=U_EFF):
    """Rounding model of the instance's L_v at ``unit``, or None.

    ``lv_matrix`` defaults to the auto-derivable form
    (:func:`_auto_lv_matrix`) or the instance's ``extended_lv_matrix``;
    a ``GradientNorm``-of-PWL L_v gets the one-sided inflated-program
    model (:func:`_gradnorm_error_model`) — valid ONLY for the extended
    pipeline's realization, so that path is refused at any other unit
    (the plain f32 sweep evaluates the callable itself, whose locate
    decisions the inflation argument does not cover).

    The default ``unit=U_EFF`` models the double-word pipeline, which
    computes the FORM itself (the certified condition); the hybrid
    band margin passes the f32 sweep's hardware-slack-adjusted unit
    (``errorbounds._unit_roundoff``) to bound the PLAIN realization —
    the CALLABLE — so the f32-unit model carries both the (d+2)-op
    matvec rounding and the spot-check's 32-unit form-deviation slack
    (any callable the check admits sits within it).
    """
    from ..errorbounds import ErrorModel

    if lv_matrix is None:
        lv_matrix = _auto_lv_matrix(lyapunov)
    if lv_matrix is None:
        lv_matrix = getattr(lyapunov, "extended_lv_matrix", None)
    if lv_matrix is None:
        if isinstance(lyapunov._lipschitz_lyapunov, GradientNorm):
            if unit != U_EFF:
                return None
            return _gradnorm_error_model(lyapunov._lipschitz_lyapunov)
        return None
    g = np.atleast_2d(np.asarray(lv_matrix, dtype=np.float64))
    g_abs_t = jnp.asarray(np.abs(g).T, dtype=config.dtype)
    d = lyapunov.discretization.ndim
    gam = (d + 2) * unit / (1.0 - (d + 2) * unit)
    if unit != U_EFF:
        # The plain realization is the CALLABLE, spot-checked against
        # the form within _model_reltol (= 32 working units): add that
        # slack so any accepted callable's residual form deviation is
        # covered by this model, not just its own rounding.
        gam += 32.0 * unit

    def eval_bound(x):
        return gam * jnp.abs(x) @ g_abs_t

    return ErrorModel(eval_bound,
                      float(np.max(np.sum(np.abs(g), axis=1))))


def _lf_error_model(lyapunov, lf_matrix=None, unit=U_EFF):
    """Rounding model of a callable L_f at ``unit``, or None for scalars.

    Same unit semantics as :func:`_lv_error_model`."""
    from ..errorbounds import ErrorModel

    lf = lyapunov._lipschitz_dynamics
    if not callable(lf) or isinstance(lf, ConstantFunction):
        return None
    if lf_matrix is None:
        lf_matrix = getattr(lyapunov, "extended_lf_matrix", None)
    if lf_matrix is None:
        if isinstance(lf, GradientNorm):
            if unit != U_EFF:
                return None
            return _gradnorm_error_model(lf)
        return None
    h = np.atleast_2d(np.asarray(lf_matrix, dtype=np.float64))
    h_abs_t = jnp.asarray(np.abs(h).T, dtype=config.dtype)
    d = lyapunov.discretization.ndim
    gam = (d + 2) * unit / (1.0 - (d + 2) * unit)
    if unit != U_EFF:
        # Spot-check slack: see the L_v model above.
        gam += 32.0 * unit

    def eval_bound(x):
        return gam * jnp.abs(x) @ h_abs_t

    return ErrorModel(eval_bound,
                      float(np.max(np.sum(np.abs(h), axis=1))))


def hybrid_band_margin(lyapunov, lv_matrix=None, refinement=1,
                       safety=1.0):
    """Derived PER-POINT f32 margin for the hybrid two-pass sweep.

    ``update_safe_set(extended="hybrid")`` runs the plain f32 pipeline
    once, keeps every verdict whose computed ``decrease - threshold``
    clears this margin (plus twice the extended margin) on either side,
    and re-checks only the remaining ambiguity band with the double-word
    pipeline. For that filter to reproduce the full extended sweep's
    verdicts EXACTLY, the band margin must bound the plain pipeline's
    rounding two-sidedly at every grid point — which is precisely
    :func:`~safe_learning_tpu.errorbounds.analytic_certificate_margin`
    at the f32 unit; this wrapper resolves the instance's L_v/L_f
    models the same way :func:`extended_certificate_margin` does, but
    at the f32 unit.

    Raises ``NotImplementedError`` for instances whose plain-pipeline
    L_v/L_f realization has no f32 rounding model (``GradientNorm`` of
    a PWL without an installed ``extended_lv_matrix``): the full
    ``update_safe_set(extended=True)`` sweep remains available there.
    At ``tau == 0`` with deterministic dynamics no L_v/L_f model is
    needed at all (both multiply only the exactly-zero threshold, the
    same elision the extended sweep makes), so callables there are
    accepted.
    """
    from ..errorbounds import (_gp_members, _unit_roundoff,
                               analytic_certificate_margin)

    u32 = _unit_roundoff()
    lvm = lfm = None
    lv_trivial = (_gp_members(lyapunov.dynamics) is None
                  and float(lyapunov.tau) == 0.0)
    if not lv_trivial:
        lvm = _lv_error_model(lyapunov, lv_matrix, unit=u32)
        if lvm is None and callable(lyapunov._lipschitz_lyapunov) \
                and not isinstance(lyapunov._lipschitz_lyapunov,
                                   ConstantFunction):
            raise NotImplementedError(
                "hybrid sweep: no f32 rounding model for the plain "
                "realization of this L_v (a GradientNorm-of-PWL is "
                "only modeled for the extended pipeline's inflated "
                "program) — install extended_lv_matrix, or run "
                "update_safe_set(extended=True)")
        lfm = _lf_error_model(lyapunov, unit=u32)
        if lfm is None and callable(lyapunov._lipschitz_dynamics) \
                and not isinstance(lyapunov._lipschitz_dynamics,
                                   ConstantFunction):
            raise NotImplementedError(
                "hybrid sweep: no f32 rounding model for the plain "
                "realization of this L_f — install extended_lf_matrix, "
                "or run update_safe_set(extended=True)")
    return analytic_certificate_margin(
        lyapunov, safety=safety, lipschitz_model=lvm,
        refinement=refinement, set_margin=False, lf_model=lfm,
        per_point=True)


def extended_exploration_margin(lyapunov, perturbations=None,
                                actions=None, limits=None, safety=1.0,
                                lv_matrix=None, set_margin=True,
                                candidates=None):
    """Derived exploration margin at ``U_EFF`` for the df scoring path.

    Bounds ``|v_future_dw(q) - v_future_exact(q)|`` over the given
    exact ``candidates`` rows (tightest; what
    ``get_safe_sample(..., extended=True)`` derives per call) or over
    every candidate the runtime can construct (grid states crossed
    with the action/perturbation set, with f32 construction rounding
    folded in — see
    :func:`~safe_learning_tpu.errorbounds.analytic_exploration_margin`)
    and installs it as ``lyapunov.exploration_margin``, which the
    exploration level test prefers. Every pair the extended scorer
    accepts then satisfies the EXACT level condition, not just the f32
    one.
    """
    from ..errorbounds import analytic_exploration_margin

    return analytic_exploration_margin(
        lyapunov, perturbations=perturbations, actions=actions,
        limits=limits, safety=safety,
        lipschitz_model=_lv_error_model(lyapunov, lv_matrix),
        unit_roundoff=U_EFF, set_margin=set_margin,
        candidates=candidates)


def extended_certificate_margin(lyapunov, lv_matrix=None, refinement=1,
                                safety=1.0, set_margin=True,
                                per_point=False):
    """Derived conservative margin for the EXTENDED sweep.

    Runs the parametric Higham analysis
    (:func:`~safe_learning_tpu.errorbounds.analytic_certificate_margin`)
    at ``unit_roundoff = U_EFF`` — rigorous for the double-word pipeline
    by the bounds quoted in :data:`U_EFF` — and installs it together
    with an f32-scale LEVEL margin (the certified-level cut compares
    the f32-stored Lyapunov values regardless of how the decrease was
    checked, so that guard must stay at f32 scale; closed forms below
    for quadratic/PWL candidates, the generic candidate rounding rule
    at the f32 unit otherwise).

    Returns the decrease margin. Typical values sit ~2^18 below the f32
    derived margin on the same instance, making the derived (full-
    coverage, non-sampled) certificate usable on ill-conditioned
    instances where the f32 bound exceeds the threshold itself.
    """
    from ..errorbounds import analytic_certificate_margin

    lvm = _lv_error_model(lyapunov, lv_matrix)
    margin = analytic_certificate_margin(
        lyapunov, safety=safety, lipschitz_model=lvm,
        refinement=refinement, set_margin=False, unit_roundoff=U_EFF,
        lf_model=_lf_error_model(lyapunov), per_point=per_point)

    # f32-scale LEVEL margin: the certified-level cut compares the
    # f32-stored ranking values, so this guard stays at f32 scale.
    v_fun = lyapunov.lyapunov_function
    grid = lyapunov.discretization
    d = grid.ndim
    eps32 = float(np.finfo(np.float32).eps)
    u32s = eps32 / 2.0 * float(getattr(config, "fp_error_factor", 4.0))
    if isinstance(v_fun, QuadraticFunction):
        # Closed form for x^T P x over the box: <= 2d + 2 sequential
        # roundings per point against the positive anchor |x|^T |P| |x|,
        # maximized at the per-dim |corner|.
        corner = np.max(np.abs(np.asarray(grid.limits, np.float64)),
                        axis=1)
        p_abs = np.abs(np.asarray(v_fun.matrix, np.float64))
        v_mag = float(corner @ p_abs @ corner)
        n_ops = 2 * d + 2
        gam32 = n_ops * u32s / (1.0 - n_ops * u32s)
        err32 = gam32 * v_mag
    elif isinstance(v_fun, Triangulation):
        theta = np.asarray(v_fun.parameters, np.float64)[:, 0]
        v_mag = float(np.max(np.abs(theta))) or 1.0
        if v_fun.discretization == grid:
            # Ranking values are EXACT table reads
            # (Lyapunov.update_values -> _direct_grid_values): only the
            # ulp floor below applies.
            err32 = 0.0
        else:
            # f32 PWL evaluation at grid points: weight-arithmetic
            # rounding + per-dim gradient times the f32 fractional-
            # coordinate rounding (grid points are interior: no
            # out-of-domain excess).
            grid_v = v_fun.discretization
            shape = tuple(int(n) for n in grid_v.shape)
            vals_nd = theta.reshape(shape)
            unit_v = np.asarray(grid_v.unit_maxes, np.float64)
            g_per_dim = np.array([
                (float(np.max(np.abs(np.diff(vals_nd, axis=ax))))
                 if shape[ax] > 1 else 0.0) / unit_v[ax]
                for ax in range(d)])
            corner = np.max(np.abs(np.asarray(grid.limits, np.float64)),
                            axis=1)
            off_abs = np.abs(np.asarray(grid_v.offset, np.float64))
            delta32 = 3.0 * u32s * (corner + off_abs)
            n_ops = 3 * d + 10
            gam32 = n_ops * u32s / (1.0 - n_ops * u32s)
            w_sum = 1.0 + 2.0 * float(np.sum(delta32 / unit_v))
            err32 = (gam32 * (d + 1) * v_mag * w_sum
                     + 2.0 * float(g_per_dim @ delta32))
    else:
        # Generic candidates (LyapunovNetwork, NN, scaled): evaluate the
        # candidate rounding rule at the f32 unit over the grid — the
        # ranking values come from the plain f32 update_values pass.
        from ..errorbounds import _candidate_model

        rule32 = jax.jit(_candidate_model(v_fun, d, u32s))
        err32 = 0.0
        v_mag = 0.0
        pts_all = grid.all_points
        for start in range(0, grid.nindex, 2 ** 14):
            pts = jnp.asarray(pts_all[start:start + 2 ** 14],
                              dtype=config.dtype)
            mag_b, err_b = jax.device_get(
                rule32(pts, jnp.abs(pts), jnp.zeros_like(pts)))
            err32 = max(err32, float(np.max(err_b)))
            v_mag = max(v_mag, float(np.max(np.abs(mag_b))))
        v_mag = v_mag or 1.0
    level_margin = max(2.0 * float(safety) * err32,
                       4.0 * eps32 * v_mag)

    if set_margin:
        lyapunov.certificate_margin = margin
        lyapunov.level_margin = level_margin
        # Tag the margin with its derivation unit: it covers ONLY the
        # extended pipeline; the plain f32 sweep refuses to consume it
        # (Lyapunov._require_f32_margin).
        lyapunov._certificate_margin_unit = U_EFF
        if lv_matrix is not None:
            lyapunov.extended_lv_matrix = lv_matrix
    return margin
