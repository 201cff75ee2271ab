"""Fused GP posterior predict as a Pallas TPU kernel.

The verification hot loop (SURVEY.md section 3.1) evaluates the GP posterior
at every grid point: assemble ``K(X, q)``, push it through the cached
Cholesky inverse, and reduce mean and variance. XLA's lowering materializes
the ``(capacity, Q)`` kernel matrix in HBM (0.5 GB for a 1M-point sweep at
capacity 128); this kernel tiles the query axis and keeps everything —
distance accumulation, ``exp``, the two MXU matmuls, the variance
reduction — in VMEM, writing only the ``(Q, out)`` results.

Layout notes (TPU tiling): queries and outputs are carried transposed,
``(d, Q)`` / ``(out, Q)``, so the long query axis is the 128-lane axis;
the tiny feature/output axes live on sublanes.

Supported covariance functions: RBF, Matern-1/2, -3/2, -5/2 (the stationary
family; reference ``functions.py:357-546`` only ever uses gpflow RBF/Matern
kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_gp_predict", "fused_gp_predict_general",
           "fused_gp_predict_stacked", "compile_kernel_program",
           "pallas_supported"]


def pallas_supported():
    """Whether the current default backend can run the TPU kernels."""
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Kernel-structure compiler: Kernel pytree -> static program + flat params
# ---------------------------------------------------------------------------
def compile_kernel_program(kernel, input_dim=None, dims=None, params=None):
    """Compile a :class:`Kernel` pytree into a static covariance program.

    Supports the full composite family the reference notebooks use —
    stationary (RBF / Matern-1/2/3/2/5/2 with ARD lengthscales),
    ``LinearKernel``, ``ActiveDims`` restriction, and arbitrary
    sums/products of those — so composite GP models run through the
    fused Pallas predict instead of the XLA fallback.

    ``input_dim`` is the DATA dimensionality the kernel will be applied
    to. A kernel whose parameter vector is scalar broadcasts over every
    input dimension (like ``Kernel.__call__``); a vector parameter must
    span the input exactly, otherwise ``None`` is returned (XLA
    fallback). Without ``input_dim`` the parameter length is trusted —
    callers with data at hand should always pass it.

    Returns ``(program, params_list)`` where ``program`` is a hashable
    nested tuple interpreted at trace time inside the Pallas kernel and
    ``params_list`` is the flat list of parameter arrays (lengthscales
    stored as reciprocals so the kernel multiplies instead of divides).
    Returns ``None`` if the kernel contains an unsupported node.
    """
    from ..functions.gp import (ActiveDims, LinearKernel, Matern12,
                                Matern32, Matern52, ProductKernel, RBF,
                                SumKernel)

    if params is None:
        params = []

    def offset():
        """Lower corner of the domain."""
        return sum(int(np.prod(p.shape)) for p in params)

    def span_for(n):
        """Input dims this leaf covers, or None for an XLA fallback.

        Mirrors ``Kernel.__call__`` broadcasting: a scalar parameter
        stretches over the whole (restricted) input span; a vector must
        match it exactly.
        """
        if dims is not None:
            sel = tuple(dims)
        elif input_dim is not None:
            sel = tuple(range(int(input_dim)))
        else:
            sel = tuple(range(n))
        if n != len(sel) and n != 1:
            return None
        return sel

    kind_map = {RBF: "rbf", Matern12: "matern12", Matern32: "matern32",
                Matern52: "matern52"}

    if type(kernel) in kind_map:
        ls = jnp.atleast_1d(kernel.lengthscales)
        sel = span_for(int(ls.shape[0]))
        if sel is None:
            return None
        if ls.shape[0] == 1 and len(sel) > 1:
            ls = jnp.broadcast_to(ls, (len(sel),))
        ls_off = offset()
        params.append(1.0 / ls)
        var_off = offset()
        params.append(jnp.reshape(kernel.variance, (1,)))
        return (("stationary", kind_map[type(kernel)], sel, ls_off,
                 var_off), params)
    if isinstance(kernel, LinearKernel):
        v = jnp.atleast_1d(kernel.variances)
        sel = span_for(int(v.shape[0]))
        if sel is None:
            return None
        if v.shape[0] == 1 and len(sel) > 1:
            v = jnp.broadcast_to(v, (len(sel),))
        v_off = offset()
        params.append(v)
        return (("linear", sel, v_off), params)
    if isinstance(kernel, ActiveDims):
        if dims is None:
            sel = tuple(kernel.dims)
        else:
            sel = tuple(dims[i] for i in kernel.dims)
        return compile_kernel_program(kernel.kernel, dims=sel,
                                      params=params)
    if isinstance(kernel, (SumKernel, ProductKernel)):
        left = compile_kernel_program(kernel.k1, input_dim=input_dim,
                                      dims=dims, params=params)
        if left is None:
            return None
        prog1, params = left
        right = compile_kernel_program(kernel.k2, input_dim=input_dim,
                                       dims=dims, params=params)
        if right is None:
            return None
        prog2, params = right
        op = "sum" if isinstance(kernel, SumKernel) else "product"
        return ((op, prog1, prog2), params)
    return None


def _resolve_precision(precision):
    """Map the precision knob to a Mosaic-lowerable jax.lax.Precision.

    Mosaic rejects ``Precision.HIGH`` in Pallas ``dot_general``
    (NotImplementedError at lowering), so the only f32 mode is the
    exact 6-pass ``HIGHEST``; the fast path is the explicit bf16
    ``fast_matmul`` opt-in, not a precision level."""
    if precision != "highest":
        raise ValueError(
            "pallas_precision={!r} is not lowerable by Mosaic (only "
            "'highest' is; for a fast low-precision mode use "
            "fast_matmul=True)".format(precision))
    return jax.lax.Precision.HIGHEST


def _covariance(kind, r2):
    """Normalized stationary covariance from squared distance.

    Delegates to the kernel classes' own formulas
    (``functions.gp.STATIONARY_COVARIANCES``) so the fused Pallas
    forward pass and the XLA/gradient paths share ONE definition."""
    from ..functions.gp import STATIONARY_COVARIANCES

    try:
        return STATIONARY_COVARIANCES[kind](r2)
    except KeyError:
        raise ValueError(kind) from None


def _gp_predict_kernel(q_ref, x_ref, chol_inv_ref, alpha_t_ref, mask_ref,
                       var_ref, mean_ref, pvar_ref, *, kind, ndim,
                       fast_matmul, precision):
    """One query tile: k assembly -> a = L^-1 k -> mean, variance.

    Shapes (VMEM):
      q_ref        (d, TQ)     scaled query tile
      x_ref        (d, cap)    scaled training inputs
      chol_inv_ref (cap, cap)  scaled Cholesky inverse
      alpha_t_ref  (p, cap)    alpha transposed
      mask_ref     (cap, 1)    0/1 active-row mask (s2 rides var_ref)
      var_ref      (1, 1)      kernel variance * s2 (SMEM)
      mean_ref     (p, TQ)     output: scaled posterior mean numerator
      pvar_ref     (1, TQ)     output: scaled posterior variance numerator
    """
    q = q_ref[:]
    dtype = q.dtype

    # Pairwise squared distances, accumulated per feature dim (d is tiny).
    r2 = jnp.zeros((x_ref.shape[1], q.shape[1]), dtype=dtype)
    for i in range(ndim):
        diff = x_ref[i, :][:, None] - q[i, :][None, :]
        r2 = r2 + diff * diff

    k = _covariance(kind, r2) * var_ref[0, 0] * mask_ref[:]

    li = chol_inv_ref[:]
    acc = jnp.float64 if dtype == jnp.float64 else jnp.float32
    if fast_matmul:
        # Explicit bf16 opt-in: one MXU pass, f32 accumulation.
        k_in = k.astype(jnp.bfloat16)
        li = li.astype(jnp.bfloat16)
        prec = None
    else:
        # f32 inputs default to a single bf16 pass on the MXU; the GP
        # solve needs most of the mantissa (see mxu_dot). HIGHEST is the
        # 6-pass exact-f32 algorithm; HIGH (3-pass, ~16-bit mantissa) is
        # measured on hardware in benchmarks/precision_sweep.py.
        k_in = k
        prec = _resolve_precision(precision)
    a = jnp.dot(li, k_in, preferred_element_type=acc, precision=prec)
    mean_ref[:] = jnp.dot(alpha_t_ref[:], a.astype(dtype),
                          preferred_element_type=acc,
                          precision=prec).astype(dtype)
    pvar_ref[:] = jnp.sum(a * a, axis=0,
                          keepdims=True).astype(dtype)


def _eval_program(program, params, x, q, cache=None):
    """Interpret a compiled covariance program on one query tile.

    ``x`` is ``(d, cap)``, ``q`` is ``(d, TQ)``, ``params`` the flat
    parameter vector; recursion happens at trace time (the program is a
    static nested tuple), so the emitted code is straight-line VPU work.

    ``cache`` memoizes the per-dimension raw difference and outer-product
    tiles, which are independent of the kernel hyperparameters: composite
    programs that touch the same input dimension twice (e.g. the
    notebooks' ``Linear + Matern32 x Linear`` hits dim 0 in both factors),
    and stacks of per-output GPs over shared inputs, assemble each tile
    once instead of once per kernel node.
    """
    if cache is None:
        cache = {}

    def diff_tile(dim):
        key = ("diff", dim)
        if key not in cache:
            cache[key] = x[dim, :][:, None] - q[dim, :][None, :]
        return cache[key]

    def prod_tile(dim):
        key = ("prod", dim)
        if key not in cache:
            cache[key] = x[dim, :][:, None] * q[dim, :][None, :]
        return cache[key]

    op = program[0]
    if op == "stationary":
        _, fam, sel, ls_off, var_off = program
        r2 = None
        for j, dim in enumerate(sel):
            inv_ls = params[ls_off + j]
            diff = diff_tile(dim) * inv_ls
            r2 = diff * diff if r2 is None else r2 + diff * diff
        return params[var_off] * _covariance(fam, r2)
    if op == "linear":
        _, sel, v_off = program
        k = None
        for j, dim in enumerate(sel):
            term = params[v_off + j] * prod_tile(dim)
            k = term if k is None else k + term
        return k
    if op == "sum":
        return (_eval_program(program[1], params, x, q, cache)
                + _eval_program(program[2], params, x, q, cache))
    if op == "product":
        return (_eval_program(program[1], params, x, q, cache)
                * _eval_program(program[2], params, x, q, cache))
    raise ValueError(program)


def _gp_predict_kernel_general(q_ref, x_ref, params_ref, chol_inv_ref,
                               alpha_t_ref, mask_ref, s2_ref, mean_ref,
                               pvar_ref, *, program, precision):
    """General-covariance variant of :func:`_gp_predict_kernel`:

    the covariance tile is built by interpreting ``program`` (RBF /
    Matern / Linear / ActiveDims / sums / products) instead of a single
    hardcoded stationary family. Inputs arrive UNSCALED; lengthscale
    reciprocals live in ``params_ref``."""
    q = q_ref[:]
    x = x_ref[:]
    params = params_ref[:][:, 0]

    k = _eval_program(program, params, x, q)
    k = k * s2_ref[0, 0] * mask_ref[:]

    li = chol_inv_ref[:]
    dtype = q.dtype
    acc = jnp.float64 if dtype == jnp.float64 else jnp.float32
    prec = _resolve_precision(precision)
    a = jnp.dot(li, k, preferred_element_type=acc, precision=prec)
    mean_ref[:] = jnp.dot(alpha_t_ref[:], a.astype(dtype),
                          preferred_element_type=acc,
                          precision=prec).astype(dtype)
    pvar_ref[:] = jnp.sum(a * a, axis=0, keepdims=True).astype(dtype)


# ---------------------------------------------------------------------------
# Autodiff rules: Pallas kernels carry no gradient, so each fused entry
# point is a custom_jvp whose primal runs the Pallas kernel and whose
# tangent evaluates the mathematically identical XLA expression (the
# fallback path in functions/gp.py). jax.grad linearizes through the JVP
# and transposes it, so reverse-mode training THROUGH the GP posterior
# (e.g. policy gradients against GP dynamics, rl.py future_values) works
# on TPU without giving up the fused forward pass.
# ---------------------------------------------------------------------------
def _stationary_xla_equiv(points_scaled, x_scaled, chol_inv, alpha, mask,
                          var_s2, *, kind):
    """XLA twin of :func:`_gp_predict_kernel` (same outputs)."""
    prec = jax.lax.Precision.HIGHEST
    qq = jnp.sum(points_scaled * points_scaled, axis=1)[None, :]
    xx = jnp.sum(x_scaled * x_scaled, axis=1)[:, None]
    cross = jnp.dot(x_scaled, points_scaled.T, precision=prec)
    r2 = jnp.maximum(xx - 2.0 * cross + qq, 0.0)
    k = _covariance(kind, r2) * var_s2 * mask[:, None]
    a = jnp.dot(chol_inv, k, precision=prec)
    mean_num = jnp.dot(a.T, alpha, precision=prec)
    return mean_num, jnp.sum(a * a, axis=0)


def _general_xla_equiv(points, x, params, chol_inv, alpha, mask, s2, *,
                       program):
    """XLA twin of :func:`_gp_predict_kernel_general`."""
    prec = jax.lax.Precision.HIGHEST
    k = _eval_program(program, params, x.T, points.T)
    k = k * s2 * mask[:, None]
    a = jnp.dot(chol_inv, k, precision=prec)
    mean_num = jnp.dot(a.T, alpha, precision=prec)
    return mean_num, jnp.sum(a * a, axis=0)


def _stacked_xla_equiv(points, x, params, chol_inv, alpha_t, mask, s2, *,
                       programs):
    """XLA twin of :func:`_gp_predict_kernel_stacked`."""
    prec = jax.lax.Precision.HIGHEST
    cache = {}
    means, pvars = [], []
    for s, program in enumerate(programs):
        k = _eval_program(program, params, x.T, points.T, cache)
        k = k * s2 * mask[:, None]
        a = jnp.dot(chol_inv[s], k, precision=prec)
        means.append(jnp.dot(alpha_t[s], a, precision=prec))
        pvars.append(jnp.sum(a * a, axis=0))
    return jnp.stack(means, axis=1), jnp.stack(pvars, axis=1)


def _gp_predict_kernel_stacked(q_ref, x_ref, params_ref, chol_inv_ref,
                               alpha_t_ref, mask_ref, s2_ref, mean_ref,
                               pvar_ref, *, programs, cap, precision):
    """Stacked variant of :func:`_gp_predict_kernel_general`.

    Evaluates S per-output GPs sharing the SAME training inputs and
    query tile. The per-dimension
    difference / outer-product tiles are assembled once (``cache`` in
    :func:`_eval_program`) and each output's covariance, matmul chain, and
    variance reduction run back to back without re-reading the tile from
    HBM.

    Shapes (VMEM): ``chol_inv_ref`` is the row-stacked ``(S*cap, cap)``
    inverse factors, ``alpha_t_ref`` is ``(S, cap)``, outputs are
    ``(S, TQ)``.
    """
    q = q_ref[:]
    x = x_ref[:]
    params = params_ref[:][:, 0]
    mask = mask_ref[:]
    s2 = s2_ref[0, 0]

    dtype = q.dtype
    acc = jnp.float64 if dtype == jnp.float64 else jnp.float32
    prec = _resolve_precision(precision)

    cache = {}
    for s, program in enumerate(programs):
        k = _eval_program(program, params, x, q, cache)
        k = k * s2 * mask
        li = chol_inv_ref[s * cap:(s + 1) * cap, :]
        a = jnp.dot(li, k, preferred_element_type=acc, precision=prec)
        mean_ref[s:s + 1, :] = jnp.dot(
            alpha_t_ref[s:s + 1, :], a.astype(dtype),
            preferred_element_type=acc, precision=prec).astype(dtype)
        pvar_ref[s:s + 1, :] = jnp.sum(a * a, axis=0,
                                       keepdims=True).astype(dtype)


@functools.partial(jax.jit, static_argnames=("programs", "tile",
                                             "precision", "interpret"))
def fused_gp_predict_stacked(points, x, params, chol_inv, alpha_t, mask, s2,
                             programs, tile=1024, precision="highest",
                             interpret=False):
    """Fused posterior predict for a STACK of GPs over shared inputs.

    The TPU path for :class:`~safe_learning_tpu.functions.gp.
    StackedGaussianProcess` (the batched replacement for per-dimension
    ``FunctionStack`` GPs, SURVEY.md section 7 "FunctionStack of per-dim
    GPs => one batched GP"): one kernel launch evaluates every output's
    posterior, sharing the query tile and the per-dimension covariance
    work across outputs.

    Parameters
    ----------
    points : (Q, d) raw query points
    x : (cap, d) raw shared training inputs
    params : (P,) flat kernel parameters of ALL outputs (one offset space)
    chol_inv : (S, cap, cap) per-output inverse Cholesky factors
    alpha_t : (S, cap) per-output cached solves (single-output GPs)
    mask : (cap,) active-row mask
    s2 : scalar, shared conditioning scale squared
    programs : tuple of compiled covariance programs, one per output

    Returns
    -------
    mean_num : (Q, S); var_num : (Q, S)
    """
    return _fused_stacked_core((programs, tile, precision, interpret),
                               points, x, params, chol_inv, alpha_t, mask,
                               s2)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fused_stacked_core(static, points, x, params, chol_inv, alpha_t, mask,
                        s2):
    programs, tile, precision, interpret = static
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, d = points.shape
    n_out, cap = alpha_t.shape
    n_params = params.shape[0]
    dtype = points.dtype

    pad = (-q) % tile
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros((pad, d), dtype=dtype)], axis=0)
    qp = q + pad

    q_t = points.T
    x_t = x.T
    li_rows = chol_inv.reshape(n_out * cap, cap)
    mask_col = mask.reshape(cap, 1).astype(dtype)
    params_col = params.reshape(n_params, 1).astype(dtype)
    s2_smem = jnp.asarray(s2, dtype=dtype).reshape(1, 1)

    kernel = functools.partial(_gp_predict_kernel_stacked,
                               programs=programs, cap=cap,
                               precision=precision)

    grid = (qp // tile,)
    mean_t, pvar = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_params, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out * cap, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_out, qp), dtype),
            jax.ShapeDtypeStruct((n_out, qp), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_out * (2 * cap * cap * qp + 2 * cap * qp)
            + 6 * d * cap * qp,
            bytes_accessed=(d * qp + d * cap + n_out * cap * cap
                            + n_out * cap + n_params + 2 * n_out * qp)
            * np.dtype(dtype).itemsize,
            transcendentals=n_out * 2 * cap * qp,
        ),
        interpret=interpret,
    )(q_t, x_t, params_col, li_rows, alpha_t, mask_col, s2_smem)

    return mean_t.T[:q], pvar.T[:q]


@_fused_stacked_core.defjvp
def _fused_stacked_core_jvp(static, primals, tangents):
    programs = static[0]
    primal_out = _fused_stacked_core(static, *primals)
    _, tangent_out = jax.jvp(
        functools.partial(_stacked_xla_equiv, programs=programs), primals,
        tangents)
    return primal_out, tangent_out


@functools.partial(jax.jit, static_argnames=("program", "tile",
                                             "precision", "interpret"))
def fused_gp_predict_general(points, x, params, chol_inv, alpha, mask, s2,
                             program, tile=1024, precision="highest",
                             interpret=False):
    """Fused posterior mean/variance numerators for a COMPOSITE kernel.

    Same contract as :func:`fused_gp_predict` but the covariance is a
    compiled program (:func:`compile_kernel_program`) over unscaled
    inputs — the path composite-kernel GP models (the reference
    notebooks' ``Linear + Matern32 x Linear``) take on TPU instead of
    the XLA fallback.

    Parameters
    ----------
    points : (Q, d) raw query points
    x : (cap, d) raw training inputs
    params : (P,) flat kernel-parameter vector
    chol_inv, alpha, mask : cached solve state (see fused_gp_predict)
    s2 : scalar, the conditioning scale squared
    program : nested tuple from compile_kernel_program
    """
    return _fused_general_core((program, tile, precision, interpret),
                               points, x, params, chol_inv, alpha, mask, s2)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fused_general_core(static, points, x, params, chol_inv, alpha, mask,
                        s2):
    program, tile, precision, interpret = static
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, d = points.shape
    cap = x.shape[0]
    p = alpha.shape[1]
    n_params = params.shape[0]
    dtype = points.dtype

    pad = (-q) % tile
    if pad:
        points = jnp.concatenate(
            [points, jnp.zeros((pad, d), dtype=dtype)], axis=0)
    qp = q + pad

    q_t = points.T
    x_t = x.T
    alpha_t = alpha.T
    mask_col = mask.reshape(cap, 1).astype(dtype)
    params_col = params.reshape(n_params, 1).astype(dtype)
    s2_smem = jnp.asarray(s2, dtype=dtype).reshape(1, 1)

    kernel = functools.partial(_gp_predict_kernel_general, program=program,
                               precision=precision)

    grid = (qp // tile,)
    mean_t, pvar = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_params, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, qp), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * cap * qp + 2 * cap * p * qp
            + 6 * d * cap * qp,
            bytes_accessed=(d * qp + d * cap + cap * cap + p * cap
                            + n_params + (p + 1) * qp)
            * np.dtype(dtype).itemsize,
            transcendentals=2 * cap * qp,
        ),
        interpret=interpret,
    )(q_t, x_t, params_col, chol_inv, alpha_t, mask_col, s2_smem)

    return mean_t.T[:q], pvar[0, :q]


@_fused_general_core.defjvp
def _fused_general_core_jvp(static, primals, tangents):
    program = static[0]
    primal_out = _fused_general_core(static, *primals)
    _, tangent_out = jax.jvp(
        functools.partial(_general_xla_equiv, program=program), primals,
        tangents)
    return primal_out, tangent_out


@functools.partial(jax.jit, static_argnames=("kind", "tile", "fast_matmul",
                                             "precision", "interpret"))
def fused_gp_predict(points_scaled, x_scaled, chol_inv, alpha, mask,
                     kernel_variance_s2, kind="rbf", tile=1024,
                     fast_matmul=False, precision="highest",
                     interpret=False):
    """Fused posterior mean/variance numerators over query points.

    Parameters
    ----------
    points_scaled : (Q, d) queries divided by lengthscales
    x_scaled : (cap, d) training inputs divided by lengthscales
    chol_inv : (cap, cap) inverse Cholesky factor of the scaled kernel
    alpha : (cap, p) cached solve against the targets
    mask : (cap,) active-row mask
    kernel_variance_s2 : scalar, kernel variance times scale^2
    kind : str, stationary kernel family
    tile : int, query tile size (multiple of 128)
    fast_matmul : bool, run the capacity x capacity x tile matmul in
        bf16 (f32 accumulation). Measured at capacity 128 this is
        SLOWER than the 6-pass f32 default (the kernel is VPU-bound and
        the conversions add VPU work) and much less accurate — only
        potentially useful at large capacities where the cap^2-tile
        matmul dominates.
    precision : str, must be "highest" (6-pass exact f32): Mosaic
        cannot lower ``Precision.HIGH``, so there is no 3-pass mode —
        the fast alternative is ``fast_matmul=True`` (bf16).
    interpret : bool, run under the Pallas interpreter (CPU testing only).

    Returns
    -------
    mean_num : (Q, p) — ``a^T alpha`` (divide by scale and add prior mean
        outside)
    var_num : (Q,) — ``sum(a^2, axis=0)`` (compute
        ``kdiag - var_num / s2`` outside)
    """
    return _fused_predict_core(
        (kind, tile, fast_matmul, precision, interpret), points_scaled,
        x_scaled, chol_inv, alpha, mask, kernel_variance_s2)


@functools.partial(jax.custom_jvp, nondiff_argnums=(0,))
def _fused_predict_core(static, points_scaled, x_scaled, chol_inv, alpha,
                        mask, kernel_variance_s2):
    kind, tile, fast_matmul, precision, interpret = static
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, d = points_scaled.shape
    cap = x_scaled.shape[0]
    p = alpha.shape[1]
    dtype = points_scaled.dtype

    pad = (-q) % tile
    if pad:
        points_scaled = jnp.concatenate(
            [points_scaled,
             jnp.zeros((pad, d), dtype=dtype)], axis=0)
    qp = q + pad

    q_t = points_scaled.T  # (d, Q)
    x_t = x_scaled.T  # (d, cap)
    alpha_t = alpha.T  # (p, cap)
    mask_col = mask.reshape(cap, 1).astype(dtype)
    var_smem = jnp.asarray(kernel_variance_s2,
                           dtype=dtype).reshape(1, 1)

    kernel = functools.partial(_gp_predict_kernel, kind=kind, ndim=d,
                               fast_matmul=fast_matmul,
                               precision=precision)

    grid = (qp // tile,)
    mean_t, pvar = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, cap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((p, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, qp), dtype),
            jax.ShapeDtypeStruct((1, qp), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * cap * qp + 2 * cap * p * qp
            + 3 * d * cap * qp,
            bytes_accessed=(d * qp + d * cap + cap * cap + p * cap
                            + (p + 1) * qp) * np.dtype(dtype).itemsize,
            transcendentals=cap * qp,
        ),
        interpret=interpret,
    )(q_t, x_t, chol_inv, alpha_t, mask_col, var_smem)

    return mean_t.T[:q], pvar[0, :q]


@_fused_predict_core.defjvp
def _fused_predict_core_jvp(static, primals, tangents):
    kind = static[0]
    primal_out = _fused_predict_core(static, *primals)
    _, tangent_out = jax.jvp(
        functools.partial(_stationary_xla_equiv, kind=kind), primals,
        tangents)
    return primal_out, tangent_out
