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

__all__ = ["fused_gp_predict", "pallas_supported"]


def pallas_supported():
    """Whether the current default backend can run the TPU kernels."""
    return jax.default_backend() in ("tpu", "axon")


def _covariance(kind, r2):
    if kind == "rbf":
        return jnp.exp(-0.5 * r2)
    if kind == "matern12":
        return jnp.exp(-jnp.sqrt(r2 + 1e-36))
    if kind == "matern32":
        r = jnp.sqrt(3.0 * r2 + 1e-36)
        return (1.0 + r) * jnp.exp(-r)
    if kind == "matern52":
        r = jnp.sqrt(5.0 * r2 + 1e-36)
        return (1.0 + r + r * r / 3.0) * jnp.exp(-r)
    raise ValueError(kind)


def _gp_predict_kernel(q_ref, x_ref, chol_inv_ref, alpha_t_ref, mask_ref,
                       var_ref, mean_ref, pvar_ref, *, kind, ndim,
                       fast_matmul, precision):
    """One query tile: k assembly -> a = L^-1 k -> mean, variance.

    Shapes (VMEM):
      q_ref        (d, TQ)     scaled query tile
      x_ref        (d, cap)    scaled training inputs
      chol_inv_ref (cap, cap)  scaled Cholesky inverse
      alpha_t_ref  (p, cap)    alpha transposed
      mask_ref     (cap, 1)    active-row mask (includes s2 scaling)
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
        prec = (jax.lax.Precision.HIGHEST if precision == "highest"
                else jax.lax.Precision.HIGH)
    a = jnp.dot(li, k_in, preferred_element_type=acc, precision=prec)
    mean_ref[:] = jnp.dot(alpha_t_ref[:], a.astype(dtype),
                          preferred_element_type=acc,
                          precision=prec).astype(dtype)
    pvar_ref[:] = jnp.sum(a * a, axis=0,
                          keepdims=True).astype(dtype)


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
    fast_matmul : bool, run the capacity x capacity x tile matmul in bf16
        (f32 accumulation); ~4x faster. Relative error scales with the
        solve's conditioning (~1e-2..1e-1); only for workloads with wide
        certification margins.
    precision : str, "highest" (6-pass exact f32, default) or "high"
        (3-pass, ~16-bit effective mantissa) for the f32 matmuls.
    interpret : bool, run under the Pallas interpreter (CPU testing only).

    Returns
    -------
    mean_num : (Q, p) — ``a^T alpha`` (divide by scale and add prior mean
        outside)
    var_num : (Q,) — ``sum(a^2, axis=0)`` (compute
        ``kdiag - var_num / s2`` outside)
    """
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
