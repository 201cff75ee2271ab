"""Experiment: move the fused GP predict's pairwise-distance accumulation
from the VPU (per-dimension diff + fma) onto the MXU (cross-term matmul,
``r2 = xx - 2 x^T q + qq``).

The fused kernel is covariance-assembly/VPU-bound at capacity 128
(docs/performance.md "MXU precision"); if the distance work rides the MXU
instead, the VPU keeps only exp + scaling. The matmul form reintroduces
the cancellation the direct-difference form avoids, so accuracy against
the XLA path is measured alongside speed — integration into
ops/gp_kernel.py only happens if BOTH win.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.config import config  # noqa: E402
from safe_learning_tpu.ops.gp_kernel import (_covariance,  # noqa: E402
                                             fused_gp_predict)

print("backend:", jax.default_backend())


def _kernel_mxu(q_ref, x_ref, chol_inv_ref, alpha_t_ref, mask_ref, var_ref,
                mean_ref, pvar_ref, *, kind, precision):
    """Variant of _gp_predict_kernel: r2 via MXU cross-term."""
    q = q_ref[:]          # (d, TQ) scaled
    x = x_ref[:]          # (d, cap) scaled
    dtype = q.dtype
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.HIGH)

    xx = jnp.sum(x * x, axis=0)[:, None]          # (cap, 1)
    qq = jnp.sum(q * q, axis=0)[None, :]          # (1, TQ)
    cross = jnp.dot(x.T, q, preferred_element_type=jnp.float32,
                    precision=prec)               # (cap, TQ) on MXU
    r2 = jnp.maximum(xx - 2.0 * cross + qq, 0.0)

    k = _covariance(kind, r2) * var_ref[0, 0] * mask_ref[:]
    li = chol_inv_ref[:]
    a = jnp.dot(li, k, preferred_element_type=jnp.float32, precision=prec)
    mean_ref[:] = jnp.dot(alpha_t_ref[:], a.astype(dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec).astype(dtype)
    pvar_ref[:] = jnp.sum(a * a, axis=0, keepdims=True).astype(dtype)


@functools.partial(jax.jit, static_argnames=("kind", "tile", "precision"))
def fused_predict_mxu_dist(points_scaled, x_scaled, chol_inv, alpha, mask,
                           kernel_variance_s2, kind="rbf", tile=4096,
                           precision="highest"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q, d = points_scaled.shape
    cap = x_scaled.shape[0]
    p = alpha.shape[1]
    dtype = points_scaled.dtype
    pad = (-q) % tile
    if pad:
        points_scaled = jnp.concatenate(
            [points_scaled, jnp.zeros((pad, d), dtype=dtype)], axis=0)
    qp = q + pad
    kernel = functools.partial(_kernel_mxu, kind=kind, precision=precision)
    mean_t, pvar = pl.pallas_call(
        kernel,
        grid=(qp // tile,),
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
        out_shape=[jax.ShapeDtypeStruct((p, qp), dtype),
                   jax.ShapeDtypeStruct((1, qp), dtype)],
    )(points_scaled.T, x_scaled.T, chol_inv, alpha.T,
      mask.reshape(cap, 1).astype(dtype),
      jnp.asarray(kernel_variance_s2, dtype=dtype).reshape(1, 1))
    return mean_t.T[:q], pvar[0, :q]


rng = np.random.default_rng(0)
x_train = rng.uniform(-1, 1, size=(128, 3))
y_train = np.column_stack([np.sin(x_train @ [1.0, 0.5, 0.2]),
                           np.cos(x_train @ [0.3, -0.7, 0.1])])
gp = sl.GaussianProcess(sl.RBF(1.0, [0.3, 0.3, 0.3], input_dim=3),
                        x_train, y_train, noise_variance=1e-6)
n_q = 1 << 20
ls = gp.kernel.lengthscales
# fused_gp_predict takes PRE-scaled queries (points / lengthscales).
q = jnp.asarray(rng.uniform(-1, 1, size=(n_q, 3)),
                dtype=config.dtype) / ls
args = (gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance)

# float64 host oracle for the mean numerator.
q64 = np.asarray(q, np.float64)[:4096]
x64 = np.asarray(gp.X_buf, np.float64)
d64 = (x64 / np.asarray(ls, np.float64))[:, None, :] \
    - q64[None, :, :]
k64 = np.exp(-0.5 * np.sum(d64 ** 2, axis=2)) \
    * np.asarray(gp._mask(), np.float64)[:, None]
a64 = np.asarray(gp.chol_inv, np.float64) @ k64
mean64 = a64.T @ np.asarray(gp.alpha, np.float64)

for name, fn in (("diff (current)",
                  lambda qs: fused_gp_predict(qs, *args, kind="rbf",
                                              tile=4096)),
                 ("mxu cross-term",
                  lambda qs: fused_predict_mxu_dist(qs, *args,
                                                    kind="rbf"))):
    g = jax.jit(lambda qs, c: (lambda m, v: (m, v, jnp.sin(m[0, 0] + c)))(
        *fn(qs + c * 1e-9)))
    mean, var, carry = g(q, jnp.zeros((), config.dtype))
    jax.block_until_ready(carry)
    err = np.abs(np.asarray(mean)[:4096] - mean64).max()
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        mean, var, carry = g(q, carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:6.2f} ms / 1M predict "
          f"({n_q/dt:.3e} pts/s), |mean err vs f64| = {err:.2e}")
