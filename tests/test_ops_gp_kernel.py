"""Cross-check the fused Pallas GP-predict kernel against the jnp path.

Mirrors the reference's dual-implementation test pattern
(``/root/reference/safe_learning/tests/test_functions.py:150-199``: cached
GP must match the vanilla implementation) — here the Pallas kernel, run
under the interpreter on CPU, must match ``GaussianProcess.predict``'s pure
XLA path bit-for-tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from numpy.testing import assert_allclose

from safe_learning_tpu.config import config
from safe_learning_tpu.functions.gp import (RBF, GaussianProcess, Matern12,
                                            Matern32, Matern52)
from safe_learning_tpu.ops.gp_kernel import fused_gp_predict


def _make_gp(kernel_cls, n=17, d=2, p=1, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-2.0, 2.0, size=(n, d))
    # Distinct per-column targets: identical columns could not detect
    # output mixing/transposition in the fused kernel.
    y = np.column_stack([np.sin((j + 1) * x.sum(axis=1) + 0.3 * j)
                         for j in range(p)])
    kernel = kernel_cls(variance=1.3, lengthscales=[0.7, 1.4][:d],
                        input_dim=d)
    return GaussianProcess(kernel, x, y, noise_variance=1e-4, beta=2.0,
                           scale=scale)


@pytest.mark.parametrize("kernel_cls,kind", [
    (RBF, "rbf"), (Matern12, "matern12"), (Matern32, "matern32"),
    (Matern52, "matern52")])
def test_fused_predict_matches_xla_path(kernel_cls, kind):
    gp = _make_gp(kernel_cls)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-2.5, 2.5, size=(301, 2)),
                    dtype=config.dtype)

    mean_ref, var_ref = gp.predict(q)  # pure-jnp path (CPU backend)

    ls = gp.kernel.lengthscales
    s2 = gp.scale ** 2
    mean_num, var_num = fused_gp_predict(
        q / ls, gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance * s2, kind=kind, tile=128, interpret=True)
    mean = mean_num / gp.scale
    var = jnp.maximum(gp.kernel.diag(q) - var_num / s2, 1e-12)[:, None]

    assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                    rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(var), np.asarray(var_ref),
                    rtol=1e-8, atol=1e-10)


def test_fused_predict_with_scale_and_multioutput():
    gp = _make_gp(RBF, n=9, p=3, scale=25.0)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.uniform(-2.0, 2.0, size=(65, 2)),
                    dtype=config.dtype)

    mean_ref, var_ref = gp.predict(q)

    ls = gp.kernel.lengthscales
    s2 = gp.scale ** 2
    mean_num, var_num = fused_gp_predict(
        q / ls, gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance * s2, kind="rbf", tile=128, interpret=True)
    mean = mean_num / gp.scale
    var = jnp.maximum(gp.kernel.diag(q) - var_num / s2, 1e-12)[:, None]
    var = jnp.broadcast_to(var, (q.shape[0], gp.output_dim))

    assert_allclose(np.asarray(mean), np.asarray(mean_ref),
                    rtol=1e-8, atol=1e-10)
    assert_allclose(np.asarray(var), np.asarray(var_ref),
                    rtol=1e-8, atol=1e-10)


def test_fused_predict_ragged_query_padding():
    """Query counts that are not a multiple of the tile are zero-padded."""
    gp = _make_gp(Matern32, n=12)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.uniform(-1.0, 1.0, size=(131, 2)),
                    dtype=config.dtype)

    mean_ref, _ = gp.predict(q)
    ls = gp.kernel.lengthscales
    mean_num, _ = fused_gp_predict(
        q / ls, gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance, kind="matern32", tile=128, interpret=True)
    assert mean_num.shape == (131, 1)
    assert_allclose(np.asarray(mean_num / gp.scale), np.asarray(mean_ref),
                    rtol=1e-8, atol=1e-10)


def test_fused_predict_fast_matmul_bf16():
    """The explicit bf16 opt-in trades ~1e-2 relative accuracy for
    throughput; verify it stays within that envelope."""
    gp = _make_gp(RBF, n=24, d=2)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.uniform(-2.0, 2.0, size=(256, 2)),
                    dtype=config.dtype)
    mean_ref, _ = gp.predict(q)

    ls = gp.kernel.lengthscales
    mean_num, _ = fused_gp_predict(
        q / ls, gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
        gp.kernel.variance, kind="rbf", tile=128, fast_matmul=True,
        interpret=True)
    err = np.max(np.abs(np.asarray(mean_num) - np.asarray(mean_ref)))
    scale = np.max(np.abs(np.asarray(mean_ref))) + 1e-12
    # bf16 mantissa amplified by the solve's conditioning: ~1e-1 here.
    assert err / scale < 2e-1, err / scale
    assert err / scale > 1e-6  # sanity: it really ran in bf16


def _composite_kernels():
    """The composite families the reference notebooks actually use."""
    from safe_learning_tpu.functions.gp import ActiveDims, LinearKernel

    # adaptive_safety_verification / inverted_pendulum (3-dim input):
    k1 = (LinearKernel(variances=[0.3, 0.1, 0.5], input_dim=3)
          + ActiveDims(Matern32(variance=1.0, lengthscales=0.8,
                                input_dim=1), dims=[0])
          * ActiveDims(LinearKernel(variances=0.4, input_dim=1), dims=[0]))
    # 1d_region_of_attraction_estimate (2-dim input):
    k2 = (ActiveDims(Matern32(variance=0.16, lengthscales=1.0,
                              input_dim=1), dims=[0])
          * ActiveDims(LinearKernel(variances=1.0, input_dim=1), dims=[0]))
    # one_d_example (full-dims product):
    k3 = (Matern32(lengthscales=1.0, input_dim=2)
          * LinearKernel(variances=[0.2, 1.0], input_dim=2))
    # sum of stationary with distinct ARD lengthscales:
    k4 = (RBF(variance=0.5, lengthscales=[0.4, 1.2], input_dim=2)
          + Matern52(variance=0.2, lengthscales=[2.0, 0.6], input_dim=2))
    return {"notebook3d": (k1, 3), "roa1d": (k2, 2), "one_d": (k3, 2),
            "ard_sum": (k4, 2)}


@pytest.mark.parametrize("name", ["notebook3d", "roa1d", "one_d",
                                  "ard_sum"])
def test_general_fused_predict_matches_xla(name):
    """The compiled covariance program (composite kernels) run through
    the general Pallas kernel equals the XLA path."""
    from safe_learning_tpu.ops.gp_kernel import (compile_kernel_program,
                                                 fused_gp_predict_general)

    kernel, d = _composite_kernels()[name]
    rng = np.random.default_rng(2)
    x = rng.uniform(-1.5, 1.5, size=(13, d))
    y = np.sin(x.sum(axis=1, keepdims=True))
    gp = GaussianProcess(kernel, x, y, noise_variance=1e-4, scale=1.5)
    q = jnp.asarray(rng.uniform(-2, 2, size=(301, d)), dtype=config.dtype)

    mean_ref, var_ref = map(np.asarray, gp.predict(q))

    program, param_list = compile_kernel_program(gp.kernel)
    params = jnp.concatenate([jnp.asarray(p).reshape(-1)
                              for p in param_list]).astype(q.dtype)
    s2 = gp.scale ** 2
    mean_num, var_num = fused_gp_predict_general(
        q, gp.X_buf, params, gp.chol_inv, gp.alpha, gp._mask(), s2,
        program, tile=128, interpret=True)
    mean = np.asarray(mean_num) / gp.scale
    var = np.maximum(np.asarray(gp.kernel.diag(q))
                     - np.asarray(var_num) / s2, 1e-12)[:, None]
    assert_allclose(mean, mean_ref, atol=1e-9)
    assert_allclose(var, var_ref, atol=1e-9)


def test_compile_kernel_program_structure():
    """Program compilation: ActiveDims composition, offsets, and the
    unsupported-node fallback."""
    from safe_learning_tpu.functions.gp import ActiveDims, LinearKernel
    from safe_learning_tpu.ops.gp_kernel import compile_kernel_program

    kernel = (ActiveDims(Matern32(variance=1.0, lengthscales=1.0,
                                  input_dim=1), dims=[2])
              * ActiveDims(LinearKernel(variances=1.0, input_dim=1),
                           dims=[2]))
    program, params = compile_kernel_program(kernel)
    assert program[0] == "product"
    assert program[1][:3] == ("stationary", "matern32", (2,))
    assert program[2][:2] == ("linear", (2,))
    assert sum(int(np.prod(p.shape)) for p in params) == 3

    # Nested ActiveDims composes index maps.
    nested = ActiveDims(ActiveDims(RBF(1.0, 1.0, input_dim=1), dims=[0]),
                        dims=[1])
    program, _ = compile_kernel_program(nested)
    assert program[:3] == ("stationary", "rbf", (1,))

    # Unsupported node -> None (falls back to the XLA path).
    class Weird(Matern32):
        pass

    assert compile_kernel_program(Weird(1.0, 1.0, input_dim=1)) is None


# ---------------------------------------------------------------------------
# Autodiff through the fused predict (custom_jvp with an XLA tangent rule)
# ---------------------------------------------------------------------------
def test_fused_predict_grad_matches_xla():
    """jax.grad flows THROUGH the Pallas predict (policy training against
    GP dynamics on TPU, rl.py future_values): the custom_jvp tangent is
    the XLA-equivalent expression, so gradients match the fallback path."""
    from safe_learning_tpu.ops.gp_kernel import (_stationary_xla_equiv,
                                                 fused_gp_predict)

    gp = _make_gp(RBF, n=12, d=2)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.uniform(-2.0, 2.0, size=(64, 2)),
                    dtype=config.dtype)
    ls = gp.kernel.lengthscales
    args = (gp.X_buf / ls, gp.chol_inv, gp.alpha, gp._mask(),
            gp.kernel.variance)

    def loss_pallas(qs):
        mean, var = fused_gp_predict(qs, *args, kind="rbf", tile=64,
                                     interpret=True)
        return jnp.sum(mean ** 2) + jnp.sum(jnp.cos(var))

    def loss_xla(qs):
        mean, var = _stationary_xla_equiv(qs, *args, kind="rbf")
        return jnp.sum(mean ** 2) + jnp.sum(jnp.cos(var))

    g_pallas = np.asarray(jax.grad(loss_pallas)(q / ls))
    g_xla = np.asarray(jax.grad(loss_xla)(q / ls))
    assert np.all(np.isfinite(g_pallas))
    assert_allclose(g_pallas, g_xla, atol=1e-8)


def test_fused_general_and_stacked_grads():
    """Gradients also flow through the composite-program and stacked
    fused predicts (all three entry points carry the custom_jvp)."""
    from safe_learning_tpu.functions.gp import (ActiveDims, LinearKernel,
                                                StackedGaussianProcess)
    from safe_learning_tpu.ops.gp_kernel import (compile_kernel_program,
                                                 fused_gp_predict_general,
                                                 fused_gp_predict_stacked)

    rng = np.random.default_rng(12)
    x = rng.uniform(-1.5, 1.5, size=(9, 3))
    y = np.column_stack([np.sin(x[:, 0]), np.cos(x[:, 1])])
    kernels = []
    for dim in range(2):
        kernels.append(
            LinearKernel(variances=[0.3, 0.1, 0.5], input_dim=3)
            + ActiveDims(Matern32(variance=1.0,
                                  lengthscales=0.8 + 0.1 * dim,
                                  input_dim=1), dims=[0])
            * ActiveDims(LinearKernel(variances=0.4, input_dim=1),
                         dims=[0]))
    stacked = StackedGaussianProcess(kernels, x, y, [1e-4, 2e-4])
    q = jnp.asarray(rng.uniform(-1, 1, size=(40, 3)), dtype=config.dtype)

    # General (single-output) path.
    gp0 = GaussianProcess(kernels[0], x, y[:, :1], 1e-4)
    program, param_list = compile_kernel_program(gp0.kernel)
    params = jnp.concatenate([jnp.asarray(p).reshape(-1)
                              for p in param_list]).astype(q.dtype)

    def loss_general(qs):
        mean, var = fused_gp_predict_general(
            qs, gp0.X_buf, params, gp0.chol_inv, gp0.alpha, gp0._mask(),
            1.0, program, tile=64, interpret=True)
        return jnp.sum(mean ** 2) + jnp.sum(var)

    g = jax.grad(loss_general)(q)
    fd = ((loss_general(q.at[0, 0].add(1e-6))
           - loss_general(q.at[0, 0].add(-1e-6))) / 2e-6)
    assert np.isfinite(np.asarray(g)).all()
    assert_allclose(float(g[0, 0]), float(fd), rtol=1e-4, atol=1e-7)

    # Stacked path.
    params_list = []
    programs = []
    for kernel in stacked.kernels:
        prog, params_list = compile_kernel_program(kernel,
                                                   params=params_list)
        programs.append(prog)
    sparams = jnp.concatenate([jnp.asarray(p).reshape(-1)
                               for p in params_list]).astype(q.dtype)

    def loss_stacked(qs):
        mean, var = fused_gp_predict_stacked(
            qs, stacked.X_buf, sparams, stacked.chol_inv,
            stacked.alpha[:, :, 0], stacked._mask(), 1.0,
            tuple(programs), tile=64, interpret=True)
        return jnp.sum(mean ** 2) + jnp.sum(var)

    g = jax.grad(loss_stacked)(q)
    fd = ((loss_stacked(q.at[0, 0].add(1e-6))
           - loss_stacked(q.at[0, 0].add(-1e-6))) / 2e-6)
    assert np.isfinite(np.asarray(g)).all()
    assert_allclose(float(g[0, 0]), float(fd), rtol=1e-4, atol=1e-7)


def test_stacked_fused_predict_matches_xla():
    """The stacked Pallas kernel (shared covariance tiles across outputs)
    equals the per-output XLA path."""
    from safe_learning_tpu.functions.gp import (ActiveDims, LinearKernel,
                                                StackedGaussianProcess)
    from safe_learning_tpu.ops.gp_kernel import (compile_kernel_program,
                                                 fused_gp_predict_stacked)

    rng = np.random.default_rng(13)
    x = rng.uniform(-1.5, 1.5, size=(11, 3))
    y = np.column_stack([np.sin(x[:, 0] * 2), x[:, 1] - 0.3 * x[:, 2]])
    kernels = [
        RBF(variance=0.8, lengthscales=[0.5, 0.9, 1.3], input_dim=3),
        LinearKernel(variances=[0.3, 0.1, 0.5], input_dim=3)
        + ActiveDims(Matern32(variance=1.0, lengthscales=0.7,
                              input_dim=1), dims=[0])
        * ActiveDims(LinearKernel(variances=0.4, input_dim=1), dims=[0]),
    ]
    stacked = StackedGaussianProcess(kernels, x, y, [1e-4, 3e-4],
                                     scale=1.4)
    q = jnp.asarray(rng.uniform(-2, 2, size=(143, 3)), dtype=config.dtype)

    mean_ref, var_ref = map(np.asarray, stacked.predict(q))

    params_list = []
    programs = []
    for kernel in stacked.kernels:
        prog, params_list = compile_kernel_program(kernel,
                                                   params=params_list)
        programs.append(prog)
    params = jnp.concatenate([jnp.asarray(p).reshape(-1)
                              for p in params_list]).astype(q.dtype)
    s2 = stacked.scale ** 2
    mean_num, var_num = fused_gp_predict_stacked(
        q, stacked.X_buf, params, stacked.chol_inv,
        stacked.alpha[:, :, 0], stacked._mask(), s2, tuple(programs),
        tile=128, interpret=True)
    mean = np.asarray(mean_num) / stacked.scale
    kdiag = np.stack([np.asarray(k.diag(q)) for k in stacked.kernels],
                     axis=1)
    var = np.maximum(kdiag - np.asarray(var_num) / s2, 1e-12)
    assert_allclose(mean, mean_ref, atol=1e-9)
    assert_allclose(var, var_ref, atol=1e-9)


def test_compile_kernel_program_scalar_params_broadcast():
    """A kernel whose scalar parameters broadcast over multi-dim inputs
    (default input_dim=1, the Kernel.__call__ semantics) must compile to
    a program spanning EVERY input dimension — regression for the silent
    dim-0-only covariance bug — and a 2-vector on 3-dim data must fall
    back (None) instead of compiling wrong."""
    from safe_learning_tpu.functions.gp import LinearKernel
    from safe_learning_tpu.ops.gp_kernel import (compile_kernel_program,
                                                 fused_gp_predict_general)

    # Scalar lengthscale, used over 2-D data.
    kernel = RBF(1.0, 0.5) + LinearKernel(0.3)
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, size=(9, 2))
    y = np.sin(x.sum(axis=1, keepdims=True))
    gp = GaussianProcess(kernel, x, y, noise_variance=1e-4)
    q = jnp.asarray(rng.uniform(-1, 1, size=(33, 2)), dtype=config.dtype)
    mean_ref, var_ref = map(np.asarray, gp.predict(q))

    compiled = compile_kernel_program(gp.kernel, input_dim=2)
    assert compiled is not None
    program, param_list = compiled
    assert program[1][2] == (0, 1)  # rbf spans BOTH dims
    assert program[2][1] == (0, 1)  # linear spans BOTH dims
    params = jnp.concatenate([jnp.asarray(p).reshape(-1)
                              for p in param_list]).astype(q.dtype)
    mean_num, var_num = fused_gp_predict_general(
        q, gp.X_buf, params, gp.chol_inv, gp.alpha, gp._mask(), 1.0,
        program, tile=128, interpret=True)
    assert_allclose(np.asarray(mean_num), mean_ref, atol=1e-9)
    var = np.maximum(np.asarray(gp.kernel.diag(q))
                     - np.asarray(var_num), 1e-12)[:, None]
    assert_allclose(var, var_ref, atol=1e-9)

    # Parameter vector that spans NEITHER 1 nor input_dim -> fallback.
    bad = RBF(1.0, [0.5, 0.7], input_dim=2)
    assert compile_kernel_program(bad, input_dim=3) is None
