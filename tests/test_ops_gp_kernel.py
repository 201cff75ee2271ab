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
    y = np.sin(x.sum(axis=1, keepdims=True)) * np.ones((1, p))
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
