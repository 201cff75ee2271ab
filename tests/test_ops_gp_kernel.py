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
