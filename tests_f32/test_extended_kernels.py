"""Fuzz the double-word kernel compiler across the kernel algebra.

Random kernel trees (stationary RBF/Matern families, LinearKernel,
ActiveDims restrictions, sums and products, random ARD hyperparameters)
are compiled to df covariance programs and compared entrywise against
the float64-lifted kernel — the same oracle the sweep margins are
derived against. This catches composition bugs in combinations the
end-to-end property instances never exercise.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.oracle import _oracle_env, lift64  # noqa: E402
from safe_learning_tpu.ops.extended_verify import (  # noqa: E402
    _compile_kernel)

_FAMILIES = [sl.RBF, sl.Matern12, sl.Matern32, sl.Matern52]


def _random_kernel(rng, nd, depth=0):
    """Random kernel tree over ``nd`` input columns."""
    roll = rng.random()
    if depth < 2 and roll < 0.4:
        k1 = _random_kernel(rng, nd, depth + 1)
        k2 = _random_kernel(rng, nd, depth + 1)
        return k1 + k2 if rng.random() < 0.5 else k1 * k2
    if roll < 0.55 and depth < 2:
        m = int(rng.integers(1, nd + 1))
        dims = sorted(rng.choice(nd, size=m, replace=False).tolist())
        return sl.ActiveDims(_random_kernel(rng, m, depth + 1), dims)
    if rng.random() < 0.25:
        return sl.LinearKernel(
            rng.uniform(0.05, 2.0, nd).astype(np.float32), input_dim=nd)
    fam = _FAMILIES[int(rng.integers(len(_FAMILIES)))]
    return fam(variance=float(rng.uniform(0.05, 3.0)),
               lengthscales=rng.uniform(0.15, 2.0, nd).astype(np.float32),
               input_dim=nd)


@pytest.mark.parametrize("seed", range(10))
def test_df_kernel_program_matches_f64_oracle(seed):
    rng = np.random.default_rng(seed)
    nd = int(rng.integers(1, 5))
    kernel = _random_kernel(rng, nd)
    cap = 24
    x = rng.uniform(-2.0, 2.0, (cap, nd)).astype(np.float32)
    q = rng.uniform(-2.5, 2.5, (64, nd)).astype(np.float32)

    params = []
    entry, diag, _ = _compile_kernel(kernel, np.arange(nd), params)
    kh, kl = jax.jit(lambda kp, xx, qh, ql: entry(kp, xx, qh, ql))(
        tuple(params), (jnp.asarray(x), jnp.zeros_like(x)),
        jnp.asarray(q), jnp.zeros_like(q))
    gh, gl = jax.jit(lambda kp, qh, ql: diag(kp, qh, ql))(
        tuple(params), jnp.asarray(q), jnp.zeros_like(q))
    got = np.asarray(kh, np.float64) + np.asarray(kl, np.float64)
    got_d = np.asarray(gh, np.float64) + np.asarray(gl, np.float64)

    with _oracle_env():
        k64 = lift64(kernel)
        want = np.asarray(k64(jnp.asarray(x, jnp.float64),
                              jnp.asarray(q, jnp.float64)), np.float64)
        want_d = np.asarray(k64.diag(jnp.asarray(q, jnp.float64)),
                            np.float64)

    scale = np.maximum(np.abs(want), 1e-8)
    assert np.max(np.abs(got - want) / scale) < 2.0 ** -36, (
        np.max(np.abs(got - want) / scale))
    scale_d = np.maximum(np.abs(want_d), 1e-8)
    assert np.max(np.abs(got_d - want_d) / scale_d) < 2.0 ** -36
