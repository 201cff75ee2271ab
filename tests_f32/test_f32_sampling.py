"""Dtype-lane independence of hidden-system draws (VERDICT r2, item 2).

``sample_gp_function`` computes the full-covariance posterior inside a
float64 island from float64-lifted inputs and draws pinned-dtype
normals, so a float32 session and a float64 session with the same key
sample the SAME hidden system (bit-identical island; the residual
difference is f32 evaluation rounding of the reconstruction, ~1e-5).
Previously the two lanes fed the eigendecomposition working-dtype
covariances and diverged chaotically.

The cross-lane test spawns one subprocess per dtype lane (the x64 flag
is process-global) running ``_lane_probe.py`` — the same sampled-ROA
loop — and asserts the drawn systems and the certified results match.
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402

_PROBE = os.path.join(os.path.dirname(__file__), "_lane_probe.py")


def _run_probe(x64):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU subprocess: skip the
    # TPU-tunnel plugin (it blocks interpreter exit for minutes).
    args = [sys.executable, _PROBE] + (["--x64"] if x64 else [])
    out = subprocess.run(args, capture_output=True, text=True, env=env,
                         timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_lanes_draw_the_same_hidden_system_and_certify_alike():
    f32 = _run_probe(x64=False)
    x64 = _run_probe(x64=True)
    h32 = np.asarray(f32["hidden"])
    h64 = np.asarray(x64["hidden"])
    scale = np.max(np.abs(h64))
    assert scale > 0.1  # the draw is non-trivial
    # Same hidden system up to f32 evaluation rounding of the
    # reconstruction (measured 7e-6 on scale 0.8).
    assert np.max(np.abs(h32 - h64)) < 1e-4 * max(scale, 1.0)
    # Identical certified trajectory on the sampled system.
    assert f32["safe_frac"] == x64["safe_frac"]
    np.testing.assert_allclose(f32["c_max"], x64["c_max"], rtol=1e-5)
    assert f32["safe_frac"] > 0.5  # certifies most of the domain


def test_sample_island_matches_numpy_f64_reconstruction():
    """The library draw equals a from-scratch numpy float64 replication
    (exact prior covariance -> eigh -> truncation -> pinned normals):
    proof that the island really runs in f64 and is lane-independent by
    construction."""
    import jax
    import jax.numpy as jnp

    a = np.array([[0.875]])
    b = np.array([[0.5]])
    gp = sl.GaussianProcess(
        sl.RBF(0.0625, [0.5, 0.5], input_dim=2),
        np.zeros((0, 2)), np.zeros((0, 1)),
        noise_variance=0.0009765625,
        mean_function=sl.LinearSystem([a, b]), capacity=8)
    grid = sl.GridWorld([[-1.0, 1.0], [-1.0, 1.0]], [17, 5])
    key = jax.random.PRNGKey(3)
    raw = np.asarray(sl.sample_gp_function(grid, gp, key, number=2,
                                           return_function=False),
                     dtype=np.float64)

    # From-scratch float64 oracle of the same construction.
    pts = grid.all_points_f64
    d = (pts[:, None, :] - pts[None, :, :]) / 0.5
    cov = 0.0625 * np.exp(-0.5 * np.sum(d ** 2, axis=2))
    mean = pts @ np.hstack([a, b]).T.astype(np.float64)
    w, v = np.linalg.eigh(0.5 * (cov + cov.T))
    keep = w > 1e-6 * w.max()
    z = np.asarray(jax.random.normal(key, (2, len(pts)),
                                     dtype=jnp.float32), np.float64)
    z = z[:, keep]  # absolute eigen-position pairing (cut-stable)
    samples = mean[:, 0][None, :] + z @ (np.sqrt(w[keep])[:, None]
                                         * v[:, keep].T)
    # f32 output cast is the only difference.
    np.testing.assert_allclose(raw, samples, atol=1e-5)
