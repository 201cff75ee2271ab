"""Secondary throughput numbers: PWL triangulation eval + ROA rollouts."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl

print("backend:", jax.default_backend())

# --- Triangulation (Kuhn PWL) evaluation: 55x55 table, 1M queries ---
grid = sl.GridWorld([[-2., 2.], [-1.5, 1.5]], [55, 55])
tri = sl.Triangulation(grid, np.random.default_rng(0).normal(
    size=grid.nindex), project=True)
rng = np.random.default_rng(1)
q = jnp.asarray(rng.uniform(-2, 2, size=(1_000_000, 2)).astype(np.float32))

@jax.jit
def tri_chain(q, carry):
    out = tri(q + carry * 1e-9).reshape(-1)
    return jnp.sin(out[0] + carry), out

carry = jnp.zeros((), dtype=q.dtype)
carry, out = tri_chain(q, carry)
out.block_until_ready()
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    carry, out = tri_chain(q, carry)
float(carry)
dt = time.perf_counter() - t0
print(f"triangulation eval: {1e6*iters/dt:.3e} points/s")

# --- ROA forward simulation: pendulum 101^2 grid x 500 steps ---
pend = sl.InvertedPendulum(0.15, 0.5, 0.1, 0.01,
                           normalization=((np.pi, 2*np.pi), (1.0,)))
a, b = pend.linearize()
k, _ = sl.utils.dlqr(np.asarray(a), np.asarray(b), np.eye(2), np.eye(1))
pol = sl.Saturation(sl.LinearSystem(-k), -1., 1.)
roa_grid = sl.GridWorld([[-1., 1.]]*2, 101)
pts = jnp.asarray(roa_grid.all_points)

@jax.jit
def roa_chain(pts, carry):
    x = pts + carry * 1e-9
    def step(s, _):
        nxt = jnp.clip(pend(s, pol(s)), -1e6, 1e6)
        return nxt, None
    end, _ = jax.lax.scan(step, x, None, length=500)
    ok = jnp.linalg.norm(end, axis=1) <= 0.1
    return jnp.sin(carry + jnp.sum(ok).astype(x.dtype)), ok

carry = jnp.zeros((), dtype=pts.dtype)
carry, ok = roa_chain(pts, carry)
ok.block_until_ready()
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    carry, ok = roa_chain(pts, carry)
float(carry)
dt = time.perf_counter() - t0
steps = roa_grid.nindex * 500 * iters
print(f"ROA simulation: {steps/dt:.3e} state-steps/s "
      f"(roa fraction {float(jnp.mean(ok)):.3f})")
