"""Break down Triangulation evaluation cost on TPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import numpy as np
import jax, jax.numpy as jnp
import safe_learning_tpu as sl

print("backend:", jax.default_backend())
grid = sl.GridWorld([[-2., 2.], [-1.5, 1.5]], [55, 55])
tri = sl.Triangulation(grid, np.random.default_rng(0).normal(
    size=grid.nindex), project=True)
rng = np.random.default_rng(1)
q = jnp.asarray(rng.uniform(-2, 2, size=(1_000_000, 2)).astype(np.float32))
params = tri.parameters

def timeit(fn, name, iters=20):
    carry = jnp.zeros((), jnp.float32)
    f = jax.jit(fn)
    carry, out = f(q, carry)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = f(q, carry)
    float(carry)
    dt = time.perf_counter() - t0
    print(f"{name}: {1e6*iters/dt:.3e} pts/s ({dt/iters*1e3:.2f} ms)")

def full(q, carry):
    out = tri(q + carry * 1e-9).reshape(-1)
    return jnp.sin(out[0] + carry), out
timeit(full, "full evaluate")

def locate_only(q, carry):
    v, w, o = tri._locate(q + carry * 1e-9)
    return jnp.sin(carry + w[0, 0] + v[0, 0].astype(jnp.float32)), (v, w)
timeit(locate_only, "locate only")

def gather_only(q, carry):
    idx = (q[:, :1] * 0 + carry).astype(jnp.int32) + \
        jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], 3), 1)
    vals = params[idx]
    return jnp.sin(carry + vals[0].sum()), vals
timeit(gather_only, "gather only (3/point)")

# one_hot matmul alternative for the gather+weighted sum
def locate_then_segment(q, carry):
    v, w, _ = tri._locate(q + carry * 1e-9)
    vals = params[v]  # (N,3,1)
    out = jnp.sum(w[:, :, None] * vals, axis=1)
    return jnp.sin(carry + out[0, 0]), out
timeit(locate_then_segment, "locate+gather+sum")
