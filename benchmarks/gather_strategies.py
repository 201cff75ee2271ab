"""Gather strategies for small parameter tables on TPU."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.default_backend())
rng = np.random.default_rng(0)
n_table = 3025
N = 1_000_000
table = jnp.asarray(rng.normal(size=(n_table,)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, n_table, size=(N, 3)).astype(np.int32))

def timeit(f, name, iters=20):
    g = jax.jit(f)
    carry = jnp.zeros((), jnp.float32)
    carry, out = g(idx, carry)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, out = g(idx, carry)
    float(carry)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt/iters*1e3:.2f} ms")
    return out

def plain(idx, carry):
    i = idx + (carry * 0).astype(jnp.int32)
    vals = table[i]
    return jnp.sin(carry + vals[0, 0]), vals
o1 = timeit(plain, "plain gather")

R = -(-n_table // 128)
table2d = jnp.zeros((R * 128,), jnp.float32).at[:n_table].set(table).reshape(R, 128)

def onehot_matmul(idx, carry):
    i = idx + (carry * 0).astype(jnp.int32)   # (N,3)
    row = i // 128
    lane = i % 128
    row_oh = (row[:, :, None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.float32)  # (N,3,R)
    picked = jax.lax.dot_general(
        row_oh, table2d, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)  # (N,3,128)
    lane_oh = (lane[:, :, None] == jnp.arange(128, dtype=jnp.int32))
    vals = jnp.sum(jnp.where(lane_oh, picked, 0.0), axis=2)
    return jnp.sin(carry + vals[0, 0]), vals
o2 = timeit(onehot_matmul, "onehot row-matmul + lane select")
print("match:", bool(jnp.allclose(o1[..., 0] if o1.ndim==3 else o1, o2, atol=0)))

def onehot_bf16(idx, carry):
    i = idx + (carry * 0).astype(jnp.int32)
    row = i // 128
    lane = i % 128
    row_oh = (row[:, :, None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.bfloat16)
    picked = jax.lax.dot_general(
        row_oh, table2d.astype(jnp.bfloat16), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    lane_oh = (lane[:, :, None] == jnp.arange(128, dtype=jnp.int32))
    vals = jnp.sum(jnp.where(lane_oh, picked, 0.0), axis=2)
    return jnp.sin(carry + vals[0, 0]), vals
timeit(onehot_bf16, "onehot bf16 variant")
