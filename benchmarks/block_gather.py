"""Row-block vs scalar gathers on a LARGE table (the corner-block
evaluation layout behind functions/simplex.py:_corner_table).
Data-dependent carries defeat the relay's dispatch memoization."""
import time
import numpy as np
import jax, jax.numpy as jnp

N_ROWS = 251001
Q = 251001
rng = np.random.default_rng(0)
table = jnp.asarray(rng.normal(size=(N_ROWS, 1)).astype(np.float32))
idx0 = rng.integers(0, N_ROWS - 502, size=(Q, 3)).astype(np.int32)
idx = jnp.asarray(idx0)

def timeit(f):
    g = jax.jit(f)
    carry = jnp.zeros((), jnp.int32)
    out, carry = g(carry); jax.block_until_ready((out, carry))
    t0 = time.perf_counter(); iters = 20
    for _ in range(iters):
        out, carry = g(carry)
    jax.block_until_ready((out, carry))
    return (time.perf_counter() - t0) / iters

# carry perturbs indices (data-dependent -> no memoization)
def plain(carry):
    ix = (idx + carry) % (N_ROWS - 1)
    vals = table[ix, 0]
    return vals, (carry + jnp.sum(ix[0]) % 3 + 1) % 7

t = timeit(plain)
print(f"plain gather 3/pt:       {t*1e3:7.2f} ms  ({Q/t:.3e} pts/s)")

table4 = jnp.concatenate([table, table + 1, table + 2, table + 3], axis=1)
def block(carry):
    ix = (idx[:, 0] + carry) % (N_ROWS - 1)
    vals = table4[ix]
    return vals, (carry + jnp.sum(ix[0]) % 3 + 1) % 7

t = timeit(block)
print(f"block-row gather 4-wide: {t*1e3:7.2f} ms  ({Q/t:.3e} pts/s)")

# one-hot (current _gather_rows path, force_onehot) at this size for reference
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from safe_learning_tpu.functions.simplex import _gather_rows
def onehot(carry):
    ix = (idx + carry) % (N_ROWS - 1)
    vals = _gather_rows(table, ix, force_onehot=True)
    return vals, (carry + jnp.sum(ix[0]) % 3 + 1) % 7
try:
    t = timeit(onehot)
    print(f"one-hot matmul:          {t*1e3:7.2f} ms  ({Q/t:.3e} pts/s)")
except Exception as e:
    print("one-hot failed:", type(e).__name__, str(e)[:120])
