"""Overflow-regime PWL gather strategies on real hardware.

At 61^4 the full corner-block table (207M entries) exceeds
``config.block_gather_limit`` (2^27); round 2 fell back to ``d + 1 = 5``
chain gathers per query. Row-gather cost is width-independent
(``gather_probe_r3.py``), so the round-3 partially folded table
(fold k=3: 8-fold copy, 105M entries, fits) needs only ``2^(d-k) = 2``
row gathers per query. This script measures chain vs partial vs (for
reference) the 51^4 full-block path, 1M queries each.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402
from safe_learning_tpu.config import config  # noqa: E402


def timeit(name, fn, iters=20):
    """Time a chained jitted call; print ms/iter."""
    out = fn(jnp.zeros(()))
    jax.block_until_ready(out)
    start = time.perf_counter()
    carry = out
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - start) / iters * 1e3
    print(f"{name}: {dt:.3f} ms / 1M queries", flush=True)
    return dt


def bench_grid(n_per_dim, limit, label):
    """Evaluate a 4-D Triangulation at 1M points under a gather limit."""
    rng = np.random.default_rng(0)
    grid = sl.GridWorld([[-1, 1]] * 4, n_per_dim)
    tri = sl.Triangulation(grid, rng.normal(
        size=(grid.nindex, 1)).astype(np.float32))
    q = jnp.asarray(rng.uniform(-1, 1, size=(1_000_000, 4))
                    .astype(np.float32))

    config.block_gather_limit = limit
    jax.clear_caches()
    fold = tri._block_fold()

    @jax.jit
    def run(carry):
        out = tri(q + carry * 1e-12)
        return jnp.sum(out[:3])

    timeit(f"{label} (fold={fold})", run)


def main():
    print("devices:", jax.devices(), flush=True)
    # 61^4: full table 207M entries > 2^27 -> partial fold 3 (2 gathers)
    bench_grid(61, 2 ** 27, "61^4 partial-fold table")
    # Same grid, chain fallback (round-2 behavior above the limit).
    bench_grid(61, 1, "61^4 chain gathers (d+1=5)")
    # 51^4 full block for reference.
    bench_grid(51, 2 ** 27, "51^4 full corner block")


if __name__ == "__main__":
    main()
