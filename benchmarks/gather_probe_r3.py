"""Round-3 probe: where does the 51^4 PWL evaluation time go, and what
do the candidate redesign primitives actually cost on this chip?

Measures (1M queries, 51^4 cart-pole-shaped table):
- full Triangulation.evaluate (current path) and its locate/weights-only
  front half;
- raw XLA block-row gather from the (nrect, 2^d) corner table at three
  row widths (16 / 64 / 256 f32) — is cost per row really
  width-independent?
- gather with SORTED indices (does XLA exploit locality?);
- jax.lax.sort_key_val on 1M uint32 pairs (the sort-based streaming
  design's overhead, paid twice);
- one-hot extraction matmul at representative tile/range sizes.

Run detached on the TPU (relay memoizes identical dispatches; every
timed op chains a data-dependent carry).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import safe_learning_tpu as sl  # noqa: E402


def timeit(name, fn, carry, iters=20):
    """Time ``carry = fn(carry)`` chained; print ms/iter.

    The carry RETURNED by each iteration feeds the next — re-issuing
    ``fn`` with the same argument would send bit-identical dispatches,
    which this machine's TPU relay memoizes (the timing would then
    measure relay issue rate, not device compute).
    """
    carry = fn(carry)
    jax.block_until_ready(carry)
    start = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - start) / iters * 1e3
    print(f"{name}: {dt:.3f} ms", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    n_q = 1_000_000

    # --- current Triangulation path at 51^4 ---
    grid = sl.GridWorld([[-1, 1]] * 4, 51)
    tri = sl.Triangulation(grid, rng.normal(
        size=(grid.nindex, 1)).astype(np.float32))
    q = rng.uniform(-1, 1, size=(n_q, 4)).astype(np.float32)
    q_dev = jnp.asarray(q)

    @jax.jit
    def full_eval(pts, carry):
        out = tri(pts + carry * 1e-12)
        return out, jnp.sum(out[:3])

    @jax.jit
    def locate_only(pts, carry):
        verts, weights = tri.interpolation_weights(pts + carry * 1e-12)
        return weights, jnp.sum(weights[:3])

    carry = jnp.zeros(())
    def run_full(c):
        out, c2 = full_eval(q_dev, c)
        return c2
    def run_loc(c):
        w, c2 = locate_only(q_dev, c)
        return c2
    timeit("full evaluate 51^4 (1M q)", run_full, carry)
    timeit("interpolation_weights only", run_loc, carry)

    # --- raw block-row gathers ---
    nrect = int(np.prod(np.asarray(grid.num_points) - 1))
    print("nrect:", nrect, flush=True)
    idx = jnp.asarray(rng.integers(0, nrect, n_q, dtype=np.int64)
                      .astype(np.int32))
    idx_sorted = jnp.sort(idx)

    for width in (16, 64, 256):
        rows = nrect * 16 // width
        table = jnp.asarray(rng.normal(size=(rows, width))
                            .astype(np.float32))
        idx_w = jnp.minimum(idx, rows - 1)
        idx_s = jnp.minimum(idx_sorted, rows - 1)

        @jax.jit
        def take_rows(t, ix, carry):
            out = jnp.take(t, ix + (carry.astype(jnp.int32) * 0), axis=0)
            return jnp.sum(out[:3])

        timeit(f"row gather width={width} ({rows} rows)",
               lambda c, t=table, ix=idx_w: take_rows(t, ix, c), carry)
        timeit(f"row gather width={width} SORTED idx",
               lambda c, t=table, ix=idx_s: take_rows(t, ix, c), carry)

    # --- sort cost ---
    keys = jnp.asarray(rng.integers(0, nrect, n_q, dtype=np.int64)
                       .astype(np.uint32))
    payload = jnp.arange(n_q, dtype=jnp.uint32)

    @jax.jit
    def sort_kv(k, v, carry):
        ks, vs = jax.lax.sort_key_val(k + (carry.astype(jnp.uint32) * 0),
                                      v)
        return jnp.sum(ks[:3].astype(jnp.float32))

    timeit("sort_key_val 1M u32", lambda c: sort_kv(keys, payload, c),
           carry)

    @jax.jit
    def argsort_f32(x, carry):
        order = jnp.argsort(x + carry * 0)
        return jnp.sum(order[:3].astype(jnp.float32))

    vals_f = jnp.asarray(rng.normal(size=n_q).astype(np.float32))
    timeit("argsort 1M f32", lambda c: argsort_f32(vals_f, c), carry)

    # --- one-hot extraction (tile 256 queries x range 2048 rows) ---
    t_tile, r_range = 256, 2048
    offs = jnp.asarray(rng.integers(0, r_range, t_tile).astype(np.int32))
    slab = jnp.asarray(rng.normal(size=(r_range, 16)).astype(np.float32))

    @jax.jit
    def onehot_extract(off, s, carry):
        oh = (off[:, None] == jnp.arange(r_range)[None, :]
              + carry.astype(jnp.int32) * 0).astype(jnp.float32)
        out = oh @ s
        return jnp.sum(out[:3])

    n_tiles = n_q // t_tile
    dt = timeit(f"one-hot extract {t_tile}x{r_range}",
                lambda c: onehot_extract(offs, slab, c), carry, iters=100)
    print(f"  -> extrapolated for {n_tiles} tiles: {dt * n_tiles:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
