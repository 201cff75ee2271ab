"""Probe: do the error-free transformations hold on the real TPU?

Runs ``ops.extended.eft_selfcheck`` on the live backend, then measures
the accuracy of the double-word ops (add/mul/div/sqrt/exp/dot) against
float64 ground truth, and times a representative df predict-shaped
matmul chain. Results print as one JSON line per section; launch
detached (the axon relay blocks interpreter exit for minutes):

    nohup python -u benchmarks/eft_tpu_probe.py > /tmp/eft_probe.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from safe_learning_tpu.ops import extended as ext


def main():
    dev = jax.devices()[0]
    print(json.dumps({"section": "backend", "platform": dev.platform,
                      "device": str(dev)}), flush=True)

    t0 = time.time()
    try:
        ext.eft_selfcheck()
        ok = True
        err = None
    except RuntimeError as e:  # loud failure is the designed behavior
        ok = False
        err = str(e)
    print(json.dumps({"section": "eft_selfcheck", "ok": ok,
                      "error": err, "seconds": time.time() - t0}),
          flush=True)
    if not ok:
        return

    rng = np.random.default_rng(0)
    # Accuracy of compiled double-word ops vs float64.
    a64 = rng.normal(0.0, 1.0, 4096) * 10.0 ** rng.uniform(-3, 3, 4096)
    b64 = rng.normal(0.0, 1.0, 4096) * 10.0 ** rng.uniform(-3, 3, 4096)
    x = ext.df_from_f64(a64)
    y = ext.df_from_f64(b64)
    xr = np.asarray(x[0], np.float64) + np.asarray(x[1], np.float64)
    yr = np.asarray(y[0], np.float64) + np.asarray(y[1], np.float64)

    def relerr(got, truth, floor=1e-300):
        g = (np.asarray(got[0], np.float64)
             + np.asarray(got[1], np.float64))
        return float(np.max(np.abs(g - truth)
                            / np.maximum(np.abs(truth), floor)))

    checks = {
        "add": (jax.jit(ext.df_add), xr + yr),
        "mul": (jax.jit(ext.df_mul), xr * yr),
        "div": (jax.jit(ext.df_div), xr / yr),
    }
    out = {}
    for name, (fn, truth) in checks.items():
        out[name] = relerr(fn(x, y), truth)
    out["sqrt"] = relerr(jax.jit(ext.df_sqrt)(
        (jnp.abs(x[0]), jnp.where(x[0] < 0, -x[1], x[1]))),
        np.sqrt(np.abs(xr)))
    # exp on the covariance range
    e64 = -np.abs(rng.normal(0.0, 8.0, 4096))
    ex = ext.df_from_f64(e64)
    exr = (np.asarray(ex[0], np.float64)
           + np.asarray(ex[1], np.float64))
    out["exp"] = relerr(jax.jit(ext.df_exp)(ex), np.exp(exr))
    print(json.dumps({"section": "op_accuracy_log2",
                      **{k: float(np.log2(max(v, 2.0 ** -80)))
                         for k, v in out.items()}}), flush=True)

    # df matmul accuracy + timing at predict-like shapes.
    cap, n = 128, 8192
    A64 = rng.normal(size=(cap, cap)) / np.sqrt(cap)
    K64 = np.exp(-rng.uniform(0, 8, size=(cap, n)))
    A = ext.df_from_f64(A64)
    K = ext.df_from_f64(K64)
    mm = jax.jit(ext.df_matmul)
    got = mm(A, K)
    truth = (np.asarray(A[0], np.float64)
             + np.asarray(A[1], np.float64)) @ (
        np.asarray(K[0], np.float64) + np.asarray(K[1], np.float64))
    scale = np.abs(A64) @ np.abs(K64)
    rel = float(np.max(np.abs(
        np.asarray(got[0], np.float64) + np.asarray(got[1], np.float64)
        - truth) / np.maximum(scale, 1e-30)))
    print(json.dumps({"section": "matmul_accuracy",
                      "log2_rel_vs_abs_scale":
                          float(np.log2(max(rel, 2.0 ** -80)))}),
          flush=True)

    # Timing: chained through a data-dependent carry (relay memoizes).
    def chain(k_pair, reps):
        def body(c, _):
            h, l = ext.df_matmul(A, (c, k_pair[1]))
            # renormalize magnitude so the carry stays bounded
            h = h * (1.0 / jnp.maximum(jnp.max(jnp.abs(h)), 1e-3))
            return h, None
        h, _ = jax.lax.scan(body, k_pair[0], None, length=reps)
        return h

    reps = 10
    cj = jax.jit(chain, static_argnames="reps")
    r = cj(K, reps)
    r.block_until_ready()
    t0 = time.time()
    r = cj(K, reps)
    r.block_until_ready()
    dt = time.time() - t0
    per = dt / reps
    flops = cap * cap * n  # df-MACs
    print(json.dumps({"section": "matmul_timing", "cap": cap, "n": n,
                      "seconds_per_matmul": per,
                      "df_macs_per_s": flops / per}), flush=True)


if __name__ == "__main__":
    main()
