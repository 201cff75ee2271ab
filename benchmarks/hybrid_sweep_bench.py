"""End-to-end cost of the hybrid band-filtered rigor sweep (r5).

Builds the flagship 1000x1000 GP verification instance (``bench.py``'s
discriminating workload) and times FULL ``update_safe_set`` runs —
including margin gathers, host reductions, and the certified-level
cut — in three modes on the live backend:

1. plain f32 with the derived per-point margin (the hot loop),
2. ``extended="hybrid"`` (identical certificate to 3, near cost of 1),
3. ``extended=True`` (the full double-word pipeline, r4's 140x).

Asserts the hybrid certificate (safe set AND c_max) equals the full
extended one, then prints per-mode wall-clock, the hybrid band
fraction, and the cost ratios as JSON lines.

Usage (TPU; launch detached — the relay blocks interpreter exit):

    PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
        benchmarks/hybrid_sweep_bench.py > /tmp/hybrid_bench.log 2>&1 &

CPU smoke:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
        python benchmarks/hybrid_sweep_bench.py --points 100
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_lyapunov(n_points):
    import safe_learning_tpu as sl
    from bench import _build_instance

    (grid, policy, v, lv, lf, gp, tau, initial_set, a, x_train, y_train,
     params) = _build_instance(n_points=n_points)
    return sl.Lyapunov(grid, v, gp, lf, lv, tau, policy,
                       initial_set=initial_set)


def reset(lyap):
    lyap.safe_set = np.zeros(lyap.discretization.nindex, dtype=bool)
    if lyap.initial_safe_set is not None:
        lyap.safe_set |= lyap.initial_safe_set


def timed_sweep(lyap, label, **kwargs):
    """Warm-up + timed update_safe_set; returns (seconds, safe, c_max)."""
    reset(lyap)
    lyap.update_safe_set(**kwargs)          # compile + warm caches
    reset(lyap)
    t0 = time.time()
    lyap.update_safe_set(**kwargs)
    dt = time.time() - t0
    safe = np.array(lyap.safe_set)
    print(json.dumps({
        "section": label, "seconds": round(dt, 3),
        "checks_per_sec": lyap.discretization.nindex / dt,
        "safe_fraction": float(safe.mean()),
        "c_max": float(lyap.c_max)}), flush=True)
    return dt, safe, lyap.c_max


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1000,
                    help="grid points per axis (1000 -> the 1M bench)")
    args = ap.parse_args()

    import jax

    from safe_learning_tpu.errorbounds import analytic_certificate_margin
    from safe_learning_tpu.ops.extended_verify import (
        extended_certificate_margin)

    dev = jax.devices()[0]
    print(json.dumps({"section": "backend", "platform": dev.platform,
                      "device": str(dev), "points": args.points ** 2}),
          flush=True)

    lyap = build_lyapunov(args.points)

    # Plain mode: the derived per-point f32 margin (L_v model
    # auto-probed from the 2|Px| lambda, r5).
    t0 = time.time()
    m32 = analytic_certificate_margin(lyap, per_point=True)
    print(json.dumps({"section": "margin_f32_derived",
                      "seconds": round(time.time() - t0, 2),
                      "max": float(np.max(m32)),
                      "min": float(np.min(m32))}), flush=True)
    t_plain, safe_plain, c_plain = timed_sweep(lyap, "plain_f32")

    # Rigor modes: the extended per-point margin.
    t0 = time.time()
    m_ext = extended_certificate_margin(lyap, per_point=True)
    print(json.dumps({"section": "margin_extended_derived",
                      "seconds": round(time.time() - t0, 2),
                      "max": float(np.max(m_ext))}), flush=True)
    t_hyb, safe_hyb, c_hyb = timed_sweep(lyap, "hybrid",
                                         extended="hybrid")
    band = lyap.last_band_fraction
    t_ext, safe_ext, c_ext = timed_sweep(lyap, "extended_full",
                                         extended=True)

    assert (safe_hyb == safe_ext).all(), "hybrid != extended safe set"
    assert c_hyb == c_ext, (c_hyb, c_ext)

    # Tier B: MEASURED (calibrated) band. The derived band overshoots
    # the true f32 error by ~1e4x on this instance (the abs-matvec
    # condition-number factor), putting ~20% of the grid in the band;
    # the calibrated band (safety 2x the measured worst f32-vs-oracle
    # error on 4096 samples) shrinks it to a sliver. Soundness is then
    # measurement-grade — the SAME assumption the repo's default plain
    # sweep already makes with this margin — while the certificate gets
    # extended-grade tightness (band points are decided exactly).
    from safe_learning_tpu.oracle import calibrate_certificate_margin

    t0 = time.time()
    band_cal = calibrate_certificate_margin(lyap, num_samples=4096,
                                            set_margin=False)
    print(json.dumps({"section": "band_calibrated",
                      "seconds": round(time.time() - t0, 2),
                      "band": band_cal}), flush=True)
    lyap.hybrid_band_margin = band_cal
    t_hybc, safe_hybc, c_hybc = timed_sweep(lyap, "hybrid_calibrated",
                                            extended="hybrid")
    band_c = lyap.last_band_fraction
    lyap.hybrid_band_margin = None
    same = bool((safe_hybc == safe_ext).all() and c_hybc == c_ext)

    print(json.dumps({
        "section": "summary", "identical_certificate": True,
        "band_fraction_derived": band,
        "band_fraction_calibrated": band_c,
        "hybrid_over_plain": round(t_hyb / t_plain, 3),
        "hybrid_calibrated_over_plain": round(t_hybc / t_plain, 3),
        "extended_over_plain": round(t_ext / t_plain, 3),
        "hybrid_speedup_vs_extended": round(t_ext / t_hyb, 3),
        "calibrated_matches_extended": same}),
        flush=True)


if __name__ == "__main__":
    main()
