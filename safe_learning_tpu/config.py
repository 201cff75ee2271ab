"""Global configuration for the TPU-native safe-learning framework.

Replaces the reference's mutable ``config`` singleton
(``/root/reference/safe_learning/configuration.py:8-32``) with a dtype policy
that is aware of TPU hardware: float32 by default (MXU/VPU native), float64
only when JAX's x64 mode is enabled (used for high-precision CPU parity
tests; on TPU f64 is emulated and slow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Configuration", "config"]


class Configuration:
    """Global configuration singleton.

    Attributes
    ----------
    dtype : jnp.dtype
        Default floating dtype. If not explicitly set, follows JAX's x64
        flag: float64 when ``jax_enable_x64`` is on, float32 otherwise.
    gp_batch_size : int
        Number of grid points evaluated per device dispatch during safe-set
        verification (reference: ``configuration.py:19`` uses 10 000 on CPU;
        a TPU core wants much larger batches to keep the MXU busy).
    solve_dtype : jnp.dtype or None
        Dtype of the host-side high-precision islands (GP Cholesky cache
        refresh in float32 mode, posterior function sampling). ``None``
        means float64.
    use_pallas : bool
        Route hot ops through the fused Pallas TPU kernels in
        ``safe_learning_tpu.ops`` when the backend supports them.
    """

    def __init__(self):
        self._dtype = None
        self.gp_batch_size = 2 ** 16
        self.solve_dtype = None
        self.use_pallas = True
        # MXU precision for the fused GP predict's f32 matmuls. Only
        # "highest" (6-pass exact f32) exists: Mosaic cannot lower
        # Precision.HIGH in a Pallas dot_general (measured decision,
        # benchmarks/precision_sweep.py).
        self.pallas_precision = "highest"
        # Largest grid verified as ONE fused device program (above this
        # the sweep streams gp_batch_size chunks to bound device memory).
        self.fused_sweep_limit = 2 ** 24
        # Largest GP data capacity routed through the fused Pallas
        # predict: the (stacked) inverse Cholesky factors are resident in
        # VMEM, so S * cap^2 floats must fit comfortably (2048^2 f32 =
        # 16 MB). Larger GPs fall back to the XLA matmul chain, which
        # streams from HBM.
        self.pallas_max_capacity = 2048
        # PWL evaluation gathers ONE cell-corner block row per query
        # (2^d values; measured 2.4-5.6x over per-vertex gathers) as long
        # as the 2^d-fold corner table stays under this many entries
        # (default 2^27 = 512 MB f32 — covers a 51^4 grid); above it the
        # per-vertex gather path is used.
        self.block_gather_limit = 2 ** 27
        # Conservative-certificate margin (absolute, in Lyapunov-value
        # units): the decrease condition certifies only
        # ``decrease < threshold - margin`` and exploration only
        # ``v_future < c_max - margin``, so float32 pipeline rounding of
        # at most ``margin`` cannot over-claim a certificate. 0 (exact
        # comparisons) matches the reference; calibrate per instance
        # against the float64 oracle with
        # ``oracle.calibrate_certificate_margin``. Lyapunov objects can
        # override per instance.
        self.certificate_margin = 0.0
        # Companion margin for the LEVEL comparison ``v < v_bad``: a
        # state whose exact value ties/crosses the exact level cut
        # within f32 rounding of v must not slip into the certified
        # set. Calibrated together with certificate_margin.
        self.level_margin = 0.0
        # Hardware slack multiplier on the unit roundoff used by the
        # ANALYTIC certificate-margin derivation
        # (errorbounds.analytic_certificate_margin): covers non-IEEE dot
        # implementations (MXU 6-pass bf16 HIGHEST) and transcendental
        # slack. 4.0 dominates every recorded kernel-accuracy
        # measurement on v5e by a wide margin.
        self.fp_error_factor = 4.0
        # Online GP learning: refresh the Cholesky cache with an O(n^2)
        # bordered append (float64 host island) when possible, instead of
        # the O(n^3) refactorization. Equivalent to f64 roundoff; set
        # False to force refactorization on every data addition.
        self.incremental_gp_updates = True

    @property
    def dtype(self):
        """Return the default floating dtype."""
        if self._dtype is not None:
            return self._dtype
        if jax.config.jax_enable_x64:
            return jnp.float64
        return jnp.float32

    @dtype.setter
    def dtype(self, value):
        """Set (or reset to automatic) the default floating dtype."""
        self._dtype = None if value is None else jnp.dtype(value)

    @property
    def np_dtype(self):
        """Return the numpy equivalent of the default dtype."""
        return np.dtype(self.dtype)

    def __repr__(self):
        """Debug representation."""
        return ("Configuration(dtype={}, gp_batch_size={})"
                .format(np.dtype(self.dtype).name, self.gp_batch_size))


config = Configuration()
