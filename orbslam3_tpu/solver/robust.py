"""Robust kernels and chi2 gates shared by all optimizers.

Constants mirror the reference (src/Optimizer.cc): Huber deltas
sqrt(5.991) mono reprojection, sqrt(7.815) stereo/pose, sqrt(16.92)
inertial 9-dof (deltaMono/deltaStereo/thHuberMono etc.).
"""

from __future__ import annotations

import jax.numpy as jnp

CHI2_MONO = 5.991      # 2-dof 95%
CHI2_STEREO = 7.815    # 3-dof 95%
CHI2_INERTIAL = 16.92  # 9-dof
HUBER_MONO = CHI2_MONO ** 0.5
HUBER_STEREO = CHI2_STEREO ** 0.5
HUBER_INERTIAL = CHI2_INERTIAL ** 0.5


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for the Huber kernel given chi2 = r^T Omega r.

    w = 1 for |r|_O <= delta else delta / |r|_O  (g2o RobustKernelHuber).
    """
    e = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.where(e <= delta, 1.0, delta / e)
