"""Trajectory / point-set alignment: Horn closed-form and Umeyama Sim(3).

Used by: ATE evaluation (reference evaluation/evaluate_ate_scale.py:50-80),
GNSS georeferencing (reference src/GeometricReferencer.cpp:119-166), and
the Sim3 solver for loop closure (reference src/Sim3Solver.cc:311
ComputeSim3 — Horn 1987 quaternion method).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def umeyama_alignment(src: jnp.ndarray, dst: jnp.ndarray,
                      with_scale: bool = True,
                      weights: jnp.ndarray | None = None):
    """Least-squares similarity transform:  dst ~= s * R @ src + t.

    src, dst: (N, 3).  weights: optional (N,) nonneg.  Returns (R, t, s).
    Umeyama (1991) via SVD of the weighted cross-covariance.
    """
    if weights is None:
        weights = jnp.ones(src.shape[0], dtype=src.dtype)
    wsum = jnp.sum(weights) + 1e-12
    wn = (weights / wsum)[:, None]
    mu_s = jnp.sum(src * wn, axis=0)
    mu_d = jnp.sum(dst * wn, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = jnp.matmul((xd * wn).T, xs, precision=_HI)  # (3, 3)
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.sign(det))
    R = jnp.matmul(jnp.matmul(U, S, precision=_HI), Vt, precision=_HI)
    var_s = jnp.sum(wn[:, 0] * jnp.sum(xs * xs, axis=-1))
    if with_scale:
        s = jnp.sum(D * jnp.diag(S)) / (var_s + 1e-12)
    else:
        s = jnp.asarray(1.0, dtype=src.dtype)
    t = mu_d - s * jnp.matmul(R, mu_s, precision=_HI)
    return R, t, s


def horn_alignment(src: jnp.ndarray, dst: jnp.ndarray):
    """Rigid alignment (R, t) minimizing ||dst - (R src + t)||; Horn via SVD."""
    R, t, _ = umeyama_alignment(src, dst, with_scale=False)
    return R, t


def ate_rmse(est: jnp.ndarray, gt: jnp.ndarray, with_scale: bool = True):
    """Absolute trajectory error after Horn(+scale) alignment.

    est, gt: (N, 3) associated positions.  Returns (rmse, s, R, t) —
    mirrors the reference acceptance oracle
    (evaluation/evaluate_ate_scale.py: align() then RMSE over the
    translational residuals).
    """
    R, t, s = umeyama_alignment(est, gt, with_scale=with_scale)
    est_aligned = s * jnp.matmul(est, R.T, precision=_HI) + t
    err = est_aligned - gt
    rmse = jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))
    return rmse, s, R, t
