"""Robust PnP: batched RANSAC pose-from-3D-2D correspondences.

Parity target: reference MLPnPsolver (src/MLPnPsolver.cpp — RANSAC
maximum-likelihood PnP with nullspace bearing parametrization; params
prob .95, minInliers 50, maxIts 300, minSet 12 at src/Tracking.cc:839).

TPU design: the MLPnP nullspace machinery exists to squeeze accuracy out
of a scalar CPU solver.  Here every RANSAC hypothesis is a linear DLT
P6P solve (SVD of the stacked projection equations), all hypotheses
evaluated in parallel, followed by the robust IRLS pose optimizer on the
winning inlier set — same contract (pose + inliers from 2D-3D matches,
no prior), simpler per-hypothesis math, massively parallel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import cameras, lie
from ..solver import pose_opt

_HI = jax.lax.Precision.HIGHEST


class PnPResult(NamedTuple):
    success: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _dlt_p6p(X: jnp.ndarray, xn: jnp.ndarray):
    """Linear pose from >=6 points: X (S,3) world, xn (S,2) normalized
    image coords.  Hartley-normalized DLT; R orthogonalized."""
    S = X.shape[0]
    # normalize 3D points: centroid -> 0, RMS -> sqrt(3)
    c = jnp.mean(X, axis=0)
    Xc_ = X - c
    rms = jnp.sqrt(jnp.mean(jnp.sum(Xc_ ** 2, axis=1)) + 1e-12)
    s = jnp.sqrt(3.0) / rms
    Xn = Xc_ * s
    zeros = jnp.zeros((S, 4))
    Xh = jnp.concatenate([Xn, jnp.ones((S, 1))], axis=1)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2S, 12)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Pn = Vt[-1].reshape(3, 4)
    # denormalize: X_norm = s (X - c)  =>  P = Pn @ [[sI, -s c], [0, 1]]
    M = Pn[:, :3] * s
    p3 = Pn[:, 3] - Pn[:, :3] @ (s * c)
    det = jnp.linalg.det(M)
    scale = jnp.sign(det) * jnp.cbrt(jnp.abs(det) + 1e-20)
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    M = M / scale
    p3 = p3 / scale
    # M is a raw (scale-removed) DLT estimate — not near-orthogonal, so it
    # needs the exact SVD projection, not the Newton polar step
    R = lie.normalize_rotation_svd(M)
    return R, p3


def solve_pnp(X: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
              cam_model: str, cam_params, key,
              iterations: int = 256, sample: int = 12,
              chi2_th: float = 5.991, min_inliers: int = 30) -> PnPResult:
    """X (N,3) world points matched to uv (N,2) pixels; RANSAC + refine.

    sample=12 matches the reference MLPnP minSet (a 12-point DLT averages
    pixel noise down enough for reliable hypothesis scoring); hypotheses
    are scored with a loosened gate (4x chi2) so near-miss poses still
    collect their true support, then the IRLS pose optimizer re-selects
    inliers at the strict threshold.
    """
    n = X.shape[0]
    rays = cameras.unproject(cam_model, cam_params, uv)
    xn = rays[:, :2] / rays[:, 2:3]

    w = valid.astype(jnp.float32) + 1e-9
    idx = jax.random.categorical(
        key, jnp.log(w)[None, :].repeat(iterations * sample, 0)
    ).reshape(iterations, sample)

    Rs, ts = jax.vmap(lambda s: _dlt_p6p(X[s], xn[s]))(idx)

    def score(R, t, th):
        Xc = lie.se3_apply(R, t, X)
        e = uv - cameras.project(cam_model, cam_params, Xc)
        chi2 = jnp.sum(e * e, axis=-1)
        ok = (chi2 < th) & valid & (Xc[:, 2] > 0.01)
        return jnp.sum(ok.astype(jnp.int32)), ok

    counts, inl = jax.vmap(lambda R, t: score(R, t, 4.0 * chi2_th))(Rs, ts)
    best = jnp.argmax(counts)
    res = pose_opt.pose_optimization(
        Rs[best], ts[best], X, uv, jnp.ones(n), inl[best],
        cam_model, cam_params, rounds=3, its_per_round=6,
        chi2_th=chi2_th)
    return PnPResult(success=res.n_inliers >= min_inliers,
                     R=res.R, t=res.t, inliers=res.inliers,
                     n_inliers=res.n_inliers)
