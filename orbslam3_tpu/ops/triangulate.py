"""DLT triangulation and alignment utilities.

(reference: src/GeometricTools.cc GeometricTools::Triangulate — SVD of the
4x4 DLT system; evaluation/evaluate_ate_scale.py Horn alignment;
src/GeometricReferencer.cpp:119-166 Umeyama with scale.)
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(ray1: jnp.ndarray, ray2: jnp.ndarray,
                    Tcw1_R: jnp.ndarray, Tcw1_t: jnp.ndarray,
                    Tcw2_R: jnp.ndarray, Tcw2_t: jnp.ndarray) -> jnp.ndarray:
    """Triangulate world points from two normalized camera rays.

    ray_i: (..., 3) bearing in camera i with z=1 (or any scale);
    Tcw_i: world->camera.  Returns world xyz (..., 3).

    Solves the standard DLT: rows (x*P3 - P1), (y*P3 - P2) for both views,
    via SVD of the 4x4 system (batched — XLA maps small SVDs fine, but we
    use the closed-form normal-equation solve on A^T A for TPU speed).
    """
    P1 = jnp.concatenate([Tcw1_R, Tcw1_t[..., None]], axis=-1)  # (..., 3, 4)
    P2 = jnp.concatenate([Tcw2_R, Tcw2_t[..., None]], axis=-1)

    def rows(ray, P):
        x = ray[..., 0] / ray[..., 2]
        y = ray[..., 1] / ray[..., 2]
        r0 = x[..., None] * P[..., 2, :] - P[..., 0, :]
        r1 = y[..., None] * P[..., 2, :] - P[..., 1, :]
        return r0, r1

    a0, a1 = rows(ray1, P1)
    a2, a3 = rows(ray2, P2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., 4, 4)
    # Null vector of A: smallest right singular vector. SVD of 4x4 batched.
    _, _, Vt = jnp.linalg.svd(A)
    X = Vt[..., 3, :]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w[..., None]
