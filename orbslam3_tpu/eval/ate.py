"""ATE evaluation: association + Horn alignment with scale.

Standalone re-implementation of the reference acceptance oracle
(evaluation/evaluate_ate_scale.py + associate.py): associate estimated and
ground-truth trajectories by timestamp, align with Umeyama (rotation +
translation + scale), report translational RMSE.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..ops import align


def associate(ts_a: np.ndarray, ts_b: np.ndarray,
              max_dt: float = 0.02) -> list[tuple[int, int]]:
    """Greedy nearest-timestamp association (reference associate.py)."""
    pairs = []
    j = 0
    used_b = set()
    for i, ta in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, ta))
        best, best_dt = -1, max_dt
        for cand in (j - 1, j, j + 1):
            if 0 <= cand < len(ts_b) and cand not in used_b:
                dt = abs(ts_b[cand] - ta)
                if dt < best_dt:
                    best, best_dt = cand, dt
        if best >= 0:
            pairs.append((i, best))
            used_b.add(best)
    return pairs


def evaluate_ate(est_ts: np.ndarray, est_xyz: np.ndarray,
                 gt_ts: np.ndarray, gt_xyz: np.ndarray,
                 max_dt: float = 0.02, with_scale: bool = True):
    """Returns dict(rmse, mean, median, scale, n_pairs)."""
    pairs = associate(est_ts, gt_ts, max_dt)
    if len(pairs) < 3:
        return dict(rmse=float("inf"), mean=float("inf"),
                    median=float("inf"), scale=0.0, n_pairs=len(pairs))
    ei = np.asarray([p[0] for p in pairs])
    gi = np.asarray([p[1] for p in pairs])
    e = jnp.asarray(est_xyz[ei], jnp.float32)
    g = jnp.asarray(gt_xyz[gi], jnp.float32)
    R, t, s = align.umeyama_alignment(e, g, with_scale=with_scale)
    ea = s * e @ R.T + t
    err = np.asarray(jnp.linalg.norm(ea - g, axis=-1))
    return dict(rmse=float(np.sqrt(np.mean(err ** 2))),
                mean=float(err.mean()), median=float(np.median(err)),
                scale=float(s), n_pairs=len(pairs))
