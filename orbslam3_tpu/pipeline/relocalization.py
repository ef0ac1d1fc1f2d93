"""Relocalization: recover tracking after loss via place recognition.

Parity target: upstream Tracking::Relocalization (declared but deleted in
the fork — include/Tracking.h:169; the fork resets instead,
src/Tracking.cc:543) + KeyFrameDatabase::DetectRelocalizationCandidates
(src/KeyFrameDatabase.cc:731) + MLPnPsolver RANSAC
(src/MLPnPsolver.cpp; params at src/Tracking.cc:839).

TPU design: candidates from the TF-IDF database; 2D-3D correspondences by
brute-force descriptor matching against the candidate KF's map points
(the TPU replacement for per-node BoW matching); pose from a batched
P3P-free approach — initialize at the candidate keyframe's pose and run
the robust pose optimizer (4x10 IRLS rounds with chi2 re-classification),
which plays the role of MLPnP+PoseOptimization for candidates that are
genuinely the same place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import matching
from ..place import keyframe_db as kdb
from ..solver import pose_opt


def attempt_relocalization(system, ff, loop_closer,
                           min_inliers: int = 30):
    """Try to relocalize `ff` against the keyframe database.

    Returns (success, R, t).  Mutates nothing.
    """
    m = system.map
    bow, _ = loop_closer._bow(ff.desc, ff.valid)
    K = m.kf_R.shape[0]
    scores, common = kdb.query(loop_closer.db, bow)
    order = jnp.argsort(-scores)
    scores_np = jax.device_get(scores)
    order_np = jax.device_get(order)
    best = float(scores_np[order_np[0]])
    if best <= 0:
        return False, None, None
    # candidate admission: every KF scoring >= 0.75 * bestScore
    # (reference KeyFrameDatabase::DetectRelocalizationCandidates,
    # src/KeyFrameDatabase.cc:731 minScoreToRetain) — with aliased
    # places the true candidate can sit below rank 3
    for rank in range(K):
        cand = int(order_np[rank])
        if float(scores_np[cand]) < 0.75 * best:
            break
        cand_ff = system.kf_features.get(cand)
        cand_kp_pt = system.kf_bindings.get(cand)
        if cand_ff is None or cand_kp_pt is None:
            continue
        mm = matching.match_nn(
            ff.desc, cand_ff.desc,
            mask=ff.valid[:, None] & cand_ff.valid[None, :] &
                 (cand_kp_pt >= 0)[None, :],
            max_dist=matching.TH_LOW, nn_ratio=0.75,
            angles_a=ff.angle, angles_b=cand_ff.angle, check_rotation=True)
        if int(jnp.sum(mm.valid)) < 15:
            continue
        P = m.pt_xyz.shape[0]
        pt_idx = jnp.clip(cand_kp_pt[jnp.maximum(mm.idx, 0)], 0, P - 1)
        X = m.pt_xyz[pt_idx]
        # culling/fusion may have invalidated a bound point since the
        # candidate KF was inserted — never solve against dead points
        match_ok = mm.valid & m.pt_valid[pt_idx]
        # the actual MLPnP algorithm (bearing-nullspace ML RANSAC +
        # GN, reference src/MLPnPsolver.cpp; params at
        # src/Tracking.cc:839) with the octave noise model as the
        # per-observation measurement covariance
        from ..geometry import mlpnp
        sf = system.cfg.orb.scale_factor ** jnp.clip(
            ff.octave, 0, system.cfg.orb.n_levels - 1).astype(jnp.float32)
        res = mlpnp.solve_mlpnp(
            X, ff.xy, match_ok, system.cfg.cam_model, system.cam_params,
            jax.random.PRNGKey(system.frame_id), iterations=300,
            min_inliers=min_inliers, inv_sigma2=1.0 / (sf * sf))
        if bool(res.success):
            return True, res.R, res.t
    return False, None, None
