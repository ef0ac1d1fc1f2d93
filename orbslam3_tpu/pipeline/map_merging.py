"""Cross-session map merging (multi-session Atlas).

Parity target: upstream ORB-SLAM3's map-merge path (dead code in the
fork): when place recognition in the CURRENT map hits a keyframe of an
ARCHIVED map, compute the Sim3 between the two maps from matched map
points (Sim3Solver), weld the current map into the old map's frame
(Atlas merge + welding BA), and continue tracking in the merged map.

Host orchestration over the batched kernels in geometry/sim3solver and
slam_map/atlas; the welding BA is the standard local BA over the merged
region on the next keyframe insertions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sim3solver
from ..ops import lie, matching
from ..place import keyframe_db as kdb
from ..slam_map import atlas as atlas_mod


def try_merge(system, ff, kf_idx: int, min_matches: int = 25,
              min_inliers: int = 20) -> bool:
    """Attempt to weld the current map into an archived session.

    Called at keyframe insertion when archived sessions exist.  On
    success the merged map replaces system.map (old session's frame is
    authoritative) and the archived session is consumed.
    """
    lc = system.loop_closer
    if lc is None or not system.atlas.sessions:
        return False
    bow, _ = lc._bow(ff.desc, ff.valid)

    for si, sess in enumerate(system.atlas.sessions):
        db = getattr(sess, "db", None)
        if db is None:
            continue
        scores, common = kdb.query(db, bow)
        cand = int(jnp.argmax(scores))
        if float(scores[cand]) <= 0:
            continue
        cand_ff = sess.kf_features.get(cand)
        cand_kp_pt = sess.kf_bindings.get(cand)
        if cand_ff is None or cand_kp_pt is None:
            continue
        cur_kp_pt = system.kf_bindings.get(kf_idx)
        mm = matching.match_nn(
            ff.desc, cand_ff.desc,
            mask=(cur_kp_pt >= 0)[:, None] & (cand_kp_pt >= 0)[None, :] &
                 ff.valid[:, None] & cand_ff.valid[None, :],
            max_dist=matching.TH_LOW, nn_ratio=0.75,
            angles_a=ff.angle, angles_b=cand_ff.angle, check_rotation=True)
        if int(jnp.sum(mm.valid)) < min_matches:
            continue

        m_old, m_cur = sess.map, system.map
        P_old = m_old.pt_xyz.shape[0]
        P_cur = m_cur.pt_xyz.shape[0]
        j = jnp.maximum(mm.idx, 0)
        pt_cur = jnp.clip(cur_kp_pt, 0, P_cur - 1)
        pt_old = jnp.clip(cand_kp_pt[j], 0, P_old - 1)
        # welding an IMU-initialized (metric) or stereo map must be
        # rigid: a free scale would break the preintegrated factors'
        # metric ΔP/ΔV (reference MergeLocal2 / mbFixScale)
        fix_scale = bool(getattr(system, "imu_initialized", False)) or \
            system.cfg.stereo_bf > 0.0
        res = sim3solver.solve_sim3(
            m_old.pt_xyz[pt_old], m_cur.pt_xyz[pt_cur], mm.valid,
            cand_ff.xy[j], ff.xy,
            m_old.kf_R[cand], m_old.kf_t[cand],
            m_cur.kf_R[kf_idx], m_cur.kf_t[kf_idx],
            system.cfg.cam_model, system.cam_params,
            jax.random.PRNGKey(1000 + kf_idx), min_inliers=min_inliers,
            fix_scale=fix_scale)
        if not bool(res.success):
            continue

        # camera-frame Sim3 (cur cam -> old cam) to world Sim3
        # (cur world -> old world):  S_w = T_oldcam->oldworld ∘ S ∘
        # T_curworld->curcam
        R1i, t1i, s1i = lie.sim3_inverse(
            m_old.kf_R[cand], m_old.kf_t[cand], jnp.asarray(1.0))
        Rw, tw, sw = lie.sim3_compose(R1i, t1i, s1i,
                                      res.R12, res.t12, res.s12)
        Rw, tw, sw = lie.sim3_compose(
            Rw, tw, sw, m_cur.kf_R[kf_idx], m_cur.kf_t[kf_idx],
            jnp.asarray(1.0))

        merged, kf_off, pt_off = atlas_mod.merge_maps(
            m_old, m_cur, Rw, tw, sw, system.cfg.map_capacity)
        if merged is None:
            return False

        # swap in the merged map; remap host-side dictionaries
        new_features = dict(sess.kf_features)
        new_bindings = dict(sess.kf_bindings)
        new_ur = dict(sess.kf_ur) if sess.kf_ur else {}
        for k, v in system.kf_features.items():
            new_features[k + kf_off] = v
        for k, b in system.kf_bindings.items():
            new_bindings[k + kf_off] = jnp.where(b >= 0, b + pt_off, -1)
        for k, u in system.kf_ur.items():
            new_ur[k + kf_off] = u
        system.map = merged
        system.n_kf_host = int(merged.n_kf)   # resync the host mirror
        system.kf_features = new_features
        system.kf_bindings = new_bindings
        system.kf_ur = new_ur
        # rebuild the device feature bank over the merged keyframe set;
        # stereo right-u rows come from the host kf_ur mirror so the
        # bank-sourced BAs keep their metric stereo residuals across the
        # merge (reference welding BA keeps stereo edges,
        # src/Optimizer.cc:3156-3446)
        if system.bank is not None:
            from ..slam_map import feature_bank as fbank
            system.bank = fbank.empty_bank(system.bank.xy.shape[0],
                                           system.bank.xy.shape[1])
            for k, f in new_features.items():
                b = new_bindings.get(k)
                if b is not None and f.capacity == system.bank.xy.shape[1]:
                    system.bank = fbank.set_frame(system.bank, k, f, b,
                                                  ur=new_ur.get(k))
        system.last_kf_idx = kf_idx + kf_off
        # keyframe indices of the current session shifted by kf_off:
        # remap the inertial preintegration chain and the GNSS anchors
        if hasattr(system, "preint_kf_pairs"):
            system.preint_kf_pairs = [(a + kf_off, b + kf_off)
                                      for a, b in system.preint_kf_pairs]
        if system.kf_gnss:
            system.kf_gnss = {k + kf_off: v
                              for k, v in system.kf_gnss.items()}
        if system.georef is not None:
            # the SLAM->geo Sim3 was estimated in the pre-merge world
            # frame; the sliding window re-estimates from scratch
            system.georef._slam.clear()
            system.georef._gnss.clear()
            system.georef.transform = None
        # immediate welding BA over the seam (reference
        # Optimizer::LocalBundleAdjustment welding variant,
        # src/Optimizer.cc:3156-3446): covisibility window centered at
        # the weld keyframe, spanning both sides through the fused
        # observations
        system.map = system._local_ba(
            system.map, jnp.asarray(system.last_kf_idx, jnp.int32))
        # persist the weld as a merge edge (reference KeyFrame merge edges,
        # include/KeyFrame.h:86-101): every later essential graph keeps
        # the two sessions pinned together through this pair
        from ..slam_map import state as mapstate
        system.map = mapstate.add_loop_edge(
            system.map, system.last_kf_idx, cand,
            res.R12, res.t12, res.s12)
        # current camera pose: read from the merged (transformed) map
        ki = system.last_kf_idx
        system.R_cur = system.map.kf_R[ki]
        system.t_cur = system.map.kf_t[ki]
        system.R_prev, system.t_prev = system.R_cur, system.t_cur
        system.has_velocity = False
        if hasattr(system, "frame_prior"):   # inertial tracker state
            system.frame_prior = None
            system._map_updated = True
            # velocity was transported with the map (transform_map);
            # mirror it into the tracker (biases are frame-invariant)
            system.vel = system.map.kf_vel[ki]
            system.last_body = system._cam_to_body(
                system.R_cur, system.t_cur)
        # merge trajectories: archived first, then current transformed
        Rw_np, sw_np = np.asarray(Rw), float(sw)
        cur_traj = [(ts_, Rw_np @ Rwc_, sw_np * (Rw_np @ twc_) +
                     np.asarray(tw))
                    for ts_, Rwc_, twc_ in system.trajectory]
        system.trajectory = list(sess.trajectory) + cur_traj
        # rebuild the place-recognition DB over the merged keyframes
        lc.db = kdb.KeyframeDB.create(system.cfg.map_capacity.n_kf,
                                      lc.cfg.n_words)
        for k, f in new_features.items():
            lc.add_keyframe(system.map, k, f)
        system.atlas.sessions.pop(si)
        return True
    return False
