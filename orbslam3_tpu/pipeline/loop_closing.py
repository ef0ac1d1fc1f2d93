"""Loop closing: detection, Sim3 computation, loop correction.

Parity target: upstream ORB-SLAM3 LoopClosing (deleted in the fork —
SURVEY §0 fork-delta 2 — but required by the build's north star):
  * candidate detection through the keyframe database with covisibility
    exclusion and temporal consistency (reference KeyFrameDatabase::
    DetectNBestCandidates, src/KeyFrameDatabase.cc:602; LoopClosing::
    DetectLoop consistency check, upstream);
  * Sim3 computation between the current KF and the loop KF from matched
    map points (reference Sim3Solver; ComputeSim3);
  * loop correction: essential-graph Sim3 optimization over all KFs with
    the loop edge, then map-point transport by each point's reference
    KF correction (reference LoopClosing::CorrectLoop +
    Optimizer::OptimizeEssentialGraph, src/Optimizer.cc:1848).

TPU design: detection is one TF-IDF matvec; Sim3 RANSAC is fully batched;
the pose graph solves densely on-device.  The host only sequences stages.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import sim3solver
from ..ops import lie, matching
from ..place import keyframe_db as kdb
from ..place import vocab as vocab_mod
from ..slam_map import state as mapstate
from ..solver import pose_graph
from ..utils.profiling import Verbose

_HI = jax.lax.Precision.HIGHEST


def build_essential_graph(m: mapstate.MapState, min_covis: int = 100,
                          n_covis_edges: int = 256):
    """Essential-graph edge set (reference OptimizeEssentialGraph,
    src/Optimizer.cc:1848-2179 + KeyFrame.h:86-101): spanning tree
    (each KF's strongest earlier covisible), the temporal chain, and all
    strong covisibility pairs (weight >= min_covis, reference th=100).

    Measurements are the CURRENT relative poses (drift-free odometry
    belief, s=1).  Returns fixed-capacity (ei, ej, eR, et, es, valid)
    with capacity 2K + n_covis_edges.
    """
    K = m.kf_R.shape[0]
    # covisibility W = A^T A (shared-point counts) from the maintained
    # incidence mask; chunked beyond the dense cutoff so pod-scale maps
    # never materialize an f32 (P, K) copy (VERDICT r3 weak #6)
    W = mapstate.covisibility_matrix(m)
    ids = jnp.arange(K)
    valid_pair = m.kf_valid[:, None] & m.kf_valid[None, :] & \
        (ids[:, None] != ids[None, :])
    W = jnp.where(valid_pair, W, -1.0)

    # spanning tree: parent = strongest earlier covisible
    before = ids[None, :] < ids[:, None]
    Wb = jnp.where(before, W, -1.0)
    parent = jnp.argmax(Wb, axis=1)
    tree_ok = (jnp.max(Wb, axis=1) > 0) & m.kf_valid & (ids > 0)

    # temporal chain (k, k-1)
    chain_ok = m.kf_valid & (ids > 0) & \
        m.kf_valid[jnp.maximum(ids - 1, 0)] & (ids < m.n_kf)

    # strong covisibility pairs, upper triangle, top-C by weight
    Wu = jnp.where(before, W, -1.0).reshape(-1)
    vals, flat = jax.lax.top_k(Wu, n_covis_edges)
    cv_i = flat // K
    cv_j = flat % K
    cv_ok = vals >= float(min_covis)

    # persistent loop/merge edges (reference KeyFrame::mspLoopEdges,
    # include/KeyFrame.h:86-101): every PAST closure's KF pair re-enters
    # every later essential graph.  Like the reference (Optimizer.cc
    # spanning-tree+loop-edge section), the measurement is the CURRENT
    # relative pose — the map was already corrected to satisfy the loop,
    # so the edge's job now is to keep the welded seam closed.
    K_c = jnp.maximum(K - 1, 0)
    li = jnp.clip(m.loop_i, 0, K_c)
    lj = jnp.clip(m.loop_j, 0, K_c)
    l_ok = m.loop_valid & (m.loop_i >= 0) & (m.loop_j >= 0) & \
        m.kf_valid[li] & m.kf_valid[lj]

    ei = jnp.concatenate([ids, ids, cv_i, li])
    ej = jnp.concatenate([jnp.maximum(ids - 1, 0), parent, cv_j, lj])
    evalid = jnp.concatenate([chain_ok, tree_ok, cv_ok, l_ok])
    # measurement S_ij = S_i . S_j^-1 from current poses (s=1)
    Ri, ti = m.kf_R[ei], m.kf_t[ei]
    Rj, tj = m.kf_R[ej], m.kf_t[ej]
    Rm = jnp.einsum("kij,klj->kil", Ri, Rj, precision=_HI)
    tm = ti - jnp.einsum("kij,kj->ki", Rm, tj, precision=_HI)
    es = jnp.ones(ei.shape[0], jnp.float32)
    return ei.astype(jnp.int32), ej.astype(jnp.int32), Rm, tm, es, evalid


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    # 65k words (r5): the pod-scale recall study (tools/
    # vocab_recall_curve.py, 1024 aliased places over FOUR texture
    # families, curve in BASELINE.md) shows 65536 words trained on all
    # four families hold recall@1 0.62 / recall@3 0.80 at a 1024-KF DB
    # where 32768 fall to 0.50/0.62 — the flat-codebook analogue of the
    # reference's 1M-leaf DBoW2 tree at MXU-friendly scale.  Per-KF BoW
    # assignment stays one (N,256)@(256,V) popcount matmul; DB memory is
    # (K,V) f32 = 64 MB at 256 KFs / 256 MB at pod capacity.
    n_words: int = 65536
    vocab: str = "trained"          # "trained" (data/vocab_*.npy) | "seed"
    min_common_words: int = 5
    consistency_needed: int = 3     # consecutive consistent detections
    min_sim3_matches: int = 20
    min_sim3_inliers: int = 20
    min_kf_gap: int = 12            # candidate must be this many KFs old
    pose_graph_iters: int = 20


class LoopCloser:
    """Host-side loop-closing module attached to a System."""

    def __init__(self, cfg: LoopConfig, n_kf_capacity: int):
        self.cfg = cfg
        self.codebook = jnp.asarray(vocab_mod.load_codebook(
            cfg.n_words, prefer_trained=(cfg.vocab == "trained")))
        self.db = kdb.KeyframeDB.create(n_kf_capacity, cfg.n_words)
        # consistency chains: list of ((K,) bool covis-group mask, count)
        # — reference LoopClosing::DetectLoop mvConsistentGroups.  Masks,
        # not sets: group intersection is one vectorized AND/any per
        # candidate, so the host-side cost stays O(K) words at pod scale
        self.consistent_groups: list[tuple[np.ndarray, int]] = []
        self.n_loops_closed = 0
        self._build_jits()

    def _build_jits(self):
        cb = self.codebook
        V = self.cfg.n_words

        @jax.jit
        def _bow(desc, valid):
            w = vocab_mod.assign_words(desc, cb)
            return vocab_mod.bow_vector(w, valid, V), w

        @jax.jit
        def _covis_row(m, kf_idx):
            return mapstate.covisibility_weights(m, kf_idx)

        @jax.jit
        def _detect(m, db, bow, kf_idx):
            """DetectNBestCandidates + the covisibility adjacency needed
            for group consistency, in one program (one host sync)."""
            K = m.kf_R.shape[0]
            W = mapstate.covisibility_matrix(m)
            ids = jnp.arange(K)
            covis = (W >= 15.0) & (ids[:, None] != ids[None, :]) & \
                m.kf_valid[:, None] & m.kf_valid[None, :]
            exclude = covis[kf_idx] | \
                (ids > kf_idx - self.cfg.min_kf_gap)
            cand, score = kdb.detect_candidates(
                db, bow, exclude, covis, n_best=3)
            return cand, score, covis

        self._bow = _bow
        self._covis_row = _covis_row
        self._detect_jit = _detect

    # ------------------------------------------------------------- keyframe
    def add_keyframe(self, m: mapstate.MapState, kf_idx: int, ff) -> None:
        bow, _ = self._bow(ff.desc, ff.valid)
        self.db = kdb.add(self.db, kf_idx, bow)

    # -------------------------------------------------------- online vocab
    def refine_vocab(self, kf_features: dict, iters: int = 4) -> None:
        """Online codebook refinement (the analogue of DBoW2's offline
        k-means training, done on the session's own imagery): k-majority
        refine the codebook over every stored keyframe's descriptors,
        then re-encode the database so stored BoW vectors and future
        queries live in the same refined word space.

        Call between sessions or at map-switch boundaries — the refit +
        re-encode is a map-sized operation, not a per-frame one."""
        if not kf_features:
            return
        import numpy as np_
        desc = jnp.asarray(np_.concatenate(
            [np_.asarray(f.desc) for f in kf_features.values()]))
        valid = jnp.asarray(np_.concatenate(
            [np_.asarray(f.valid) for f in kf_features.values()]))
        self.codebook = vocab_mod.kmeans_refine(
            self.codebook, desc, valid, iters=iters)
        self._build_jits()           # rebind the jits to the new anchors
        self.db = kdb.KeyframeDB.create(self.db.tf.shape[0],
                                        self.cfg.n_words)
        for k, f in kf_features.items():
            self.add_keyframe(None, k, f)
        self.consistent_groups = []

    # ------------------------------------------------------------ detection
    def detect(self, m: mapstate.MapState, kf_idx: int, ff) -> list:
        """Returns the list of consistency-accepted loop-candidate KF
        indices (best-scored first; empty when none).

        Candidates come from DetectNBestCandidates (covisibility-group
        accumulated TF-IDF scores — reference src/KeyFrameDatabase.cc:602);
        acceptance requires the reference's covisibility-consistency
        chains (LoopClosing::DetectLoop): a candidate's covis group must
        intersect a group detected at each of the last
        `consistency_needed` keyframes.  ALL accepted candidates are
        returned because the reference's ComputeSim3 then tries EACH of
        them geometrically (src/LoopClosing.cc mvpEnoughConsistent
        Candidates loop) — the top TF-IDF rank is not always the best
        geometric match (measured: a 65k-word vocabulary ranks a
        21-match candidate above a 45-match one on the stressed loop
        drive)."""
        bow, _ = self._bow(ff.desc, ff.valid)
        cand_idx, cand_score, covis = self._detect_jit(
            m, self.db, bow, jnp.asarray(kf_idx, jnp.int32))
        cand_np = np.asarray(cand_idx)
        covis_np = np.asarray(covis)
        accepted: list[int] = []
        new_groups: list[tuple[np.ndarray, int]] = []
        prev_masks = np.stack([g for g, _ in self.consistent_groups]) \
            if self.consistent_groups else None
        prev_counts = np.asarray([c for _, c in self.consistent_groups],
                                 np.int64)
        for cand in cand_np:
            cand = int(cand)
            if cand < 0:
                continue
            group = covis_np[cand].copy()
            group[cand] = True
            count = 0
            if prev_masks is not None:
                overlap = (prev_masks & group).any(axis=1)
                if overlap.any():
                    count = int(prev_counts[overlap].max()) + 1
            new_groups.append((group, count))
            # `count` IS the reference's nCurrentConsistency (prior count
            # + 1); acceptance is nCurrentConsistency >=
            # mnCovisibilityConsistencyTh (reference LoopClosing::
            # DetectLoop) — with the default 3 a loop needs 4 consecutive
            # consistent detections, exactly like upstream
            if count >= self.cfg.consistency_needed:
                accepted.append(cand)
        self.consistent_groups = new_groups
        return accepted

    # ------------------------------------------------------------- closure
    def try_close(self, system, ff, kf_idx: int) -> bool:
        """Full loop attempt for the just-inserted KF.  Mutates system.map
        on success.  Returns True if a loop was closed.

        EVERY consistency-accepted candidate is geometrically evaluated
        (descriptor matches + Sim3 RANSAC) and the one with the most
        Sim3 inliers wins — reference ComputeSim3 iterates over all
        enough-consistent candidates (src/LoopClosing.cc) rather than
        trusting the TF-IDF ranking."""
        m = system.map
        cands = self.detect(m, kf_idx, ff)
        self.add_keyframe(m, kf_idx, ff)
        if not cands:
            return False

        cur_kp_pt = system.kf_bindings.get(kf_idx)
        if cur_kp_pt is None:
            return False
        # fixed-scale Sim3 (i.e. SE3) when the map scale is observable:
        # IMU-initialized or stereo (reference mbFixScale at
        # LoopClosing construction, src/LoopClosing.cc:45 — true for
        # stereo/RGBD and IMU maps)
        fix_scale = bool(getattr(system, "imu_initialized", False)) or \
            system.cfg.stereo_bf > 0.0
        P = m.pt_xyz.shape[0]
        best = None          # (n_inliers, cand, res, n_matches)
        for cand in cands:
            # ---- 3D-3D correspondences: cur KF's matched map points vs
            # the candidate KF's map points, via descriptor matching
            cand_ff = system.kf_features.get(cand)
            cand_kp_pt = system.kf_bindings.get(cand)
            if cand_ff is None or cand_kp_pt is None:
                continue
            mm = matching.match_nn(
                ff.desc, cand_ff.desc,
                mask=(cur_kp_pt >= 0)[:, None] &
                     (cand_kp_pt >= 0)[None, :] &
                     ff.valid[:, None] & cand_ff.valid[None, :],
                max_dist=matching.TH_LOW, nn_ratio=0.75,
                angles_a=ff.angle, angles_b=cand_ff.angle,
                check_rotation=True)
            n_matches = int(jnp.sum(mm.valid))
            if n_matches < self.cfg.min_sim3_matches:
                continue
            j = jnp.maximum(mm.idx, 0)
            pt_cur = jnp.clip(cur_kp_pt, 0, P - 1)
            pt_cand = jnp.clip(cand_kp_pt[j], 0, P - 1)
            res_c = sim3solver.solve_sim3(
                m.pt_xyz[pt_cand], m.pt_xyz[pt_cur], mm.valid,
                cand_ff.xy[j],  # uv of each match in the candidate KF
                ff.xy,
                m.kf_R[cand], m.kf_t[cand], m.kf_R[kf_idx],
                m.kf_t[kf_idx],
                system.cfg.cam_model, system.cam_params,
                jax.random.PRNGKey(kf_idx),
                min_inliers=self.cfg.min_sim3_inliers,
                fix_scale=fix_scale)
            if not bool(res_c.success):
                continue
            n_inl = int(res_c.n_inliers)
            if best is None or n_inl > best[0]:
                best = (n_inl, cand, res_c, n_matches)
        if best is None:
            return False
        _, cand, res, n_matches = best

        # solve_sim3(X_cand, X_cur) maps cur-camera coords INTO the loop
        # KF's camera; the correction pipeline wants loop -> cur: invert.
        R_lc, t_lc, s_lc = lie.sim3_inverse(res.R12, res.t12, res.s12)
        res = res._replace(R12=R_lc, t12=t_lc, s12=s_lc)
        self._correct_loop(system, kf_idx, cand, res)
        # persist the loop edge AFTER correction (reference
        # KeyFrame::AddLoopEdge in CorrectLoop): every later essential
        # graph re-includes this pair, so a second closure cannot forget
        # the first seam
        system.map = mapstate.add_loop_edge(
            system.map, kf_idx, cand, res.R12, res.t12, res.s12)
        # full-map GBA after the closure, as a pending device chain the
        # tracker absorbs when ready (reference
        # LoopClosing::RunGlobalBundleAdjustment detached thread)
        system._schedule_gba(kf_idx)
        self.n_loops_closed += 1
        self.consistent_groups = []
        Verbose.print(f"[loop] closed: KF {kf_idx} <-> KF {cand} "
                      f"({n_matches} matches)", Verbose.NORMAL)
        return True

    # ------------------------------------------------------------ correction
    def _correct_loop(self, system, kf_cur: int, kf_loop: int,
                      sim3: sim3solver.Sim3Result):
        """Essential-graph optimization + point transport."""
        # exact covisibility for the graph: the maintained pt_kf_mask
        # over-approximates when fusion invalidates individual
        # observations while both endpoints stay alive (reference
        # UpdateConnections lag); one O(n_obs) scatter is cheap here
        # relative to the closure's GBA, so refresh it
        system.map = mapstate.rebuild_incidence(system.map)
        m = system.map
        K = m.kf_R.shape[0]
        nk = int(m.n_kf)

        # vertices: S_iw = current camera poses with s=1
        Rv, tv = m.kf_R, m.kf_t
        sv = jnp.ones(K)

        # edges: essential graph (temporal chain + spanning tree + strong
        # covisibility pairs, reference src/Optimizer.cc:1848-2179) + the
        # measured loop edge cur <-> loop.  No ad-hoc edge weighting: the
        # covisibility structure distributes the correction.
        ei, ej, eR, et, es, evalid = build_essential_graph(m)
        # loop edge: measured S_cur_loop — sim3 maps loop-KF camera coords
        # into cur-KF camera coords: x_cur = s R x_loop + t, so
        # S_cur_w = S_measured ∘ S_loop_w  =>  edge (cur, loop) with
        # measurement S_cl = S_cur S_loop^-1 = sim3 measured.
        ei = jnp.concatenate([ei, jnp.asarray([kf_cur], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.asarray([kf_loop], jnp.int32)])
        eR = jnp.concatenate([eR, sim3.R12[None]])
        et = jnp.concatenate([et, sim3.t12[None]])
        es = jnp.concatenate([es, sim3.s12[None]])
        evalid = jnp.concatenate([evalid, jnp.asarray([True])])
        weights = jnp.ones(ei.shape[0], jnp.float32)

        # pre-correct the current KF vertex: S_cur := S_meas ∘ S_loop
        # (reference CorrectLoop rigidly corrects the current window first)
        Rcorr, tcorr, scorr = lie.sim3_compose(
            sim3.R12, sim3.t12, sim3.s12,
            Rv[kf_loop], tv[kf_loop], jnp.asarray(1.0))
        Rv = Rv.at[kf_cur].set(Rcorr)
        tv = tv.at[kf_cur].set(tcorr)
        sv = sv.at[kf_cur].set(scorr)

        fixed = jnp.zeros(K, bool).at[kf_loop].set(True).at[0].set(True)
        # inertial maps: gauge-constrained graph — the IMU has fixed
        # scale and gravity, so the correction must stay in yaw +
        # translation (reference OptimizeEssentialGraph4DoF via
        # VertexPose4DoF/Edge4DoF, include/G2oTypes.h:155,816); a free
        # Sim3 graph would rescale the metric map and tilt gravity
        inertial = bool(getattr(system, "imu_initialized", False))
        dof = jnp.asarray(pose_graph.DOF4_MASK, jnp.float32) \
            if inertial else None
        res = pose_graph.optimize_pose_graph(
            Rv, tv, sv, fixed=fixed,
            valid=m.kf_valid,
            e_i=ei, e_j=ej, e_R=eR, e_t=et, e_s=es,
            e_valid=evalid,
            e_weight=weights,
            iterations=self.cfg.pose_graph_iters,
            dof_mask=dof)

        # transport points by their reference KF's correction:
        # X' = S_new_i^-1 ( S_old_i (X) )   (reference CorrectLoop)
        ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
        R_old, t_old = m.kf_R[ref], m.kf_t[ref]
        Xc = lie.se3_apply(R_old, t_old, m.pt_xyz)      # old camera coords
        R_new, t_new, s_new = res.R[ref], res.t[ref], res.s[ref]
        # invert sim3 per point ref
        Rn_i, tn_i, sn_i = lie.sim3_inverse(R_new, t_new, s_new)
        X_new = lie.sim3_apply(Rn_i, tn_i, sn_i, Xc)
        pt_scale = 1.0 / jnp.maximum(s_new, 1e-9)

        # transport world-frame velocities by each KF's own world
        # correction A_k = S_new_k^-1 ∘ S_old_k (linear part
        # (1/s_k) R_new_k^T R_old_k; biases are frame-invariant and stay
        # — reference CorrectLoop rotates Vw by the KF correction,
        # src/LoopClosing.cc corrected-Sim3 block).  With the 4-DoF
        # inertial graph s_k = 1, so the metric speed is preserved.
        R_a_kf = jnp.einsum("kji,kjl->kil", res.R, m.kf_R,
                            precision=_HI)   # R_new^T R_old
        vel_new = jnp.einsum("kij,kj->ki", R_a_kf, m.kf_vel,
                             precision=_HI) / \
            jnp.maximum(res.s, 1e-9)[:, None]

        # write back: poses become SE3 with translation t/s (standard
        # Sim3 -> SE3 conversion: [R, t/s])
        system.map = m._replace(
            kf_R=res.R,
            kf_t=res.t / jnp.maximum(res.s, 1e-9)[:, None],
            kf_vel=vel_new,
            pt_xyz=X_new,
            pt_min_dist=m.pt_min_dist * pt_scale,
            pt_max_dist=m.pt_max_dist * pt_scale)
        # correct the already-recorded per-frame trajectory segment-wise:
        # each frame is anchored to the last KF at-or-before its timestamp;
        # apply that KF's world correction A_k = S_new_k^-1 . S_old_k
        # (the reference exports trajectories relative to corrected
        # reference KFs — Tracking::mlRelativeFramePoses; without this the
        # export mixes drifted pre-loop frame poses with the corrected map)
        if system.trajectory:
            kf_ts = np.asarray(m.kf_ts[:nk])
            R_old_n = np.asarray(m.kf_R[:nk])
            t_old_n = np.asarray(m.kf_t[:nk])
            Rn_all = np.asarray(res.R[:nk])
            tn_all = np.asarray(res.t[:nk])
            sn_all = np.asarray(res.s[:nk])
            traj_ts = np.asarray([e[0] for e in system.trajectory])
            seg = np.clip(np.searchsorted(kf_ts, traj_ts, side="right") - 1,
                          0, nk - 1)
            # A = S_new_k^-1 . S_old_k   (both world->camera_k Sim3s;
            # S_old has s=1, so A = (R_a, t_a, s_a=1/s_new)) — one
            # batched einsum over all frames, not a per-frame Python loop
            s_a = 1.0 / np.maximum(sn_all[seg], 1e-9)          # (F,)
            R_inv = np.transpose(Rn_all[seg], (0, 2, 1))       # (F,3,3)
            t_inv = -s_a[:, None] * np.einsum("fij,fj->fi",
                                              R_inv, tn_all[seg])
            R_a = np.einsum("fij,fjk->fik", R_inv, R_old_n[seg])
            t_a = s_a[:, None] * np.einsum("fij,fj->fi",
                                           R_inv, t_old_n[seg]) + t_inv
            Rwc_all = np.stack([e[1] for e in system.trajectory])
            twc_all = np.stack([e[2] for e in system.trajectory])
            R_new_traj = np.einsum("fij,fjk->fik", R_a, Rwc_all)
            t_new_traj = s_a[:, None] * np.einsum("fij,fj->fi",
                                                  R_a, twc_all) + t_a
            system.trajectory = [
                (ts_, R_new_traj[i], t_new_traj[i])
                for i, (ts_, _, _) in enumerate(system.trajectory)]
        # the GNSS georeference window holds pre-correction SLAM
        # positions; per-KF corrections are non-uniform, so the window
        # restarts (re-fills within min_kfs keyframes)
        if getattr(system, "georef", None) is not None:
            system.georef._slam.clear()
            system.georef._gnss.clear()
        # tracker state refresh
        system.R_cur = system.map.kf_R[kf_cur]
        system.t_cur = system.map.kf_t[kf_cur]
        system.R_prev, system.t_prev = system.R_cur, system.t_cur
        system.has_velocity = False
        if hasattr(system, "frame_prior"):   # inertial tracker state
            # the VIO prior is expressed in the pre-correction world
            system.frame_prior = None
            system._map_updated = True
            system.vel = system.map.kf_vel[kf_cur]
            system.last_body = system._cam_to_body(
                system.R_cur, system.t_cur)
