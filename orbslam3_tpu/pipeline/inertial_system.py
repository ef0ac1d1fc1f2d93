"""Monocular-inertial SLAM system.

Parity targets:
  * IMU queue + per-frame preintegration with boundary handling
    (reference Tracking::GrabImuData / PreintegrateIMU,
    src/Tracking.cc:176-290 — two parallel integrations: since last KF
    and since last frame);
  * pose prediction from IMU after initialization
    (Tracking::PredictStateIMU, src/Tracking.cc:293-350);
  * staged IMU initialization (LocalMapping::InitializeIMU,
    src/LocalMapping.cc:1080): after `init_time_s` of keyframes, run the
    inertial-only optimizer, reject scale < 0.1, re-anchor every pose/
    point/velocity with the recovered Sim3(gravity, scale)
    (Map::UpdateKFsAndMapCoordianteFrames, src/Map.cc:253), then a
    visual-inertial full BA (FullInertialBA);
  * post-init: keyframe velocities/biases live in the map state and the
    local BA becomes visual-inertial over the temporal window
    (LocalInertialBA semantics).

Body/camera: camera pose Tcw is the map's native pose;
Tbc (body <- camera) is the fixed extrinsic; body pose used by IMU terms
is Twb = (Tbc Tcw)^-1.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import imu as imu_ops
from ..ops import lie
from ..slam_map import state as mapstate
from ..solver import inertial as inertial_solver
from ..solver import vi_ba as vi_ba_solver
from . import mapping, system as base

_HI = jax.lax.Precision.HIGHEST


def reference_imu_steps(take, t0: float, t1: float, nxt=None):
    """Integration-step schedule of reference Tracking::PreintegrateIMU
    (src/Tracking.cc:243-283): midpoint-rule measurement values with
    linear interpolation at the interval endpoints.

    `take`: samples (t, gyro, acc) with t0 < t <= t1 (time-sorted).
    `nxt`: the first sample beyond t1 if available (NOT consumed — the
    reference peeks it to interpolate the final step; without it the last
    segment extrapolates linearly, still 2nd-order vs the old
    zero-order-hold stretch).

    Returns (acc (n,3), gyr (n,3), dts (n,)) numpy float32, or None when
    there are no samples.  sum(dts) == t1 - t0 exactly; for a signal
    piecewise-linear between samples every step integrates exactly.
    """
    pts = list(take) + ([nxt] if nxt is not None else [])
    n = len(pts) - 1
    if n < 0:
        return None
    if n == 0:
        # single sample covers the whole interval (reference i==0==n-1)
        t, g, a = pts[0]
        return (np.asarray([a], np.float32).reshape(1, 3),
                np.asarray([g], np.float32).reshape(1, 3),
                np.asarray([max(t1 - t0, 0.0)], np.float32))
    acc = np.zeros((n, 3), np.float32)
    gyr = np.zeros((n, 3), np.float32)
    dts = np.zeros(n, np.float32)
    for i in range(n):
        ti, gi, ai = pts[i]
        tj, gj, aj = pts[i + 1]
        tab = max(tj - ti, 1e-9)
        if i == 0 and i < n - 1:
            w = (ti - t0) / tab
            a = 0.5 * (ai + aj - (aj - ai) * w)
            g = 0.5 * (gi + gj - (gj - gi) * w)
            dt = tj - t0
        elif i < n - 1:
            a = 0.5 * (ai + aj)
            g = 0.5 * (gi + gj)
            dt = tab
        elif i > 0:
            w = (tj - t1) / tab
            a = 0.5 * (ai + aj - (aj - ai) * w)
            g = 0.5 * (gi + gj - (gj - gi) * w)
            dt = t1 - ti
        else:   # i == 0 == n-1: two samples
            a, g = ai, gi
            dt = t1 - t0
        acc[i] = a
        gyr[i] = g
        dts[i] = max(dt, 0.0)
    return acc, gyr, dts


def pack_imu_rows(steps, cap: int) -> np.ndarray:
    """Marshal integration steps (acc (n,3), gyr (n,3), dts (n,)) into
    the fused tracked-frame program's packed row layout
    [acc(3) gyr(3) dt ok], truncated/padded to `cap` rows.  The ONE
    place the layout lives — _interval_rows, _since_kf_rows and the
    bench's staging all consume it."""
    acc, gyr, dts = steps
    n = min(acc.shape[0], cap)
    packed = np.zeros((cap, 8), np.float32)
    packed[:n, 0:3], packed[:n, 3:6], packed[:n, 6] = \
        acc[:n], gyr[:n], dts[:n]
    packed[:n, 7] = 1.0
    return packed


@dataclasses.dataclass(frozen=True)
class InertialConfig:
    imu_freq: float = 200.0
    noise_gyro: float = 1.7e-4
    noise_acc: float = 2e-3
    walk_gyro: float = 1.9e-5
    walk_acc: float = 3e-3
    Tbc: tuple = ()              # 4x4 row-major; empty = identity
    init_time_s: float = 2.0     # KF time before inertial init
    init_min_kfs: int = 6
    refine_time_s: float = 5.0   # second FIBA stage (VIBA1)
    refine2_time_s: float = 15.0  # third stage (VIBA2, LocalMapping.cc:242)
    max_imu_per_frame: int = 64  # preintegration buffer capacity
    # KF-interval / since-KF preintegration buffer = max_imu_per_frame *
    # preint_buf_factor rows.  The scan is SEQUENTIAL on device (~25 us
    # per 1000 masked rows... measured 25.9 ms at the old 16x=1024 cap),
    # so oversizing it is pure latency; 8x = 512 samples = 2.56 s at
    # 200 Hz covers any sane KF gap, and the raw KF-factor replay path
    # (_preint_raw) still grows by doubling beyond it
    preint_buf_factor: int = 8
    max_factors: int = 256       # KF-to-KF preintegration capacity
    vi_window_factors: int = 12  # factors in the VI local BA window
    vi_ba_iters: int = 8
    # Full-map FullInertialBA after the inertial-only init / VIBA1 stages
    # (reference bFIBA, src/LocalMapping.cc:1201-1210)
    fiba: bool = True
    fiba_iters: int = 12
    # KF capacity of the FIBA gather.  FIBA only fires at the IMU-init
    # stages (init ~2 s and VIBA1 ~5 s — reference LocalMapping.cc:
    # 1201-1210 likewise calls FullInertialBA only from InitializeIMU),
    # i.e. on maps of <= ~30 KFs at any realistic KF cadence; 64 is >2x
    # headroom, and a temporal window of the NEWEST 64 KFs is the right
    # truncation if a caller ever re-triggers init on a long map.  Full-
    # map optimization at capacity is the visual GBA's job
    # (SlamConfig.post_loop_gba, measured 1.02 s at 256 KF/24.5k pts).
    fiba_cams: int = 64
    # Per-frame visual-inertial pose optimization in the tracker
    # (PoseInertialOptimizationLastFrame/LastKeyFrame with the
    # marginalized ConstraintPoseImu prior chain)
    use_vi_pose_opt: bool = True
    # bad-IMU failsafe (reference src/LocalMapping.cc:122-126 +
    # src/Tracking.cc:368-373): if the inertial init/refine stages never
    # converge within this much elapsed keyframe time, force a map reset
    # (a degenerate init — e.g. motion with no acceleration — must not
    # persist).  Node config uses 500 s (mono_inertial_node.cpp:160).
    reset_time_thresh: float = 500.0


class VITrackOut(NamedTuple):
    """Device-side outputs of the fused inertial tracked-frame program.
    Everything the host loop needs to continue — poses, body state,
    carried prior, IMU prediction (for the loss path) — stays on device;
    only `stats` is pulled back (ONE sync per tracked frame)."""
    R_tr: jnp.ndarray      # track-result camera pose (pre-VI-refinement)
    t_tr: jnp.ndarray
    kp_pt: jnp.ndarray     # keypoint -> map point bindings
    R_cur: jnp.ndarray     # final camera pose (VI-refined when accepted)
    t_cur: jnp.ndarray
    Rwb: jnp.ndarray       # final body state
    pwb: jnp.ndarray
    vel: jnp.ndarray
    prior: object          # VIPosePrior (next frame's ConstraintPoseImu)
    Rg: jnp.ndarray        # IMU-predicted camera pose guess (loss path)
    tg: jnp.ndarray
    R_pred: jnp.ndarray    # IMU-predicted body state (loss path)
    p_pred: jnp.ndarray
    v_pred: jnp.ndarray
    stats: jnp.ndarray     # i32[4]: [n_inl, vi_ok, n_vi_inl, n_inl_try1]


class InertialSystem(base.System):
    # stereo subclasses set True: scale is already metric, the inertial
    # init then solves only gravity/bias/velocities (reference passes
    # bFixedScale for stereo-inertial, src/Optimizer.cc:2964)
    imu_fix_scale = False

    def __init__(self, config: base.SlamConfig, icfg: InertialConfig):
        super().__init__(config)
        self.icfg = icfg
        # the VI chain couples tracking to the KF optimization (the
        # LastKeyFrame factor reads post-BA velocities/biases), so KF
        # mapping work stays on the synchronous path
        self._async_ok = False
        if icfg.Tbc:
            Tbc = np.asarray(icfg.Tbc, np.float64).reshape(4, 4)
        else:
            Tbc = np.eye(4)
        # Tbc: body <- camera (x_b = Rbc x_c + tbc); Tcb is its inverse
        self.Rbc = jnp.asarray(Tbc[:3, :3], jnp.float32)
        self.tbc_vec = jnp.asarray(Tbc[:3, 3], jnp.float32)
        self.Rcb = self.Rbc.T
        self.tcb = -self.Rbc.T @ self.tbc_vec
        self.calib = imu_ops.ImuCalib.create(
            icfg.noise_gyro, icfg.noise_acc, icfg.walk_gyro, icfg.walk_acc,
            icfg.imu_freq, Tbc_R=Tbc[:3, :3], Tbc_t=Tbc[:3, 3])
        # IMU state
        self.imu_queue: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.kf_imu_buffer: list = []    # samples since last KF
        self.last_frame_ts: Optional[float] = None
        self.imu_initialized = False
        self.viba1_done = False
        self.viba2_done = False
        self.bias = jnp.zeros(6)
        self.vel = jnp.zeros(3)          # body velocity, world frame
        self.last_body = None            # (Rwb, pwb) of previous frame
        self.preints: list = []          # per KF-interval Preintegrated
        self.preint_kf_pairs: list[tuple[int, int]] = []
        # raw (acc, gyr, dts) numpy per factor — kept for Reintegrate-on-
        # bias-change and MergePrevious-on-culling (reference
        # src/ImuTypes.cc:170,239 keep mvMeasurements for the same reason)
        self.preint_raw: list = []
        self.kf_time0 = None
        # frame-to-frame VIO prior chain (ConstraintPoseImu / mpcpi)
        self.frame_prior = None
        self._frame_rows = None   # packed IMU rows for the current frame
        self._map_updated = True
        self._build_inertial_jits()

    def _build_inertial_jits(self):
        cal = self.calib
        cfg = self.cfg
        icfg = self.icfg

        def make_vi_ba(window: int, cams: int, pts: int, obs: int,
                       iters: int, pcg: int = 16, schur: str = "dense"):
            """Factory for jitted VI-BA programs over a temporal window.

            window=local_ba_window -> LocalInertialBA parity (reference
            src/Optimizer.cc:2448); window=map capacity -> FullInertialBA
            at the IMU-init stages (reference src/Optimizer.cc:371-762 via
            LocalMapping.cc:1201-1210)."""

            @jax.jit
            def _vi_ba(m, center_kf, f: inertial_solver.PreintFactor,
                       bank):
                # per-KF slab gather ONLY (VERDICT r3 weak #4): the COO
                # fallback paid ~13 ms of map-sized gather/scatter fixed
                # cost per BA at 196k-obs capacity; every caller runs
                # after the first KF insert, when the bank exists
                prob_v, cam_sel, cam_ok, pt_sel, pt_ok = \
                    mapping.gather_window_problem_bank(
                        m, bank, center_kf, window, cfg.orb.n_levels,
                        cfg.orb.scale_factor, cap_cams=cams,
                        cap_pts=pts, cap_obs=obs,
                        window_mode="temporal", min_anchors=1)
                K = m.kf_R.shape[0]
                cam_inv = jnp.full(K, -1, jnp.int32).at[
                    jnp.where(cam_ok, cam_sel, K)].set(
                    jnp.arange(cam_sel.shape[0], dtype=jnp.int32),
                    mode="drop")
                # remap factors into the compacted camera indexing
                fi = cam_inv[jnp.clip(f.kf_i, 0, K - 1)]
                fj = cam_inv[jnp.clip(f.kf_j, 0, K - 1)]
                f2 = f._replace(
                    kf_i=jnp.maximum(fi, 0), kf_j=jnp.maximum(fj, 0),
                    valid=f.valid & (fi >= 0) & (fj >= 0))
                # body states of the selected cameras
                Rbw = jnp.einsum("ij,kjl->kil", self.Rbc, prob_v.R,
                                 precision=_HI)
                tbw = jnp.einsum("ij,kj->ki", self.Rbc, prob_v.t,
                                 precision=_HI) + self._tbc
                Rwb = jnp.swapaxes(Rbw, 1, 2)
                pwb = -jnp.einsum("kij,kj->ki", Rwb, tbw, precision=_HI)
                prob = vi_ba_solver.VIProblem(
                    Rwb=Rwb, pwb=pwb,
                    vel=m.kf_vel[cam_sel], bias=m.kf_bias[cam_sel],
                    cam_fixed=prob_v.cam_fixed, cam_valid=prob_v.cam_valid,
                    X=prob_v.X, pt_valid=prob_v.pt_valid,
                    obs_cam=prob_v.obs_cam, obs_pt=prob_v.obs_pt,
                    obs_uv=prob_v.obs_uv,
                    obs_inv_sigma2=prob_v.obs_inv_sigma2,
                    obs_valid=prob_v.obs_valid,
                    factors=f2, gravity=imu_ops.GRAVITY,
                    Rcb=self.Rcb, tcb=self.tcb)
                res = vi_ba_solver.vi_bundle_adjust(
                    prob, cfg.cam_model, self.cam_params,
                    iterations=iters, lam0=1.0, pcg_iters=pcg,
                    schur=schur)
                # convert optimized body poses back to camera poses
                Rbw2 = jnp.swapaxes(res.Rwb, 1, 2)
                tbw2 = -jnp.einsum("kij,kj->ki", Rbw2, res.pwb,
                                   precision=_HI)
                Rcw2 = jnp.einsum("ij,kjl->kil", self.Rcb, Rbw2,
                                  precision=_HI)
                tcw2 = jnp.einsum("ij,kj->ki", self.Rcb, tbw2,
                                  precision=_HI) + self.tcb
                # scatter back
                free = cam_ok & ~prob_v.cam_fixed
                dstc = jnp.where(free, cam_sel, K)
                kf_R = m.kf_R.at[dstc].set(Rcw2, mode="drop")
                kf_t = m.kf_t.at[dstc].set(tcw2, mode="drop")
                kf_vel = m.kf_vel.at[dstc].set(res.vel, mode="drop")
                kf_bias = m.kf_bias.at[dstc].set(res.bias, mode="drop")
                P = m.pt_xyz.shape[0]
                dstp = jnp.where(pt_ok, pt_sel, P)
                pt_xyz = m.pt_xyz.at[dstp].set(res.X, mode="drop")
                return m._replace(kf_R=kf_R, kf_t=kf_t, kf_vel=kf_vel,
                                  kf_bias=kf_bias, pt_xyz=pt_xyz)

            return _vi_ba

        cams, pts, obs = cfg.ba_caps
        # window-sized problems take the DENSE reduced solve: one-matmul
        # PCG matvecs instead of a ~15-kernel matrix-free chain per step
        # (same lesson as the visual grid solver), and since each step is
        # one matmul a deep PCG is nearly free — keep the solve as
        # converged as the old 48-step matrix-free schedule
        self._vi_local_ba = make_vi_ba(cfg.local_ba_window, cams, pts, obs,
                                       icfg.vi_ba_iters, pcg=32)
        self._vi_full_ba = make_vi_ba(cfg.map_capacity.n_kf,
                                      icfg.fiba_cams, pts, obs,
                                      icfg.fiba_iters, pcg=48)

        # KF-interval preintegration at the large buffer capacity
        # (max_imu_per_frame * preint_buf_factor; KF intervals span many
        # frames).  Also reused by Reintegrate and MergePrevious.
        @jax.jit
        def _preint_kf(acc, gyro, dt, mask, bias):
            return imu_ops.preintegrate(acc, gyro, dt, mask, cal, bias)

        self._preint_kf = _preint_kf

        from ..solver import vi_pose_opt as vpo
        from . import tracking as tracking_mod
        capF = icfg.max_imu_per_frame
        capK = icfg.max_imu_per_frame * icfg.preint_buf_factor

        @jax.jit
        def _vi_track_step(m, view, ff, packed, prior, sc,
                           Rwb, pwb, vel, bias):
            """The ENTIRE inertial tracked frame as ONE device program.

            r4 measured (drive_kf_times, BASELINE.md): the inertial
            tracked frame cost 486.9 ms wall vs 79.7 visual through the
            ~70 ms-RTT tunnel — ~6 extra host<->device syncs per frame
            (inlier-count retry gate, VI-opt admission gates, preint
            factor staging).  This program fuses frame preintegration,
            IMU state prediction (Tracking::PredictStateIMU,
            src/Tracking.cc:293-350), local-map tracking with the
            weak-match doubled-radius retry as a lax.cond, and the
            visual-inertial pose optimization (LastKeyFrame/LastFrame
            dispatch, src/Tracking.cc:934-956) with the accept decision
            as a device-side select.  The host reads back exactly ONE
            small stats array per frame.

            packed: (capF+capK, 8) rows [acc(3) gyr(3) dt ok] — frame-
            interval steps first, since-last-KF steps after.
            sc: f32[8] = [radius, min_track_inliers, use_lastkf,
            has_opt, last_kf_idx, 0, 0, 0].
            """
            rowsF = packed[:capF]
            preF = imu_ops.preintegrate(
                rowsF[:, 0:3], rowsF[:, 3:6], rowsF[:, 6],
                rowsF[:, 7] > 0.5, cal, bias)
            R2, p2, v2 = imu_ops.predict_state(Rwb, pwb, vel, bias, preF)
            # predicted body pose -> camera pose guess
            Rbw = R2.T
            tbw = -jnp.matmul(Rbw, p2, precision=_HI)
            Rg = jnp.matmul(self.Rcb, Rbw, precision=_HI)
            tg = jnp.matmul(self.Rcb, tbw, precision=_HI) + self.tcb

            radius = sc[0]
            min_inl = sc[1].astype(jnp.int32)
            use_lastkf = sc[2] > 0.5
            has_opt = sc[3] > 0.5
            kf_idx = sc[4].astype(jnp.int32)

            def run_track(m_, rad):
                tr = tracking_mod.track_local_map(
                    m_, ff, Rg, tg, cfg.cam_model, self.cam_params,
                    cfg.image_hw, cfg.orb.scale_factor, cfg.orb.n_levels,
                    radius_th=rad, view=view)
                return tr, tracking_mod.update_point_stats(m_, tr)

            tr1, m1 = run_track(m, radius)

            def retry(_):
                # weak match: one retry at doubled radius (reference
                # doubles th and re-searches when nmatches < 20); stats
                # from the first attempt persist, like the host loop did
                tr2, m2 = run_track(m1, 2.0 * radius)
                better = tr2.n_inliers > tr1.n_inliers
                return jax.tree.map(
                    lambda a, b: jnp.where(better, a, b),
                    (tr2, m2), (tr1, m1))

            tr, m_out = jax.lax.cond(tr1.n_inliers < min_inl, retry,
                                     lambda _: (tr1, m1), None)

            # VI pose refinement inputs
            P = m.pt_xyz.shape[0]
            pt = jnp.clip(tr.kp_pt, 0, P - 1)
            X = m_out.pt_xyz[pt]
            sf = jnp.asarray(cfg.orb.scale_factor **
                             jnp.arange(cfg.orb.n_levels, dtype=jnp.float32))
            inv_s2 = 1.0 / sf[jnp.clip(ff.octave, 0,
                                       cfg.orb.n_levels - 1)] ** 2
            valid = (tr.kp_pt >= 0) & ff.valid
            # body state from the track result (the opt's initial state)
            Rbw_t = jnp.matmul(self.Rbc, tr.R, precision=_HI)
            tbw_t = jnp.matmul(self.Rbc, tr.t, precision=_HI) + self._tbc
            Rwb_t = Rbw_t.T
            pwb_t = -jnp.matmul(Rwb_t, tbw_t, precision=_HI)

            def branch_kf(_):
                """PoseInertialOptimizationLastKeyFrame (reference
                src/Optimizer.cc:3447): factor = preintegration since the
                last KF, rebuilt in-program from the packed rows."""
                rowsK = packed[capF:]
                preK = imu_ops.preintegrate(
                    rowsK[:, 0:3], rowsK[:, 3:6], rowsK[:, 6],
                    rowsK[:, 7] > 0.5, cal, bias)
                fK = inertial_solver.factor_from_preint(preK)
                Rbw_k = jnp.matmul(self.Rbc, m_out.kf_R[kf_idx],
                                   precision=_HI)
                tbw_k = jnp.matmul(self.Rbc, m_out.kf_t[kf_idx],
                                   precision=_HI) + self._tbc
                Rwb_kf = Rbw_k.T
                pwb_kf = -jnp.matmul(Rwb_kf, tbw_k, precision=_HI)
                res = vpo.vi_pose_optimization(
                    Rwb_t, pwb_t, v2, bias,
                    Rwb_kf, pwb_kf, m_out.kf_vel[kf_idx],
                    m_out.kf_bias[kf_idx], fK, X, ff.xy, inv_s2, valid,
                    cfg.cam_model, self.cam_params,
                    self.Rcb, self.tcb, imu_ops.GRAVITY)
                npr = vpo.VIPosePrior(Rwb=res.Rwb, pwb=res.pwb,
                                      vel=res.vel, bias=bias, H=res.H)
                return res.Rwb, res.pwb, res.vel, npr, res.n_inliers

            def branch_lf(_):
                """PoseInertialOptimizationLastFrame (reference
                src/Optimizer.cc:3846): the frame-to-frame VIO chain with
                the marginalized ConstraintPoseImu prior; factor = the
                frame-interval preintegration."""
                fF = inertial_solver.factor_from_preint(preF)
                res, npr = vpo.vi_pose_optimization_last_frame(
                    Rwb_t, pwb_t, v2, bias, prior, fF,
                    X, ff.xy, inv_s2, valid,
                    cfg.cam_model, self.cam_params,
                    self.Rcb, self.tcb, imu_ops.GRAVITY)
                return res.Rwb, res.pwb, res.vel, npr, res.n_inliers

            Rwb_o, pwb_o, vel_o, prior_o, n_vi = jax.lax.cond(
                use_lastkf, branch_kf, branch_lf, None)
            ok = has_opt & (n_vi >= 8)
            Rwb_f = jnp.where(ok, Rwb_o, Rwb_t)
            pwb_f = jnp.where(ok, pwb_o, pwb_t)
            vel_f = jnp.where(ok, vel_o, v2)
            prior_out = jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), prior_o, prior)
            # final camera pose from the (possibly refined) body state
            Rbw_f = Rwb_f.T
            tbw_f = -jnp.matmul(Rbw_f, pwb_f, precision=_HI)
            R_cur = jnp.matmul(self.Rcb, Rbw_f, precision=_HI)
            t_cur = jnp.matmul(self.Rcb, tbw_f, precision=_HI) + self.tcb
            stats = jnp.stack([tr.n_inliers, ok.astype(jnp.int32), n_vi,
                               tr1.n_inliers])
            return m_out, VITrackOut(
                R_tr=tr.R, t_tr=tr.t, kp_pt=tr.kp_pt,
                R_cur=R_cur, t_cur=t_cur,
                Rwb=Rwb_f, pwb=pwb_f, vel=vel_f, prior=prior_out,
                Rg=Rg, tg=tg, R_pred=R2, p_pred=p2, v_pred=v2,
                stats=stats)

        self._vi_track_step = _vi_track_step

        @jax.jit
        def _set_kf_vb(m, ki, vel, bias):
            """Store the tracker's velocity/bias at the new KF slot.
            TRACED index: an eager `.at[python_int].set` bakes the index
            into the executable, so every keyframe was a fresh remote
            compile (measured as the dominant cost of the bench's
            inertial KF step before this fix)."""
            return m._replace(kf_vel=m.kf_vel.at[ki].set(vel),
                              kf_bias=m.kf_bias.at[ki].set(bias))

        self._set_kf_vb = _set_kf_vb

    # ------------------------------------------------------------------ api
    def grab_imu(self, ts: float, gyro, acc):
        self.imu_queue.append((ts, np.asarray(gyro, np.float32),
                               np.asarray(acc, np.float32)))

    def track_monocular(self, img, ts: float, features=None):
        self._frame_rows = self._interval_rows(self.last_frame_ts, ts)
        self.last_frame_ts = ts
        return super().track_monocular(img, ts, features)

    # -------------------------------------------------------- preintegration
    def _interval_rows(self, t0: Optional[float], t1: float):
        """Integration-step rows for queued samples in (t0, t1] with the
        reference's midpoint + endpoint-interpolation scheme
        (Tracking::PreintegrateIMU, src/Tracking.cc:243-283; the sample
        just beyond t1 is peeked but left in the queue, exactly like the
        reference).  Returns packed (capF, 8) numpy rows
        [acc(3) gyr(3) dt ok] or None — the PREINTEGRATION itself happens
        inside the fused tracked-frame program (host staging of a device
        Preintegrated cost ~2 tunnel syncs per frame)."""
        if t0 is None:
            # drop stale samples, no preintegration for first frame
            self.imu_queue = [s for s in self.imu_queue if s[0] > t1 - 1e-9]
            return None
        take = [s for s in self.imu_queue if s[0] <= t1]
        nxt = self.imu_queue[len(take)] \
            if len(self.imu_queue) > len(take) else None
        self.imu_queue = self.imu_queue[len(take):]
        self.kf_imu_buffer.extend(take)
        if not take:
            return None
        steps = reference_imu_steps(take, t0, t1, nxt)
        return pack_imu_rows(steps, self.icfg.max_imu_per_frame)

    # -------------------------------------------------------------- tracking
    def _track_frame(self, ff, ts):
        if self.imu_initialized and self.last_body is not None and \
                self._frame_rows is not None:
            import types
            from ..solver import vi_pose_opt as vpo
            Rwb, pwb = self.last_body
            # VI refinement dispatch: LastKeyFrame right after a map
            # update (KF insertion / BA / re-anchor), otherwise the
            # frame-to-frame LastFrame chain with the marginalized
            # ConstraintPoseImu prior (reference TrackLocalMap dispatch,
            # src/Tracking.cc:934-956)
            use_lastkf = self._map_updated or self.frame_prior is None
            capF = self.icfg.max_imu_per_frame
            capK = capF * self.icfg.preint_buf_factor
            packed = np.zeros((capF + capK, 8), np.float32)
            packed[:capF] = self._frame_rows
            has_opt = float(self.icfg.use_vi_pose_opt)
            if use_lastkf and has_opt:
                rowsK = self._since_kf_rows(ts)
                if rowsK is None:
                    has_opt = 0.0
                else:
                    packed[capF:] = rowsK
            # search radius: tight under a warm IMU prediction, wide
            # right after a map update — a loop correction / GBA merge
            # moves points by centimetres (measured p95 8 cm ~ 4 px at
            # drive depth) while the predicted POSE stays good, so a
            # fixed tight radius loses the map exactly when it most
            # needs re-acquisition (reference SearchByProjection th=15
            # for monocular, src/Tracking.cc TrackWithMotionModel)
            radius = 12.0 if self._map_updated else 4.0
            sc = np.asarray([radius, self.cfg.min_track_inliers,
                             1.0 if use_lastkf else 0.0, has_opt,
                             max(self.last_kf_idx, 0), 0.0, 0.0, 0.0],
                            np.float32)
            prior = self.frame_prior
            if prior is None:
                # dummy prior (LastKF branch selected; never read)
                z3 = jnp.zeros(3)
                prior = vpo.VIPosePrior(Rwb=jnp.eye(3), pwb=z3, vel=z3,
                                        bias=jnp.zeros(6),
                                        H=jnp.eye(15))
            m2, out = self._vi_track_step(
                self.map, self.view, ff, jnp.asarray(packed), prior,
                jnp.asarray(sc), Rwb, pwb, self.vel, self.bias)
            # THE one host<->device sync of the inertial tracked frame
            st = np.asarray(out.stats)
            n_inl = int(st[0])
            vi_ok = bool(st[1])
            self.last_track_inliers = n_inl
            if n_inl < max(8, self.cfg.min_track_inliers // 3):
                # stay in RECENTLY_LOST predicting from the IMU (reference
                # Tracking.cc:467-471 keeps predicting for several seconds
                # before declaring LOST); only reset after patience expires
                self.R_cur, self.t_cur = out.Rg, out.tg
                self.R_prev, self.t_prev = out.Rg, out.tg
                self.vel = out.v_pred
                self.last_body = (out.R_pred, out.p_pred)
                if self._handle_tracking_loss(ff):
                    return
                self._reset()
                return
            self.map = m2
            self.lost_frames = 0
            self.state = base.OK
            self.R_prev, self.t_prev = self.R_cur, self.t_cur
            self.R_cur, self.t_cur = out.R_cur, out.t_cur
            self.has_velocity = True
            self.last_kp_pt = out.kp_pt   # viewer FrameDrawer overlay
            self.vel = out.vel
            self.last_body = (out.Rwb, out.pwb)
            if vi_ok:
                self.frame_prior = out.prior
                if use_lastkf:
                    self._map_updated = False
            elif not use_lastkf:
                # LastFrame chain rejected: drop the prior (the reference
                # deletes mpcpi when the optimization fails)
                self.frame_prior = None
            need_kf = (self.frame_id - self.last_kf_id >=
                       self.cfg.max_frames_between_kf) or \
                (n_inl < self.cfg.kf_inlier_ratio *
                 max(self.inliers_at_last_kf, 1))
            if need_kf and self.n_kf_host < \
                    self.cfg.map_capacity.n_kf - 1:
                tr = types.SimpleNamespace(
                    kp_pt=out.kp_pt, R=out.R_tr, t=out.t_tr,
                    n_inliers=st[0])
                self._insert_keyframe(ff, tr, ts, n_inl=n_inl)
        else:
            super()._track_frame(ff, ts)
            if self.state == base.OK:
                self.last_body = self._cam_to_body(self.R_cur, self.t_cur)

    def _body_to_cam(self, Rwb, pwb):
        """Twb -> Tcw given extrinsics."""
        # Tcw = Tcb * Tbw;  Tbw = (Twb)^-1
        Rbw = Rwb.T
        tbw = -Rbw @ pwb
        Rcw = self.Rcb @ Rbw
        tcw = self.Rcb @ tbw + self.tcb
        return Rcw, tcw

    def _cam_to_body(self, Rcw, tcw):
        """Tcw -> Twb:  Tbw = Tbc Tcw, Twb = Tbw^-1."""
        Rbw = self.Rbc @ Rcw
        tbw = self.Rbc @ tcw + self._tbc
        Rwb = Rbw.T
        pwb = -Rwb @ tbw
        return Rwb, pwb

    @property
    def _tbc(self):
        """Translation of Tbc (body <- camera) = -Rbc tcb... stored direct."""
        return self.tbc_vec

    # -------------------------------------------------------------- keyframe
    def _insert_keyframe(self, ff, tr, ts, n_inl=None):
        prev_idx = self.last_kf_idx
        prev_ts = self.last_kf_ts    # host mirror — no device round trip
        # finalize KF-interval preintegration from the buffered samples
        st = self._preintegrate_buffer(prev_ts, ts)
        if self.imu_initialized:
            # swap the visual local BA for the visual-inertial window BA
            # (reference: LocalInertialBA replaces LocalBundleAdjustment
            # once the IMU is initialized, src/LocalMapping.cc:117-152)
            self._visual_local_ba = self._local_ba
            self._local_ba = self._vi_ba_dispatch
            try:
                super()._insert_keyframe(ff, tr, ts, n_inl=n_inl)
            finally:
                self._local_ba = self._visual_local_ba
        else:
            super()._insert_keyframe(ff, tr, ts, n_inl=n_inl)
        new_idx = self.last_kf_idx
        if st is not None:
            pre, raw = st
            self.preints.append(pre)
            self.preint_kf_pairs.append((prev_idx, new_idx))
            self.preint_raw.append(raw)
        self._map_updated = True
        # store velocity/bias in the map (traced-index jit — see
        # _set_kf_vb for why not an eager .at[int].set)
        self.map = self._set_kf_vb(
            self.map, jnp.asarray(new_idx, jnp.int32), self.vel,
            self.bias)
        if self.kf_time0 is None:
            self.kf_time0 = ts
        if not self.imu_initialized and \
                len(self.preints) >= self.icfg.init_min_kfs and \
                ts - self.kf_time0 >= self.icfg.init_time_s:
            self._initialize_imu(prior_g=1e2, prior_a=1e6)
        elif self.imu_initialized and not self.viba1_done and \
                ts - self.kf_time0 >= self.icfg.refine_time_s:
            # VIBA1 stage (reference InitializeIMU at ~5s with weaker
            # priors — src/LocalMapping.cc:221-223: priorG=1, priorA=1e5):
            # re-estimate scale/gravity on the longer baseline and
            # re-anchor (reference src/LocalMapping.cc:192-266)
            self.viba1_done = self._initialize_imu(prior_g=1.0,
                                                   prior_a=1e5)
        elif self.viba1_done and not self.viba2_done and \
                ts - self.kf_time0 >= self.icfg.refine2_time_s:
            # VIBA2 stage (reference src/LocalMapping.cc:242-244:
            # InitializeIMU(0, 0, ..., minTimeForVIBA2)): one more
            # scale/gravity re-estimate + full inertial BA on the ~15 s
            # baseline — monocular visual scale creeps between inertial
            # refinements, and this is the reference's pull-back
            self.viba2_done = self._initialize_imu(prior_g=0.0,
                                                   prior_a=0.0)
        # bad-IMU failsafe (reference mbBadImu, src/LocalMapping.cc:
        # 122-126 + src/Tracking.cc:368-373): the init stages never
        # converged within reset_time_thresh of keyframe time => the IMU
        # data (or the motion) is degenerate; force a map reset
        if not self.viba1_done and self.kf_time0 is not None and \
                ts - self.kf_time0 > self.icfg.reset_time_thresh:
            self._reset()
            return
        # the VI init/FIBA stages above re-anchor (Sim3) and re-optimize
        # the whole map — the tracking view gathered in super() is stale
        self._refresh_view()

    def _since_kf_rows(self, ts_now: float):
        """Packed integration rows covering (last KF ts, now] from the
        buffered samples (reference mpImuPreintegratedFromLastKF); the
        preintegration runs inside the fused tracked-frame program."""
        kf_ts = self.last_kf_ts      # host mirror — no device round trip
        take = [s for s in self.kf_imu_buffer if kf_ts < s[0] <= ts_now]
        if len(take) < 2:
            return None
        nxt = next((s for s in self.kf_imu_buffer if s[0] > ts_now), None)
        steps = reference_imu_steps(take, kf_ts, ts_now, nxt)
        return pack_imu_rows(steps, self.icfg.max_imu_per_frame *
                             self.icfg.preint_buf_factor)

    def _factor_capacity(self, n: int) -> int:
        """Bucket a factor count to the next power of two (clamped to
        max_factors): every distinct capacity is a distinct jit shape,
        and an unbucketed len(preints) made each FIBA/inertial-GBA call
        a fresh multi-minute remote compile on the TPU."""
        cap = 8
        while cap < n:
            cap *= 2
        return min(cap, max(self.icfg.max_factors, 8))

    def _window_factors(self):
        """Stack the preintegration factors touching the BA window."""
        capf = self.icfg.vi_window_factors
        pairs = self.preint_kf_pairs[-capf:]
        pre = self.preints[-capf:]
        if not pre:
            return None
        ki = [p[0] for p in pairs]
        kj = [p[1] for p in pairs]
        return inertial_solver.stack_preints_device(pre, ki, kj, capacity=capf)

    def _vi_ba_dispatch(self, m, center_kf):
        f = self._window_factors()
        if f is None:
            return self._visual_local_ba(m, center_kf)
        return self._vi_local_ba(m, center_kf, f, self.bank)

    def _schedule_gba(self, ki: int) -> None:
        """Post-loop GBA on an IMU-initialized map must be the FULL
        INERTIAL BA (reference LoopClosing::RunGlobalBundleAdjustment
        runs Optimizer::FullInertialBA when the active map is IMU-
        initialized, src/LoopClosing.cc) — a monocular visual GBA
        leaves the scale gauge free and can rescale the metric map
        (measured on the vi-loop drive: tail scale drifted to 0.93 and
        the trajectory diverged 2.2 m after the visual GBA landed)."""
        if not self.imu_initialized or not self.preints:
            return super()._schedule_gba(ki)
        if not self.cfg.post_loop_gba:
            return
        capf = self._factor_capacity(len(self.preints))
        f_all = inertial_solver.stack_preints_device(
            self.preints, [p[0] for p in self.preint_kf_pairs],
            [p[1] for p in self.preint_kf_pairs], capacity=capf)
        self._pending = (self._vi_full_ba(
            self.map, jnp.asarray(ki, jnp.int32), f_all, self.bank),
            ki, "gba")

    def _preintegrate_buffer(self, t0: float, t1: float):
        """Returns (Preintegrated, raw (acc, gyr, dts) numpy) or None."""
        take = [s for s in self.kf_imu_buffer if t0 < s[0] <= t1]
        self.kf_imu_buffer = [s for s in self.kf_imu_buffer if s[0] > t1]
        if len(take) < 3:
            return None
        nxt = self.kf_imu_buffer[0] if self.kf_imu_buffer else None
        acc, gyr, dts = reference_imu_steps(take, t0, t1, nxt)
        return self._preint_raw(acc, gyr, dts, self.bias), (acc, gyr, dts)

    def _preint_raw(self, acc: np.ndarray, gyr: np.ndarray,
                    dts: np.ndarray, bias):
        """Preintegrate a variable-length raw sample buffer by padding to
        the KF-interval capacity (power-of-two multiples keep recompiles
        bounded when MergePrevious produces longer buffers)."""
        base = self.icfg.max_imu_per_frame * \
            self.icfg.preint_buf_factor
        cap = base
        while cap < len(acc):
            cap *= 2
        pad = cap - len(acc)
        accp = np.pad(acc, ((0, pad), (0, 0)))
        gyrp = np.pad(gyr, ((0, pad), (0, 0)))
        dtsp = np.pad(dts, (0, pad))
        mask = np.arange(cap) < len(acc)
        return self._preint_kf(jnp.asarray(accp), jnp.asarray(gyrp),
                               jnp.asarray(dtsp), jnp.asarray(mask), bias)

    # -------------------------------------------------------------- IMU init
    def _initialize_imu(self, prior_g: float = 1e2,
                        prior_a: float = 1e6) -> bool:
        """Gravity/scale/bias initialization + map re-anchoring.
        Returns True when the stage converged (scale accepted).
        prior_g/prior_a follow the reference's per-stage schedule
        (src/LocalMapping.cc:195,221,242: init 1e2/1e6 -> VIBA1 1/1e5 ->
        VIBA2 0/0)."""
        m = self.map
        ki = [p[0] for p in self.preint_kf_pairs]
        kj = [p[1] for p in self.preint_kf_pairs]
        f = inertial_solver.stack_preints_device(
            self.preints, ki, kj,
            capacity=self._factor_capacity(len(self.preints)))
        K = m.kf_R.shape[0]
        # body poses of all KFs: Twb = (Tbc Tcw)^-1
        Rbw = jnp.einsum("ij,kjl->kil", self.Rbc, m.kf_R, precision=_HI)
        tbw = jnp.einsum("ij,kj->ki", self.Rbc, m.kf_t,
                         precision=_HI) + self._tbc
        Rwb = jnp.swapaxes(Rbw, 1, 2)
        pwb = -jnp.einsum("kij,kj->ki", Rwb, tbw, precision=_HI)
        res = inertial_solver.inertial_only_init(
            f, Rwb, pwb, m.kf_valid, prior_g=prior_g, prior_a=prior_a,
            iterations=60, fix_scale=self.imu_fix_scale)
        s = 1.0 if self.imu_fix_scale else float(res.scale)
        if s < 0.1:   # reference rejects scale < 0.1 (LocalMapping.cc:1166)
            return False
        # re-anchor: x' = s * Rgw x  with Rgw = Rwg^T
        Rgw = res.Rwg.T
        self._apply_world_sim3(Rgw, s)
        # velocities from the init: already metric (the solver scales
        # positions internally), only rotate into the gravity frame
        vel_new = jnp.einsum("ij,kj->ki", Rgw, res.vel, precision=_HI)
        self.map = self.map._replace(
            kf_vel=vel_new,
            kf_bias=jnp.tile(res.bias[None, :], (K, 1)))
        self.bias = res.bias
        nk = int(self.map.n_kf)
        self.vel = vel_new[self.last_kf_idx]
        # Reintegrate every stored factor at the new bias from the raw
        # sample buffers (reference IMU::Preintegrated::Reintegrate,
        # src/ImuTypes.cc:170 — first-order correction inside the residual
        # only holds for small bias deltas; the init bias jump is not one)
        self.preints = [self._preint_raw(a, g, d, self.bias)
                        for (a, g, d) in self.preint_raw]
        self.imu_initialized = True
        from ..utils.profiling import Verbose
        Verbose.print(f"[imu] initialized: scale {s:.4f}", Verbose.NORMAL)
        # Full-map FullInertialBA (bFIBA — reference
        # src/LocalMapping.cc:1201-1210, Optimizer.cc:371-762): jointly
        # refine ALL keyframes/points/velocities/biases after re-anchoring
        if self.icfg.fiba and self.preints:
            capf = self._factor_capacity(len(self.preints))
            f_all = inertial_solver.stack_preints_device(
                self.preints, [p[0] for p in self.preint_kf_pairs],
                [p[1] for p in self.preint_kf_pairs], capacity=capf)
            self.map = self._vi_full_ba(
                self.map, jnp.asarray(self.last_kf_idx, jnp.int32), f_all,
                self.bank)
            self.bias = self.map.kf_bias[self.last_kf_idx]
            self.vel = self.map.kf_vel[self.last_kf_idx]
        # refresh tracker pose after re-anchoring
        self.R_cur = self.map.kf_R[self.last_kf_idx]
        self.t_cur = self.map.kf_t[self.last_kf_idx]
        self.R_prev, self.t_prev = self.R_cur, self.t_cur
        self.last_body = self._cam_to_body(self.R_cur, self.t_cur)
        self.has_velocity = False
        self.frame_prior = None
        self._map_updated = True
        return True

    def _cull_keyframe(self, kf_idx: int):
        """KF culling in inertial mode must keep the preintegration chain
        intact: the two factors meeting at the culled KF are merged into
        one spanning factor by replaying their raw sample buffers
        (reference IMU::Preintegrated::MergePrevious,
        src/ImuTypes.cc:239 — without this, culling silently drops
        inertial constraints)."""
        a = next((i for i, p in enumerate(self.preint_kf_pairs)
                  if p[1] == kf_idx), None)
        b = next((i for i, p in enumerate(self.preint_kf_pairs)
                  if p[0] == kf_idx), None)
        if a is not None and b is not None:
            acc = np.concatenate([self.preint_raw[a][0],
                                  self.preint_raw[b][0]])
            gyr = np.concatenate([self.preint_raw[a][1],
                                  self.preint_raw[b][1]])
            dts = np.concatenate([self.preint_raw[a][2],
                                  self.preint_raw[b][2]])
            merged = self._preint_raw(acc, gyr, dts, self.bias)
            pair = (self.preint_kf_pairs[a][0], self.preint_kf_pairs[b][1])
            for i in sorted((a, b), reverse=True):
                del self.preints[i]
                del self.preint_kf_pairs[i]
                del self.preint_raw[i]
            self.preints.append(merged)
            self.preint_kf_pairs.append(pair)
            self.preint_raw.append((acc, gyr, dts))
            # keep factor lists temporally ordered (window slicing relies
            # on recency at the tail)
            order = sorted(range(len(self.preint_kf_pairs)),
                           key=lambda i: self.preint_kf_pairs[i][1])
            self.preints = [self.preints[i] for i in order]
            self.preint_kf_pairs = [self.preint_kf_pairs[i] for i in order]
            self.preint_raw = [self.preint_raw[i] for i in order]
        elif a is not None or b is not None:
            i = a if a is not None else b
            del self.preints[i]
            del self.preint_kf_pairs[i]
            del self.preint_raw[i]
        super()._cull_keyframe(kf_idx)

    def _create_map_in_atlas(self):
        """Timestamp regression also clears the IMU queue (reference
        src/Tracking.cc:385-388 clears mlQueueImuData before
        CreateMapInAtlas): queued samples straddle the time discontinuity
        and would poison the next preintegration."""
        self.imu_queue = []
        super()._create_map_in_atlas()

    def _archive_and_new_map(self):
        """Archive the map and clear ALL inertial bookkeeping (reference
        Tracking::ResetActiveMap clears IMU-init flags and the preint
        chain, src/Tracking.cc:1330-1380); stale factors would otherwise
        reference keyframes of the archived map."""
        super()._archive_and_new_map()
        self.imu_initialized = False
        self.viba1_done = False
        self.viba2_done = False
        self.preints = []
        self.preint_kf_pairs = []
        self.preint_raw = []
        self.kf_imu_buffer = []
        self.kf_time0 = None
        self.last_body = None
        self.bias = jnp.zeros(6)
        self.vel = jnp.zeros(3)
        self.frame_prior = None
        self._map_updated = True

    def _apply_world_sim3(self, Rg, s: float):
        """World transform x' = s Rg x applied to every KF/point/velocity
        (reference Map::UpdateKFsAndMapCoordianteFrames).

        The GNSS georeference window holds SLAM-frame positions — they
        must ride the same Sim3 or the Umeyama fit mixes pre- and
        post-re-anchor frames (measured: a 7x IMU-init re-anchor left
        the SLAM->geo scale at 2.1 instead of 3.0 and the geo error at
        ~0.8 m instead of ~2 cm)."""
        if self.georef is not None and self.georef._slam:
            Rg_np = np.asarray(Rg, np.float64)
            self.georef._slam = [
                (float(s) * (Rg_np @ np.asarray(p, np.float64))).astype(
                    np.float32) for p in self.georef._slam]
            self.georef.transform = None
            self.georef.update()
        m = self.map
        kf_R = jnp.einsum("kij,lj->kil", m.kf_R, Rg,
                          precision=_HI)  # R_cw Rg^T
        kf_t = m.kf_t * s
        pt = s * jnp.einsum("ij,kj->ki", Rg, m.pt_xyz, precision=_HI)
        vel = s * jnp.einsum("ij,kj->ki", Rg, m.kf_vel, precision=_HI)
        nrm = jnp.einsum("ij,kj->ki", Rg, m.pt_normal, precision=_HI)
        self.map = m._replace(kf_R=kf_R, kf_t=kf_t, pt_xyz=pt, kf_vel=vel,
                              pt_normal=nrm,
                              pt_min_dist=m.pt_min_dist * s,
                              pt_max_dist=m.pt_max_dist * s)
        # transform the already-recorded frame trajectory into the new
        # frame as well (the reference rewrites KF poses and the evaluator
        # reads those; our per-frame trajectory must follow the re-anchor)
        Rg_np = np.asarray(Rg)
        self.trajectory = [
            (ts_, Rg_np @ Rwc_, float(s) * (Rg_np @ twc_))
            for ts_, Rwc_, twc_ in self.trajectory]
