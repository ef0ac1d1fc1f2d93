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
    max_frames_between_kf: int = 15
    kf_inlier_ratio: float = 0.75     # insert KF when inliers decay to this
    new_pt_budget: int = 768
    local_ba_window: int = 8
    local_ba_iters: int = 10
    ba_caps: tuple = (32, 6144, 24576)  # cams, pts, obs for local BA
    enable_loop_closing: bool = False
    reloc_patience: int = 10   # frames in RECENTLY_LOST before map reset
    stereo_bf: float = 0.0     # fx * baseline; > 0 enables stereo residuals
    fuse_every_n_kf: int = 4   # SearchInNeighbors cadence (0 = off)
    kf_culling: bool = True    # KeyFrameCulling (fork disabled it; we don't)


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
        self.inliers_at_last_kf = 0
        self.trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.n_resets = 0
        self.loop_closer = None
        if config.enable_loop_closing:
            from . import loop_closing
            self.loop_closer = loop_closing.LoopCloser(
                loop_closing.LoopConfig(), config.map_capacity.n_kf)
        self.atlas = atlas_mod.Atlas(config.map_capacity)
        self.lost_frames = 0
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
        def _track(m, ff, R_guess, t_guess, radius_th):
            tr = tracking.track_local_map(
                m, ff, R_guess, t_guess, cam_model, self.cam_params,
                cfg.image_hw, cfg.orb.scale_factor, cfg.orb.n_levels,
                radius_th=radius_th)
            m2 = tracking.update_point_stats(m, tr)
            return tr, m2

        @jax.jit
        def _insert_kf(m, ff, kp_pt, R, t, ts, frame_id,
                       prev_ff, prev_kp_pt, prev_R, prev_t, prev_kf_idx,
                       kp_ur):
            m, ki = mapstate.add_keyframe(m, R, t, ts, frame_id)
            m = mapstate.add_observations(m, ki, kp_pt, ff.xy, ff.octave,
                                          (kp_pt >= 0) & ff.valid, ur=kp_ur)
            # triangulate new points vs previous keyframe
            np_ = mapping.triangulate_new_points(
                ff, prev_ff, (kp_pt < 0) & ff.valid,
                (prev_kp_pt < 0) & prev_ff.valid,
                R, t, prev_R, prev_t, cam_model, self.cam_params,
                self.cam_params, cfg.orb.scale_factor, cfg.orb.n_levels)
            # budget: keep best new points (by parallax already gated) —
            # take first new_pt_budget valid
            B = cfg.new_pt_budget
            order = jnp.argsort(~np_.valid)[:B]
            sel_valid = np_.valid[order]
            Ow = -jnp.einsum("ji,j->i", R, t)
            normal, dmin, dmax = mapping.point_descriptor_stats(
                np_.xyz[order], ff.desc[order], Ow, ff.octave[order],
                cfg.orb.scale_factor, cfg.orb.n_levels)
            m, pt_idx = mapstate.add_points(
                m, np_.xyz[order], ff.desc[order], normal, dmin, dmax,
                ki, frame_id, sel_valid)
            # observations of the new points in both keyframes
            m = mapstate.add_observations(
                m, ki, pt_idx, ff.xy[order], ff.octave[order], sel_valid,
                ur=kp_ur[order])
            prev_j = np_.kp_prev[order]
            prev_j_c = jnp.maximum(prev_j, 0)
            m = mapstate.add_observations(
                m, prev_kf_idx, pt_idx, prev_ff.xy[prev_j_c],
                prev_ff.octave[prev_j_c], sel_valid & (prev_j >= 0))
            # update bindings for the new KF
            kp_pt_new = kp_pt.at[order].set(
                jnp.where(sel_valid, pt_idx, kp_pt[order]))
            return m, ki, kp_pt_new, jnp.sum(sel_valid.astype(jnp.int32))

        @jax.jit
        def _local_ba(m, center_kf):
            cams, pts, obs = cfg.ba_caps
            return mapping.run_local_ba(
                m, center_kf, cam_model, self.cam_params,
                window=cfg.local_ba_window, iterations=cfg.local_ba_iters,
                scale_factor=cfg.orb.scale_factor,
                n_levels=cfg.orb.n_levels,
                stereo_bf=cfg.stereo_bf,
                cap_cams=cams, cap_pts=pts, cap_obs=obs)

        @jax.jit
        def _cull(m, frame_id):
            return mapstate.cull_points(m, frame_id)

        @jax.jit
        def _fuse(m, kf_idx, ff, kp_pt):
            from . import fusion
            return fusion.fuse_into_keyframe(
                m, kf_idx, ff, kp_pt, cam_model, self.cam_params,
                cfg.image_hw, cfg.orb.scale_factor, cfg.orb.n_levels)

        @jax.jit
        def _redundancy(m, center):
            from . import fusion
            return fusion.redundancy_window(m, center)

        self._init_match = _init_match
        self._reconstruct = _reconstruct
        self._track = _track
        self._insert_kf_jit = _insert_kf
        self._local_ba = _local_ba
        self._cull = _cull
        self._fuse = _fuse
        self._redundancy = _redundancy

    # ------------------------------------------------------------- frontend
    def _extract(self, img: jnp.ndarray) -> FeatureFrame:
        return extractor.extract_jit(img, self.cfg.orb)

    def _frame_kp_ur(self, ff: FeatureFrame) -> jnp.ndarray:
        """Per-keypoint stereo right-u for the current frame (-1 = mono);
        overridden by StereoSystem."""
        return jnp.full(ff.xy.shape[0], -1.0, jnp.float32)

    # ------------------------------------------------------------------ api
    def track_monocular(self, img: Optional[jnp.ndarray], ts: float,
                        features: Optional[FeatureFrame] = None):
        """Process one frame.  Returns (state, Twc pose or None).

        `features` may be supplied directly (testing / external frontends);
        otherwise they are extracted from `img`.
        """
        self.frame_id += 1
        ff = features if features is not None else self._extract(img)

        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            self._initialize(ff, ts)
        elif self.state in (OK, RECENTLY_LOST):
            self._track_frame(ff, ts)

        if self.state == OK:
            # record camera-to-world pose
            Rwc = np.asarray(self.R_cur).T
            twc = -Rwc @ np.asarray(self.t_cur)
            self.trajectory.append((ts, Rwc, twc))
            return self.state, (Rwc, twc)
        return self.state, None

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

        self.map = m
        self.R_cur, self.t_cur = m.kf_R[k2], m.kf_t[k2]
        self.R_prev, self.t_prev = self.R_cur, self.t_cur
        self.has_velocity = False
        self.state = OK
        self.last_kf_id = self.frame_id
        self.last_kf_idx = int(k2)
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
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(m, int(k1), self.ref_ff)
            self.loop_closer.add_keyframe(m, int(k2), ff)
        self.inliers_at_last_kf = int(jnp.sum((kp_pt2 >= 0)))
        # first trajectory entry for the ref frame
        self.trajectory.append(
            (self.ref_ts, np.eye(3), np.zeros(3)))

    # ------------------------------------------------------------- tracking
    def _track_frame(self, ff: FeatureFrame, ts: float):
        cfg = self.cfg
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
                                   jnp.asarray(radius, jnp.float32))
        n_inl = int(tr.n_inliers)
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

        # keyframe decision (reference src/Tracking.cc:985-1005)
        need_kf = (self.frame_id - self.last_kf_id >= cfg.max_frames_between_kf) or \
            (n_inl < cfg.kf_inlier_ratio * max(self.inliers_at_last_kf, 1))
        if need_kf and int(self.map.n_kf) < cfg.map_capacity.n_kf - 1:
            self._insert_keyframe(ff, tr, ts)

    def _insert_keyframe(self, ff: FeatureFrame, tr, ts: float):
        prev_idx = self.last_kf_idx
        prev_ff = self.kf_features[prev_idx]
        prev_kp_pt = self.kf_bindings[prev_idx]
        kp_ur = self._frame_kp_ur(ff)
        m, ki, kp_pt_new, n_new = self._insert_kf_jit(
            self.map, ff, tr.kp_pt, tr.R, tr.t,
            jnp.asarray(ts, jnp.float32),
            jnp.asarray(self.frame_id, jnp.int32),
            prev_ff, prev_kp_pt,
            self.map.kf_R[prev_idx], self.map.kf_t[prev_idx],
            jnp.asarray(prev_idx, jnp.int32), kp_ur)
        ki = int(ki)
        m = self._cull(m, jnp.asarray(self.frame_id, jnp.int32))
        m = self._local_ba(m, jnp.asarray(ki, jnp.int32))
        self.map = m
        # refresh tracker pose from the optimized keyframe; propagate the
        # same correction to the previous-frame pose so the constant-
        # velocity model doesn't see the BA update as inter-frame motion
        dR, dt_ = lie.se3_compose(
            m.kf_R[ki], m.kf_t[ki], *lie.se3_inverse(self.R_cur, self.t_cur))
        self.R_prev, self.t_prev = lie.se3_compose(dR, dt_, self.R_prev,
                                                   self.t_prev)
        self.R_cur = m.kf_R[ki]
        self.t_cur = m.kf_t[ki]
        self.kf_features[ki] = ff
        self.kf_bindings[ki] = kp_pt_new
        self.last_kf_idx = ki
        self.last_kf_id = self.frame_id
        self.inliers_at_last_kf = int(tr.n_inliers)
        # SearchInNeighbors: fuse map points into this keyframe
        # (reference src/LocalMapping.cc:764; cadence-limited here)
        if self.cfg.fuse_every_n_kf and ki % self.cfg.fuse_every_n_kf == 0:
            m2, kp_pt2, _ = self._fuse(self.map,
                                       jnp.asarray(ki, jnp.int32), ff,
                                       self.kf_bindings[ki])
            self.map = m2
            self.kf_bindings[ki] = kp_pt2
        # KeyFrameCulling (reference src/LocalMapping.cc:902; the fork
        # disabled it because of pointer crashes — SoA has none)
        if self.cfg.kf_culling and ki > 6 and ki % 4 == 0:
            flags = self._redundancy(self.map, jnp.asarray(ki, jnp.int32))
            reds = np.nonzero(np.asarray(flags))[0]
            if len(reds):
                from . import fusion
                self.map = fusion.cull_keyframe(
                    self.map, jnp.asarray(int(reds[0]), jnp.int32))
        if self.loop_closer is not None:
            merged = False
            if self.atlas.sessions:
                from . import map_merging
                merged = map_merging.try_merge(self, ff, ki)
            if not merged:
                self.loop_closer.try_close(self, ff, ki)

    # ----------------------------------------------------- loss / reloc
    def _handle_tracking_loss(self, ff) -> bool:
        """RECENTLY_LOST handling: attempt relocalization against the
        keyframe database (upstream Tracking::Relocalization — the fork
        resets instead; we support both, reset after reloc_patience).
        Returns True if the frame was recovered or patience remains."""
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
        (reference src/Tracking.cc:543-544, CreateMapInAtlas :771-805 —
        the old map is kept, a new one becomes current)."""
        self.n_resets += 1
        db = None
        if self.loop_closer is not None:
            from ..place import keyframe_db as _kdb
            db = self.loop_closer.db
            self.loop_closer.db = _kdb.KeyframeDB.create(
                self.cfg.map_capacity.n_kf, self.loop_closer.cfg.n_words)
            self.loop_closer.consistent_count = 0
            self.loop_closer.last_candidate = -1
        self.atlas.store_session(self.map, self.kf_features,
                                 self.kf_bindings, self.trajectory, db=db)
        self.trajectory = []
        self.state = NO_IMAGES_YET
        self.map = mapstate.empty_map(self.cfg.map_capacity)
        self.ref_ff = None
        self.has_velocity = False
        self.lost_frames = 0
        self.kf_features.clear()
        self.kf_bindings.clear()

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
