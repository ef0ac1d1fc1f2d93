"""Stereo SLAM system: instant metric initialization and depth-based
point creation on top of the monocular pipeline.

Parity targets (upstream stereo path, dead code in the fork):
  * Tracking::StereoInitialization — the first frame with enough stereo
    depths creates the map directly (metric scale, no two-view RANSAC);
  * CreateNewKeyFrame stereo point insertion — keypoints with valid depth
    that are not yet map points become points immediately (close points
    first, reference inserts up to 100 beyond the tracked ones);
  * stereo observations carry (u, v, uR); bundle adjustment adds the
    third stereo residual row (solver/ba.py stereo_bf), continuously
    anchoring the metric scale like the reference's EdgeStereo.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..features import stereo as stereo_mod
from ..features.extractor import FeatureFrame
from ..ops import lie
from ..slam_map import state as mapstate
from . import mapping, system as base


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    baseline: float = 0.11          # EuRoC cam0-cam1 baseline [m]
    min_init_depth_points: int = 100
    max_depth_factor: float = 35.0  # x baseline: "close point" horizon
    # direct RAW-fisheye stereo (reference KannalaBrandt8::
    # TriangulateMatches): no rectification, bearing-space epipolar
    # matching + ray triangulation with the factory extrinsic; keeps the
    # fisheye periphery the virtual-pinhole rectification crops.  Set
    # cam_model="kb8" in SlamConfig, stereo_bf=0 (no rectified-row ur
    # residual — depth-created points + IMU anchor the metric scale)
    raw_fisheye: bool = False
    right_cam_params: tuple = ()    # right camera intrinsics (raw mode)
    T_rl: tuple = ()                # 4x4 row-major right <- left


class StereoSystem(base.System):
    def __init__(self, config: base.SlamConfig, scfg: StereoConfig):
        super().__init__(config)
        self.scfg = scfg
        self._build_stereo_jits(config, scfg)

    def _build_stereo_jits(self, config, scfg):
        """Depth-association programs; shared with StereoInertialSystem
        (which inherits InertialSystem, not this class)."""
        fx = float(config.cam_params[0])
        if scfg.raw_fisheye:
            import numpy as _np
            T = _np.asarray(scfg.T_rl, _np.float64).reshape(4, 4)
            R_rl = jnp.asarray(T[:3, :3], jnp.float32)
            t_rl = jnp.asarray(T[:3, 3], jnp.float32)
            p_r = jnp.asarray(scfg.right_cam_params, jnp.float32)
            p_l = self.cam_params
            model = config.cam_model

            @jax.jit
            def _raw_match(fl, fr):
                out = stereo_mod.fisheye_stereo_match(
                    fl, fr, p_l, p_r, R_rl, t_rl,
                    max_depth=scfg.max_depth_factor * scfg.baseline * 3,
                    scale_factor=config.orb.scale_factor,
                    cam_model=model)
                # no rectified right-u in raw mode: ur stays -1 (mono BA
                # rows); depth-created points carry the metric scale
                return stereo_mod.StereoDepth(
                    ur=jnp.full(out.depth.shape[0], -1.0, jnp.float32),
                    depth=out.depth, valid=out.valid)

            self._stereo_jit = _raw_match
            # no row-aligned pair to SAD-refine against in raw mode
            self._refine_jit = jax.jit(lambda il, ir, xy, d: d)
        else:
            self._stereo_jit = jax.jit(
                lambda fl, fr: stereo_mod.stereo_match(
                    fl, fr, fx, scfg.baseline,
                    max_depth=scfg.max_depth_factor * scfg.baseline * 3))
            # subpixel SAD refinement (Frame::ComputeStereoMatches
            # parity) — runs when the caller provides pixel data
            self._refine_jit = jax.jit(
                lambda il, ir, xy, d: stereo_mod.refine_disparity(
                    il.astype(jnp.float32), ir.astype(jnp.float32), xy, d,
                    fx, scfg.baseline))

    # ------------------------------------------------------------------ api
    def track_stereo(self, img_l, img_r, ts: float,
                     features_l: FeatureFrame | None = None,
                     features_r: FeatureFrame | None = None):
        ff_l = features_l if features_l is not None else self._extract(img_l)
        ff_r = features_r if features_r is not None else self._extract(img_r)
        self._depth = self._stereo_jit(ff_l, ff_r)
        if img_l is not None and img_r is not None:
            self._depth = self._refine_jit(img_l, img_r, ff_l.xy,
                                           self._depth)
        return self._track_with_depth(ff_l, ts)

    def _track_with_depth(self, ff_l: FeatureFrame, ts: float):
        """Shared depth-sensor frame step: self._depth already holds the
        per-keypoint StereoDepth (from stereo matching or an RGBD depth
        image)."""
        self.frame_id += 1

        if self.state in (base.NO_IMAGES_YET, base.NOT_INITIALIZED):
            self._stereo_initialize(ff_l, ts)
        elif self.state in (base.OK, base.RECENTLY_LOST):
            self._track_frame(ff_l, ts)

        out = None
        if self.state == base.OK:
            Rwc = np.asarray(self.R_cur).T
            twc = -Rwc @ np.asarray(self.t_cur)
            self.trajectory.append((ts, Rwc, twc))
            out = (Rwc, twc)
        if self.viewer is not None:
            self.viewer.publish(self)
            self.viewer.wait_if_paused()
        return self.state, out

    # ----------------------------------------------------------------- init
    def _stereo_initialize(self, ff: FeatureFrame, ts: float):
        d = self._depth
        n_ok = int(jnp.sum(d.valid & ff.valid))
        if n_ok < self.scfg.min_init_depth_points:
            return
        m = mapstate.empty_map(self.cfg.map_capacity)
        m, k0 = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3), ts,
                                      self.frame_id)
        # unproject with depth (z-normalized model ray * z; pinhole AND
        # kb8 raw-fisheye both route through the camera dispatch)
        X = self._depth_rays(ff) * d.depth[:, None]
        ok = d.valid & ff.valid
        dist = jnp.linalg.norm(X, axis=1)
        sf = self.cfg.orb.scale_factor ** ff.octave.astype(jnp.float32)
        m, pt_idx = mapstate.add_points(
            m, X, ff.desc, X / jnp.maximum(dist, 1e-9)[:, None],
            dist * sf / (self.cfg.orb.scale_factor **
                         (self.cfg.orb.n_levels - 1)),
            dist * sf, 0, self.frame_id, ok)
        m = mapstate.add_observations(m, k0, pt_idx, ff.xy, ff.octave, ok,
                                      ur=jnp.where(d.valid, d.ur, -1.0))
        self.map = m
        self.R_cur = jnp.eye(3)
        self.t_cur = jnp.zeros(3)
        self.R_prev, self.t_prev = self.R_cur, self.t_cur
        self.has_velocity = False
        self.state = base.OK
        self.last_kf_id = self.frame_id
        self.last_kf_idx = int(k0)
        self.n_kf_host = 1
        self.last_kf_ts = ts
        self.kf_features[int(k0)] = ff
        self.kf_bindings[int(k0)] = jnp.where(ok, pt_idx, -1)
        self.kf_ur[int(k0)] = jnp.where(d.valid, d.ur, -1.0)
        self._bank_store(int(k0), ff, self.kf_bindings[int(k0)],
                         ur=self.kf_ur[int(k0)])
        self.inliers_at_last_kf = n_ok
        self._refresh_view()

    def _frame_kp_ur(self, ff: FeatureFrame) -> jnp.ndarray:
        d = self._depth
        return jnp.where(d.valid, d.ur, -1.0)

    def _depth_rays(self, ff: FeatureFrame) -> jnp.ndarray:
        """z-normalized camera rays per keypoint for depth unprojection
        (pinhole closed form == the generic dispatch; kb8 raw mode needs
        the Newton unprojection)."""
        from ..ops import cameras
        rays = cameras.unproject(self.cfg.cam_model, self.cam_params,
                                 ff.xy)
        return rays / jnp.maximum(rays[:, 2:3], 1e-6)

    # ------------------------------------------------------------- keyframe
    def _insert_keyframe(self, ff: FeatureFrame, tr, ts: float,
                         n_inl: int | None = None):
        super()._insert_keyframe(ff, tr, ts, n_inl=n_inl)
        self._stereo_new_points(ff)
        # the fresh depth-based points must be trackable immediately
        self._refresh_view()

    def _stereo_new_points(self, ff: FeatureFrame):
        """Depth-based points for still-unbound keypoints (stereo bonus;
        reference CreateNewKeyFrame stereo path).  One jitted program
        with a TRACED keyframe index (eager int-indexed gathers were a
        fresh executable per keyframe)."""
        if not hasattr(self, "_stereo_new_jit"):
            cfg = self.cfg

            @jax.jit
            def _stereo_new(m, bank, ki, ff_, kp_pt, d_ur, d_depth,
                            d_valid, frame_id):
                from ..slam_map import feature_bank as fbank
                free = (kp_pt < 0) & ff_.valid & d_valid
                Xc = self._depth_rays(ff_) * d_depth[:, None]
                R_ki, t_ki = m.kf_R[ki], m.kf_t[ki]
                X = jnp.matmul(Xc - t_ki, m.kf_R[ki],
                               precision=jax.lax.Precision.HIGHEST)
                dist = jnp.linalg.norm(Xc, axis=1)
                sf = cfg.orb.scale_factor ** ff_.octave.astype(
                    jnp.float32)
                Ow = -jnp.matmul(R_ki.T, t_ki,
                                 precision=jax.lax.Precision.HIGHEST)
                view = X - Ow
                nrm = view / jnp.maximum(
                    jnp.linalg.norm(view, axis=1, keepdims=True), 1e-9)
                m2, pt_idx = mapstate.add_points(
                    m, X, ff_.desc, nrm,
                    dist * sf / (cfg.orb.scale_factor **
                                 (cfg.orb.n_levels - 1)),
                    dist * sf, ki, frame_id, free)
                m2 = mapstate.add_observations(
                    m2, ki, pt_idx, ff_.xy, ff_.octave, free,
                    ur=jnp.where(d_valid, d_ur, -1.0))
                kp2 = jnp.where(free, pt_idx, kp_pt)
                bank2 = fbank.set_binding(bank, ki, kp2)
                return m2, bank2, kp2

            self._stereo_new_jit = _stereo_new
        ki = self.last_kf_idx
        d = self._depth
        self.map, self.bank, kp2 = self._stereo_new_jit(
            self.map, self.bank, jnp.asarray(ki, jnp.int32), ff,
            self.kf_bindings[ki], d.ur, d.depth, d.valid,
            jnp.asarray(self.frame_id, jnp.int32))
        self.kf_bindings[ki] = kp2
