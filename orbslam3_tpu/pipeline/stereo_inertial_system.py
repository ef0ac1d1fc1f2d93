"""Stereo-inertial SLAM system (the TUM-VI room configuration class).

Composition of the stereo front-end (instant metric init, depth-based
point creation, uR residuals) with the inertial machinery (preintegration,
IMU prediction, gravity/bias initialization with FIXED scale — the
reference passes bFixedScale for stereo-inertial InertialOptimization,
src/Optimizer.cc:2964 — and the VI window BA).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..features.extractor import FeatureFrame
from . import inertial_system, stereo_system, system as base


class StereoInertialSystem(inertial_system.InertialSystem):
    imu_fix_scale = True   # stereo fixes the scale; IMU solves gravity/bias

    def __init__(self, config: base.SlamConfig,
                 icfg: inertial_system.InertialConfig,
                 scfg: stereo_system.StereoConfig):
        super().__init__(config, icfg)
        self.scfg = scfg
        stereo_system.StereoSystem._build_stereo_jits(self, config, scfg)

    # borrow the stereo front-end pieces
    _stereo_initialize = stereo_system.StereoSystem._stereo_initialize
    _frame_kp_ur = stereo_system.StereoSystem._frame_kp_ur
    _depth_rays = stereo_system.StereoSystem._depth_rays

    def _insert_keyframe(self, ff, tr, ts, n_inl=None):
        super()._insert_keyframe(ff, tr, ts, n_inl=n_inl)
        # depth-based new points (same post-step as StereoSystem)
        stereo_system.StereoSystem._stereo_new_points(self, ff)
        self._refresh_view()

    def track_stereo(self, img_l, img_r, ts: float,
                     features_l: FeatureFrame | None = None,
                     features_r: FeatureFrame | None = None):
        ff_l = features_l if features_l is not None else self._extract(img_l)
        ff_r = features_r if features_r is not None else self._extract(img_r)
        self._depth = self._stereo_jit(ff_l, ff_r)
        if img_l is not None and img_r is not None:
            # subpixel SSD disparity refinement (Frame::ComputeStereoMatches
            # parity) — integer-keypoint disparities alone corrupt metric
            # scale at large baseline-to-depth ratios
            self._depth = self._refine_jit(img_l, img_r, ff_l.xy,
                                           self._depth)
        self._frame_rows = self._interval_rows(
            self.last_frame_ts, ts)
        self.last_frame_ts = ts
        self.frame_id += 1

        if self.state in (base.NO_IMAGES_YET, base.NOT_INITIALIZED):
            self._stereo_initialize(ff_l, ts)
            if self.state == base.OK:
                self.last_body = self._cam_to_body(self.R_cur, self.t_cur)
        elif self.state in (base.OK, base.RECENTLY_LOST):
            self._track_frame(ff_l, ts)

        if self.state == base.OK:
            Rwc = np.asarray(self.R_cur).T
            twc = -Rwc @ np.asarray(self.t_cur)
            self.trajectory.append((ts, Rwc, twc))
            return self.state, (Rwc, twc)
        return self.state, None
