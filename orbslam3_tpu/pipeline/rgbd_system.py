"""RGB-D SLAM system: depth-image sensor mode on the stereo pipeline.

Parity target: the reference System enum declares an RGBD sensor
(/root/reference/include/System.h:61-68; the fork exposes only
TrackMonocular but the stereo/RGBD branches survive in the shared
routines — SURVEY §0).  Upstream ORB-SLAM3's RGBD path converts the
depth image into a VIRTUAL RIGHT COORDINATE per keypoint,
``ur = u - bf / d`` (Frame::ComputeStereoFromRGBD), after which the
whole system — instant metric initialization, depth-based point
creation, the third stereo residual row in BA, fixed-scale Sim3 at loop
closure — is the stereo path.  We do exactly that: sample the depth
image at keypoint pixels, synthesize a ``StereoDepth``, and reuse
``StereoSystem`` unchanged.

TPU design: the depth sample is one gather over the (H, W) depth plane
fused into the same program as the validity gating; no per-keypoint
host loop.  The "baseline" of the virtual rig is a free parameter (the
reference reads Camera.bf from the config); it only sets the
ur-residual's scale sensitivity, not the geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..features.extractor import FeatureFrame
from ..features.stereo import StereoDepth
from . import stereo_system


class RGBDSystem(stereo_system.StereoSystem):
    def __init__(self, config, scfg: stereo_system.StereoConfig):
        super().__init__(config, scfg)
        fx = float(config.cam_params[0])
        bf = fx * scfg.baseline
        # the BA's stereo residual scales by cfg.stereo_bf while the
        # virtual ur here scales by fx*baseline — they must be the SAME
        # quantity (reference Camera.bf feeds both) or ur residuals are
        # silently mis-weighted
        if abs(config.stereo_bf - bf) > 1e-4 * max(bf, 1.0):
            raise ValueError(
                f"RGBDSystem: config.stereo_bf={config.stereo_bf} != "
                f"fx*baseline={bf}; set stereo_bf=fx*baseline")
        max_depth = scfg.max_depth_factor * scfg.baseline * 3

        @jax.jit
        def _depth_from_image(ff: FeatureFrame, depth_img: jnp.ndarray):
            H, W = depth_img.shape
            # nearest-pixel sample (reference uses cvRound on the
            # keypoint coordinates, Frame::ComputeStereoFromRGBD)
            u = jnp.clip(jnp.round(ff.xy[:, 0]).astype(jnp.int32), 0, W - 1)
            v = jnp.clip(jnp.round(ff.xy[:, 1]).astype(jnp.int32), 0, H - 1)
            z = depth_img[v, u]
            ok = ff.valid & jnp.isfinite(z) & (z > 0.0) & (z < max_depth)
            ur = ff.xy[:, 0] - bf / jnp.maximum(z, 1e-6)
            return StereoDepth(ur=jnp.where(ok, ur, -1.0),
                               depth=jnp.where(ok, z, 0.0),
                               valid=ok)

        self._rgbd_depth_jit = _depth_from_image

    # ------------------------------------------------------------------ api
    def track_rgbd(self, img, depth, ts: float,
                   features: FeatureFrame | None = None):
        """One RGB-D frame: grayscale/RGB image (or precomputed features)
        plus a metric depth image aligned to it."""
        ff = features if features is not None else self._extract(img)
        self._depth = self._rgbd_depth_jit(
            ff, jnp.asarray(depth, jnp.float32))
        return self._track_with_depth(ff, ts)
