"""Tracking ∥ mapping overlap: the async KF pipeline must track the same
trajectory as the synchronous engine.

Reference analogue: System::System spawns LocalMapping on its own thread
(src/System.cc:113) and Tracking keeps consuming frames while the mapper
optimizes; here KF culling + local BA run as an independent device chain
against the post-insert snapshot and are swapped in when ready
(System._merge_pending).  The immutable MapState makes the overlap
race-free by construction.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_tpu.ops import align
from orbslam3_tpu.pipeline import system as slam_system
from test_pipeline_e2e import HW, K4, SyntheticWorld, camera_path


def _run(async_mapping: bool, n_frames: int = 48, seed: int = 7):
    world = SyntheticWorld(seed=seed)
    poses = camera_path(n_frames)
    cfg = slam_system.SlamConfig(
        cam_params=K4, image_hw=HW, min_init_matches=80,
        max_frames_between_kf=6, async_mapping=async_mapping)
    sys_ = slam_system.System(cfg)
    for i, (R_cw, t_cw, _) in enumerate(poses):
        ff = world.frame(R_cw, t_cw)
        sys_.track_monocular(None, ts=i * 0.05, features=ff)
    assert sys_.state == slam_system.OK, f"state={sys_.state}"
    assert sys_.n_resets == 0
    est = np.stack([p[2] for p in sys_.trajectory])
    ts_used = [p[0] for p in sys_.trajectory]
    gt = np.stack([poses[int(round(t / 0.05))][2] for t in ts_used])
    rmse, _, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
    return sys_, float(rmse)


class TestAsyncMapping:
    def test_async_tracks_like_sync(self):
        sys_a, rmse_a = _run(async_mapping=True)
        _, rmse_s = _run(async_mapping=False)
        # both accurate in absolute terms; async may differ slightly
        # (tracking between a KF and its swap-in sees pre-BA points,
        # exactly like the reference's tracking thread)
        assert rmse_s < 0.05, rmse_s
        assert rmse_a < 0.06, rmse_a
        # nothing left dangling at the end of the run
        assert sys_a._pending is None or sys_a._merge_pending(force=True) \
            is None
        # keyframes actually went through the async path
        assert sys_a.n_kf_host >= 6

    def test_async_survives_reset_and_loss(self):
        """Loss handling force-merges the pending optimization before
        attempting relocalization (no stale-map reloc)."""
        world = SyntheticWorld(seed=3)
        poses = camera_path(40)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, async_mapping=True)
        sys_ = slam_system.System(cfg)
        blank = None
        for i, (R_cw, t_cw, _) in enumerate(poses):
            if 24 <= i < 26:
                # two-frame blackout right after a keyframe: the pending
                # BA is in flight when tracking fails
                if blank is None:
                    ff0 = world.frame(R_cw, t_cw)
                    blank = ff0._replace(valid=jnp.zeros_like(ff0.valid))
                sys_.track_monocular(None, ts=i * 0.05, features=blank)
                continue
            ff = world.frame(R_cw, t_cw)
            sys_.track_monocular(None, ts=i * 0.05, features=ff)
        # recovered (reloc or RECENTLY_LOST patience) without dangling state
        assert sys_.state == slam_system.OK
        assert sys_._pending is None
