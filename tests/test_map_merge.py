"""Multi-session Atlas: lose tracking, start a new map, revisit, merge."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import align
from orbslam3_tpu.pipeline import system as slam_system
from test_atlas_reloc import blank_frame
from test_pipeline_e2e import HW, K4, SyntheticWorld, camera_path


class TestMapMerge:
    def test_sessions_weld_on_revisit(self):
        world = SyntheticWorld(seed=13)
        n = 80
        poses = camera_path(n, speed=0.05)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384),
            enable_loop_closing=True, reloc_patience=2)
        sys_ = slam_system.System(cfg)
        # disable in-map relocalization so the occlusion forces a RESET and
        # a genuinely new map (we want the merge path, not reloc)
        import orbslam3_tpu.pipeline.system as sysmod
        orig = sys_._handle_tracking_loss
        sys_._handle_tracking_loss = lambda ff: False

        for i, (R_cw, t_cw, _) in enumerate(poses):
            if 30 <= i < 34:
                ff = blank_frame()     # occlusion -> reset -> new session
            else:
                ff = world.frame(R_cw, t_cw)
            sys_.track_monocular(None, ts=i * 0.05, features=ff)
        assert sys_.n_resets >= 1
        # the new session overlaps the old region -> merge must have fired
        assert sys_.atlas.n_maps == 0, \
            f"merge did not consume the archived session ({sys_.atlas.n_maps})"
        assert sys_.state == slam_system.OK
        n_kf = int(jnp.sum(sys_.map.kf_valid))
        assert n_kf >= 8, n_kf   # keyframes from both sessions
        # merged trajectory spans both sessions and matches ground truth
        est = np.stack([p[2] for p in sys_.trajectory])
        ts_used = [p[0] for p in sys_.trajectory]
        gt = np.stack([poses[int(round(t / 0.05))][2] for t in ts_used])
        assert len(est) > n * 0.7
        rmse, s, _, _ = align.ate_rmse(jnp.asarray(est), jnp.asarray(gt))
        assert float(rmse) < 0.08, float(rmse)
