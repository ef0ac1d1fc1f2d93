"""Relocalization, Atlas archiving/merging, checkpointing, georeferencing."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.features.extractor import FeatureFrame
from orbslam3_tpu.geometry import georef
from orbslam3_tpu.ops import lie
from orbslam3_tpu.pipeline import system as slam_system
from orbslam3_tpu.slam_map import atlas, checkpoint, state as mapstate
from test_pipeline_e2e import HW, K4, N_KP, SyntheticWorld, camera_path


def blank_frame():
    return FeatureFrame(
        xy=jnp.zeros((N_KP, 2)), response=jnp.zeros(N_KP),
        octave=jnp.zeros(N_KP, jnp.int32), angle=jnp.zeros(N_KP),
        desc=jnp.zeros((N_KP, 8), jnp.uint32), valid=jnp.zeros(N_KP, bool))


class TestRelocalization:
    def test_recover_after_occlusion(self):
        world = SyntheticWorld(seed=7)
        poses = camera_path(50, speed=0.05)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384),
            enable_loop_closing=True, reloc_patience=12)
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            if 25 <= i < 31:
                ff = blank_frame()          # occlusion: no features
            else:
                ff = world.frame(R_cw, t_cw)
            st, _ = sys_.track_monocular(None, ts=i * 0.05, features=ff)
        assert sys_.n_resets == 0, sys_.n_resets
        assert sys_.state == slam_system.OK, sys_.state


class TestAtlas:
    def test_sessions_archived_on_reset(self):
        world = SyntheticWorld(seed=8)
        poses = camera_path(40, speed=0.05)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384),
            reloc_patience=2)
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            if 20 <= i < 40:
                # permanent scene change -> forced loss -> new map
                ff = world.frame(R_cw + 0 * R_cw, t_cw + 50.0)
            else:
                ff = world.frame(R_cw, t_cw)
            sys_.track_monocular(None, ts=i * 0.05, features=ff)
        assert sys_.n_resets >= 1
        assert sys_.atlas.n_maps >= 1
        old = sys_.atlas.sessions[0]
        assert int(old.map.n_kf) >= 2
        assert len(old.trajectory) > 0

    def test_merge_maps_concatenates_and_transforms(self):
        cap = mapstate.MapCapacity(n_kf=16, n_pt=512, n_obs=2048)
        m1 = mapstate.empty_map(cap)
        m2 = mapstate.empty_map(cap)
        key = jax.random.PRNGKey(0)
        X = jax.random.normal(key, (40, 3)) + jnp.array([0.0, 0.0, 5.0])
        m1, k0 = mapstate.add_keyframe(m1, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        m1, p1 = mapstate.add_points(
            m1, X, jnp.zeros((40, 8), jnp.uint32), jnp.zeros((40, 3)),
            jnp.ones(40), jnp.full(40, 10.0), 0, 0, jnp.ones(40, bool))
        # map 2 = same scene in a drifted frame x2 = (x1 - tg)/s @ Rg
        Rg = lie.exp_so3(jnp.array([0.1, -0.05, 0.2]))
        tg = jnp.array([1.0, 2.0, -0.5])
        s = jnp.asarray(1.3)
        Rg_i, tg_i, s_i = lie.sim3_inverse(Rg, tg, s)
        X2 = lie.sim3_apply(Rg_i, tg_i, s_i, X)
        m2, _ = mapstate.add_keyframe(m2, jnp.eye(3), jnp.zeros(3), 1.0, 1)
        m2, p2 = mapstate.add_points(
            m2, X2, jnp.zeros((40, 8), jnp.uint32), jnp.zeros((40, 3)),
            jnp.ones(40), jnp.full(40, 10.0), 0, 1, jnp.ones(40, bool))
        merged, kf_off, pt_off = atlas.merge_maps(m1, m2, Rg, tg, s, cap)
        assert merged is not None
        assert int(merged.n_kf) == 2 and int(merged.n_pt) == 80
        # transformed new-map points must coincide with originals
        Xm = merged.pt_xyz[pt_off:pt_off + 40]
        np.testing.assert_allclose(np.asarray(Xm), np.asarray(X), atol=1e-4)

    def test_merge_overflow_rejected(self):
        cap = mapstate.MapCapacity(n_kf=2, n_pt=32, n_obs=64)
        m1 = mapstate.empty_map(cap)
        m2 = mapstate.empty_map(cap)
        m1, _ = mapstate.add_keyframe(m1, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        m1, _ = mapstate.add_keyframe(m1, jnp.eye(3), jnp.zeros(3), 1.0, 1)
        m2, _ = mapstate.add_keyframe(m2, jnp.eye(3), jnp.zeros(3), 2.0, 2)
        merged, _, _ = atlas.merge_maps(
            m1, m2, jnp.eye(3), jnp.zeros(3), jnp.asarray(1.0), cap)
        assert merged is None


class TestCheckpoint:
    def test_map_roundtrip(self):
        cap = mapstate.MapCapacity(n_kf=8, n_pt=64, n_obs=256)
        m = mapstate.empty_map(cap)
        m, _ = mapstate.add_keyframe(m, lie.exp_so3(jnp.array([0.1, 0, 0])),
                                     jnp.array([1.0, 2, 3]), 5.0, 7)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "map.npz")
            checkpoint.save_map(p, m)
            m2 = checkpoint.load_map(p)
        for a, b in zip(m, m2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGeoref:
    def test_umeyama_georeference(self):
        rng = np.random.default_rng(0)
        slam = rng.normal(size=(30, 3)).astype(np.float32) * 5
        Rg = np.asarray(lie.exp_so3(jnp.array([0.0, 0.0, 0.7])))
        s, t = 12.0, np.array([1000.0, 2000.0, 30.0])
        gnss = s * slam @ Rg.T + t
        ref = georef.GeometricReferencer(min_kfs=10)
        for a, b in zip(slam, gnss):
            ref.add_fix(a, b)
        T = ref.update()
        assert T is not None and ref.initialized
        out = np.asarray(ref.apply(jnp.asarray(slam)))
        np.testing.assert_allclose(out, gnss, atol=1e-2)

    def test_wgs84_conversion(self):
        x, y = georef.wgs84_to_epsg3857(np.array([0.0]), np.array([0.0]))
        assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
        x, y = georef.wgs84_to_epsg3857(np.array([45.0]), np.array([90.0]))
        assert x[0] > 1e6 and y[0] > 1e6


class TestViz:
    def test_map_plot_export(self, tmp_path):
        from orbslam3_tpu import viz
        world = SyntheticWorld(seed=9)
        poses = camera_path(20, speed=0.05)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384))
        sys_ = slam_system.System(cfg)
        for i, (R_cw, t_cw, _) in enumerate(poses):
            sys_.track_monocular(None, ts=i * 0.05,
                                 features=world.frame(R_cw, t_cw))
        p = viz.plot_map(sys_, str(tmp_path / "map.png"))
        assert os.path.getsize(p) > 10000
        ff = world.frame(*poses[-1][:2])
        img = np.zeros(HW, np.uint8)
        p2 = viz.plot_frame(img, ff, sys_.kf_bindings.get(
            sys_.last_kf_idx, jnp.full(ff.xy.shape[0], -1)),
            str(tmp_path / "frame.png"))
        assert os.path.getsize(p2) > 10000
        # covisibility graph: consecutive KFs share points in this world
        edges = viz.covisibility_edges(sys_, min_weight=15)
        assert len(edges) >= sys_.n_kf_host - 2, len(edges)
        # step-by-step mode exports per-frame + periodic map snapshots
        sv = viz.StepViewer(str(tmp_path / "steps"), map_every=2)
        outs = sv.on_frame(sys_, img, ff)
        assert len(outs) == 2 and all(os.path.getsize(o) > 5000
                                      for o in outs)
