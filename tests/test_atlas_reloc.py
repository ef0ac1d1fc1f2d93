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


class TestRelocCandidateRule:
    def test_admits_candidates_below_rank_3(self):
        """Candidate admission must follow the reference's
        0.75*bestScore cut over ALL scored keyframes
        (src/KeyFrameDatabase.cc:731), not a fixed top-3: with aliased
        places the true candidate can sit at rank 4+."""
        from orbslam3_tpu.ops import cameras
        from orbslam3_tpu.pipeline import loop_closing, relocalization

        rng = np.random.default_rng(42)
        n_desc = 200
        K4j = jnp.asarray(K4)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW,
            map_capacity=mapstate.MapCapacity(n_kf=16, n_pt=4096,
                                              n_obs=16384))
        sys_ = slam_system.System(cfg)
        lc = loop_closing.LoopCloser(
            loop_closing.LoopConfig(), cfg.map_capacity.n_kf)
        m = sys_.map

        def pad_ff(xy, desc, n_cap=N_KP):
            n = xy.shape[0]
            pad = n_cap - n
            return FeatureFrame(
                xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]),
                               jnp.float32),
                response=jnp.ones(n_cap),
                octave=jnp.zeros(n_cap, jnp.int32),
                angle=jnp.zeros(n_cap),
                desc=jnp.asarray(np.concatenate(
                    [desc, np.zeros((pad, 8), np.uint32)])),
                valid=jnp.asarray(np.arange(n_cap) < n))

        # family of descriptors shared by the ALIASED keyframes
        fam = rng.integers(0, 2 ** 32, (n_desc, 8), dtype=np.uint32)
        # true place: 85% of the family words + 15% distinct -> its
        # TF-IDF score lands BELOW the aliased keyframes (rank 4+) but
        # above the 0.75*best admission line
        n_shared = int(0.85 * n_desc)
        true_desc = fam.copy()
        true_desc[n_shared:] = rng.integers(
            0, 2 ** 32, (n_desc - n_shared, 8), dtype=np.uint32)

        # true 3D scene observed by the query at identity
        X0 = np.stack([rng.uniform(-3, 3, n_desc),
                       rng.uniform(-2, 2, n_desc),
                       rng.uniform(4, 9, n_desc)], 1).astype(np.float32)
        uv0 = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X0)))

        # aliased keyframes 0..2: same family words, RANDOM geometry
        for k in range(3):
            Xk = np.stack([rng.uniform(-3, 3, n_desc) + 50 * (k + 1),
                           rng.uniform(-2, 2, n_desc),
                           rng.uniform(4, 9, n_desc)], 1).astype(np.float32)
            Rk, tk = jnp.eye(3), jnp.asarray([-50.0 * (k + 1), 0, 0])
            uvk = np.asarray(cameras.pinhole_project(
                K4j, lie.se3_apply(Rk, tk, jnp.asarray(Xk))))
            m, kk = mapstate.add_keyframe(m, Rk, tk, float(k), k)
            m, ptk = mapstate.add_points(
                m, jnp.asarray(Xk), jnp.asarray(fam),
                jnp.tile(jnp.array([0.0, 0, 1]), (n_desc, 1)),
                jnp.full(n_desc, 1.0), jnp.full(n_desc, 99.0),
                int(kk), k, jnp.ones(n_desc, bool))
            ffk = pad_ff(uvk, fam)
            sys_.kf_features[int(kk)] = ffk
            sys_.kf_bindings[int(kk)] = jnp.asarray(np.concatenate(
                [np.asarray(ptk), np.full(N_KP - n_desc, -1)]
            ).astype(np.int32))
            # mirror into the device bank (the batched reloc program
            # gathers candidate features from it)
            sys_._bank_store(int(kk), ffk, sys_.kf_bindings[int(kk)])
            lc.add_keyframe(m, int(kk), ffk)

        # the TRUE place keyframe (rank 4 by score)
        Rt, tt = jnp.eye(3), jnp.zeros(3)
        m, kt = mapstate.add_keyframe(m, Rt, tt, 3.0, 3)
        m, pt_t = mapstate.add_points(
            m, jnp.asarray(X0), jnp.asarray(true_desc),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_desc, 1)),
            jnp.full(n_desc, 1.0), jnp.full(n_desc, 99.0),
            int(kt), 3, jnp.ones(n_desc, bool))
        ff_t = pad_ff(uv0, true_desc)
        sys_.kf_features[int(kt)] = ff_t
        sys_.kf_bindings[int(kt)] = jnp.asarray(np.concatenate(
            [np.asarray(pt_t), np.full(N_KP - n_desc, -1)]
        ).astype(np.int32))
        sys_._bank_store(int(kt), ff_t, sys_.kf_bindings[int(kt)])
        lc.add_keyframe(m, int(kt), ff_t)
        sys_.map = m

        # query: the FAMILY descriptors (shares all words with the
        # aliased keyframes, only 85% with the true place) at the true
        # place's pixels
        ff_q = pad_ff(uv0, fam)
        from orbslam3_tpu.place import keyframe_db as kdb_mod
        bow, _ = lc._bow(ff_q.desc, ff_q.valid)
        scores, _ = kdb_mod.query(lc.db, bow)
        order = np.argsort(-np.asarray(scores))
        true_rank = int(np.where(order == int(kt))[0][0])
        assert true_rank >= 3, \
            f"aliased construction failed: true place at rank {true_rank}"
        best = float(np.asarray(scores)[order[0]])
        assert float(np.asarray(scores)[int(kt)]) >= 0.75 * best, \
            "true place fell below the admission line"

        ok, R, t = relocalization.attempt_relocalization(sys_, ff_q, lc)
        assert ok, "relocalization failed despite true place admitted"
        # recovered pose ~ identity (the true place's camera)
        assert float(jnp.linalg.norm(t)) < 0.1, float(jnp.linalg.norm(t))


class TestCheckpointResume:
    def test_session_resumes_tracking_and_reloc(self):
        """Full save/load_system round trip: a FRESH System restored
        from the checkpoint must keep tracking (host keyframe mirrors
        resynced — a stale n_kf_host would overwrite live KF slots) and
        immediately relocalize against the loaded map (the reference's
        LoadAtlas KeyFrameDatabase re-encode)."""
        world = SyntheticWorld(seed=9)
        poses = camera_path(60)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=HW, min_init_matches=80,
            max_frames_between_kf=6, ba_caps=(24, 4096, 16384),
            enable_relocalization=True)
        sys_ = slam_system.System(cfg)
        for i in range(24):
            R_cw, t_cw, _ = poses[i]
            sys_.track_monocular(None, ts=i * 0.05,
                                 features=world.frame(R_cw, t_cw))
        assert sys_.state == slam_system.OK
        nk = sys_.n_kf_host
        assert nk >= 3

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt.npz")
            checkpoint.save_system(p, sys_)
            sys2 = slam_system.System(cfg)
            checkpoint.load_system(p, sys2)

        assert sys2.n_kf_host == nk
        assert abs(sys2.last_kf_ts - sys_.last_kf_ts) < 1e-5
        assert sys2.state == slam_system.OK
        # continued tracking: new frames must NOT overwrite old KF slots
        for i in range(24, 36):
            R_cw, t_cw, _ = poses[i]
            st, _ = sys2.track_monocular(None, ts=i * 0.05,
                                         features=world.frame(R_cw, t_cw))
        assert sys2.state == slam_system.OK
        assert sys2.n_resets == 0
        assert sys2.n_kf_host >= nk
        # the first nk keyframe timestamps are intact (no slot reuse)
        np.testing.assert_array_equal(
            np.asarray(sys2.map.kf_ts[:nk]), np.asarray(sys_.map.kf_ts[:nk]))
        # relocalization against the restored DB: fresh system + load,
        # feed a frame from a mapped viewpoint with no motion prior
        sys3 = slam_system.System(cfg)
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "ckpt.npz")
            checkpoint.save_system(p, sys_)
            checkpoint.load_system(p, sys3)
        from orbslam3_tpu.pipeline import relocalization
        R_cw, t_cw, _ = poses[10]
        ok, R, t = relocalization.attempt_relocalization(
            sys3, world.frame(R_cw, t_cw), sys3.loop_closer)
        assert ok, "relocalization failed against the restored database"
        # recovered pose must match the ORIGINAL session's estimate at
        # that timestamp (the map frame is the init-normalized one, not
        # the GT world)
        ref = next(e for e in sys_.trajectory
                   if abs(e[0] - 10 * 0.05) < 1e-6)
        center = -jnp.asarray(R).T @ t
        assert float(jnp.linalg.norm(
            center - jnp.asarray(ref[2]))) < 0.05
