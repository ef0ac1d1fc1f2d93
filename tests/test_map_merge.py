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


class TestInertialMerge:
    def test_weld_is_rigid_and_remaps_inertial_state(self):
        """Merging an IMU-initialized (metric) map must be RIGID
        (fix_scale Sim3 — a free scale would break the preintegrated
        factors' metric dP/dV), shift the preintegration chain's KF
        indices by the merge offset, and transport velocities with the
        map (VERDICT r3 item 2 merge-side)."""
        from orbslam3_tpu.features.extractor import FeatureFrame
        from orbslam3_tpu.ops import cameras, lie
        from orbslam3_tpu.pipeline import inertial_system, map_merging
        from orbslam3_tpu.slam_map import atlas as atlas_mod
        from orbslam3_tpu.slam_map import state as mapstate

        rng = np.random.default_rng(2)
        n_pts = 200
        K4j = jnp.asarray(K4)
        N_KP = 256

        def pad_ff(xy, desc):
            n = xy.shape[0]
            pad = N_KP - n
            return FeatureFrame(
                xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]),
                               jnp.float32),
                response=jnp.ones(N_KP),
                octave=jnp.zeros(N_KP, jnp.int32), angle=jnp.zeros(N_KP),
                desc=jnp.asarray(np.concatenate(
                    [desc, np.zeros((pad, 8), np.uint32)])),
                valid=jnp.asarray(np.arange(N_KP) < n))

        def pad_bind(pt_idx):
            out = np.full(N_KP, -1, np.int32)
            out[:len(pt_idx)] = np.asarray(pt_idx)
            return jnp.asarray(out)

        X0 = np.stack([rng.uniform(-3, 3, n_pts),
                       rng.uniform(-2, 2, n_pts),
                       rng.uniform(4, 9, n_pts)], 1).astype(np.float32)
        desc0 = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
        uv0 = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X0)))

        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752), enable_loop_closing=True,
            map_capacity=mapstate.MapCapacity(n_kf=32, n_pt=4096,
                                              n_obs=16384))
        icfg = inertial_system.InertialConfig(imu_freq=200.0)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
        sys_.imu_initialized = True

        # ---- archived session: KF0 at origin observing the place
        m_old = mapstate.empty_map(cfg.map_capacity)
        m_old, k0 = mapstate.add_keyframe(m_old, jnp.eye(3), jnp.zeros(3),
                                          0.0, 0)
        m_old, pt0 = mapstate.add_points(
            m_old, jnp.asarray(X0), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0), 0, 0,
            jnp.ones(n_pts, bool))
        m_old = mapstate.add_observations(
            m_old, k0, pt0, jnp.asarray(uv0),
            jnp.zeros(n_pts, jnp.int32), jnp.ones(n_pts, bool))
        ff0 = pad_ff(uv0, desc0)
        from orbslam3_tpu.place import keyframe_db as kdb
        lc = sys_.loop_closer
        bow, _ = lc._bow(ff0.desc, ff0.valid)
        old_db = kdb.add(kdb.KeyframeDB.create(cfg.map_capacity.n_kf,
                                               lc.cfg.n_words), 0, bow)
        sys_.atlas.sessions.append(atlas_mod.MapSession(
            map=m_old, kf_features={0: ff0}, kf_bindings={0: pad_bind(pt0)},
            trajectory=[(0.0, np.eye(3), np.zeros(3))], db=old_db))

        # ---- current (inertial, metric) map: same place, rigid offset
        Rz = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.0, 0.25])))
        dtv = np.array([1.0, -0.5, 0.3], np.float32)
        X_cur = (X0 @ Rz.T + dtv).astype(np.float32)
        R_cur = jnp.asarray(Rz.T, jnp.float32)
        t_cur = jnp.asarray(-Rz.T @ dtv, jnp.float32)
        m = sys_.map
        m, kA = mapstate.add_keyframe(m, R_cur, t_cur, 10.0, 100)
        m, kB = mapstate.add_keyframe(m, R_cur, t_cur, 10.5, 101)
        m, ptc = mapstate.add_points(
            m, jnp.asarray(X_cur), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0), int(kB), 101,
            jnp.ones(n_pts, bool))
        m = mapstate.add_observations(
            m, kB, ptc, jnp.asarray(uv0),
            jnp.zeros(n_pts, jnp.int32), jnp.ones(n_pts, bool))
        vels = np.zeros((cfg.map_capacity.n_kf, 3), np.float32)
        vels[0] = [0.4, 0.1, -0.2]
        vels[1] = [0.5, 0.0, -0.1]
        m = m._replace(kf_vel=jnp.asarray(vels))
        sys_.map = m
        ffB = pad_ff(uv0, desc0)
        sys_.kf_features = {0: pad_ff(uv0[:50], desc0[:50]), 1: ffB}
        sys_.kf_bindings = {0: pad_bind(np.asarray(ptc)[:50]),
                            1: pad_bind(ptc)}
        sys_.R_cur, sys_.t_cur = R_cur, t_cur
        sys_.last_kf_idx = 1
        sys_.n_kf_host = 2
        sys_.preint_kf_pairs = [(0, 1)]
        sys_.vel = jnp.asarray(vels[1])
        sys_.last_body = sys_._cam_to_body(R_cur, t_cur)

        pt_dists_before = np.linalg.norm(
            np.asarray(m.pt_xyz[ptc][:20]) -
            np.asarray(m.pt_xyz[ptc][20:40]), axis=1)

        merged = map_merging.try_merge(sys_, ffB, 1)
        assert merged, "inertial merge did not fire"

        m2 = sys_.map
        # rigid weld: inter-point distances preserved (s == 1 exactly up
        # to f32 rounding)
        kf_off = 1
        pt_off = n_pts
        new_idx = np.asarray(ptc) + pt_off
        pt_dists_after = np.linalg.norm(
            np.asarray(m2.pt_xyz[new_idx][:20]) -
            np.asarray(m2.pt_xyz[new_idx][20:40]), axis=1)
        np.testing.assert_allclose(pt_dists_after, pt_dists_before,
                                   rtol=1e-4)
        # preint chain re-indexed by the KF offset
        assert sys_.preint_kf_pairs == [(0 + kf_off, 1 + kf_off)]
        # velocity transported with the map and mirrored to the tracker:
        # norms preserved (rigid), direction rotated by the weld rotation
        v_new = np.asarray(m2.kf_vel[kf_off:kf_off + 2])
        np.testing.assert_allclose(np.linalg.norm(v_new, axis=1),
                                   np.linalg.norm(vels[:2], axis=1),
                                   rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sys_.vel), v_new[1],
                                   atol=1e-6)
        # the welded current KF sits at the old map's place (origin-ish)
        C = -np.asarray(m2.kf_R[kf_off + 1]).T @ np.asarray(
            m2.kf_t[kf_off + 1])
        assert np.linalg.norm(C) < 0.2, C


class TestStereoMerge:
    def test_merge_preserves_stereo_ur_in_bank(self):
        """A merged stereo map's bank rebuild must restore the stereo
        right-u rows (VERDICT r4 weak #6): without them every
        bank-sourced BA after the merge sees mono residuals only and
        metric scale hangs on the merge edge alone.  Checks the bank's
        ur rows on both sides of the weld and that the post-merge window
        BA holds metric scale."""
        from orbslam3_tpu.features.extractor import FeatureFrame
        from orbslam3_tpu.ops import cameras, lie
        from orbslam3_tpu.pipeline import map_merging
        from orbslam3_tpu.slam_map import atlas as atlas_mod
        from orbslam3_tpu.slam_map import state as mapstate

        rng = np.random.default_rng(5)
        n_pts = 200
        K4j = jnp.asarray(K4)
        N_KP = 256
        fx, baseline = K4[0], 0.11
        bf = fx * baseline

        def pad_ff(xy, desc):
            n = xy.shape[0]
            pad = N_KP - n
            return FeatureFrame(
                xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]),
                               jnp.float32),
                response=jnp.ones(N_KP),
                octave=jnp.zeros(N_KP, jnp.int32), angle=jnp.zeros(N_KP),
                desc=jnp.asarray(np.concatenate(
                    [desc, np.zeros((pad, 8), np.uint32)])),
                valid=jnp.asarray(np.arange(N_KP) < n))

        def pad_bind(pt_idx):
            out = np.full(N_KP, -1, np.int32)
            out[:len(pt_idx)] = np.asarray(pt_idx)
            return jnp.asarray(out)

        def pad_ur(uv, z):
            out = np.full(N_KP, -1.0, np.float32)
            out[:len(uv)] = uv[:, 0] - bf / z
            return jnp.asarray(out)

        X0 = np.stack([rng.uniform(-3, 3, n_pts),
                       rng.uniform(-2, 2, n_pts),
                       rng.uniform(4, 9, n_pts)], 1).astype(np.float32)
        desc0 = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
        uv0 = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X0)))
        ur0 = uv0[:, 0] - bf / X0[:, 2]

        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752), enable_loop_closing=True,
            stereo_bf=bf,
            map_capacity=mapstate.MapCapacity(n_kf=32, n_pt=4096,
                                              n_obs=16384))
        sys_ = slam_system.System(cfg)

        # ---- archived stereo session: KF0 at origin
        m_old = mapstate.empty_map(cfg.map_capacity)
        m_old, k0 = mapstate.add_keyframe(m_old, jnp.eye(3), jnp.zeros(3),
                                          0.0, 0)
        m_old, pt0 = mapstate.add_points(
            m_old, jnp.asarray(X0), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0), 0, 0,
            jnp.ones(n_pts, bool))
        m_old = mapstate.add_observations(
            m_old, k0, pt0, jnp.asarray(uv0),
            jnp.zeros(n_pts, jnp.int32), jnp.ones(n_pts, bool),
            ur=jnp.asarray(ur0))
        ff0 = pad_ff(uv0, desc0)
        from orbslam3_tpu.place import keyframe_db as kdb
        lc = sys_.loop_closer
        bow, _ = lc._bow(ff0.desc, ff0.valid)
        old_db = kdb.add(kdb.KeyframeDB.create(cfg.map_capacity.n_kf,
                                               lc.cfg.n_words), 0, bow)
        sys_.atlas.sessions.append(atlas_mod.MapSession(
            map=m_old, kf_features={0: ff0},
            kf_bindings={0: pad_bind(pt0)},
            trajectory=[(0.0, np.eye(3), np.zeros(3))], db=old_db,
            kf_ur={0: pad_ur(uv0, X0[:, 2])}))

        # ---- current stereo map: same place, rigid offset
        Rz = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.0, 0.25])))
        dtv = np.array([1.0, -0.5, 0.3], np.float32)
        R_cur = jnp.asarray(Rz.T, jnp.float32)
        t_cur = jnp.asarray(-Rz.T @ dtv, jnp.float32)
        X_cur = (X0 @ Rz.T + dtv).astype(np.float32)
        m = sys_.map
        m, kA = mapstate.add_keyframe(m, R_cur, t_cur, 10.0, 100)
        m, kB = mapstate.add_keyframe(m, R_cur, t_cur, 10.5, 101)
        m, ptc = mapstate.add_points(
            m, jnp.asarray(X_cur), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0), int(kB), 101,
            jnp.ones(n_pts, bool))
        m = mapstate.add_observations(
            m, kB, ptc, jnp.asarray(uv0),
            jnp.zeros(n_pts, jnp.int32), jnp.ones(n_pts, bool),
            ur=jnp.asarray(ur0))
        sys_.map = m
        ffB = pad_ff(uv0, desc0)
        sys_.kf_features = {0: pad_ff(uv0[:50], desc0[:50]), 1: ffB}
        sys_.kf_bindings = {0: pad_bind(np.asarray(ptc)[:50]),
                            1: pad_bind(ptc)}
        sys_.kf_ur = {0: pad_ur(uv0[:50], X0[:50, 2]),
                      1: pad_ur(uv0, X0[:, 2])}
        sys_.R_cur, sys_.t_cur = R_cur, t_cur
        sys_.last_kf_idx = 1
        sys_.n_kf_host = 2
        sys_._ensure_bank(ffB)

        merged = map_merging.try_merge(sys_, ffB, 1)
        assert merged, "stereo merge did not fire"

        kf_off = 1
        # stereo rows restored on BOTH sides of the weld
        ur_old = np.asarray(sys_.bank.ur[0])
        ur_cur = np.asarray(sys_.bank.ur[1 + kf_off])
        assert (ur_old > 0).sum() >= n_pts * 0.9, \
            "archived session's bank rows lost their stereo ur"
        assert (ur_cur > 0).sum() >= n_pts * 0.9, \
            "current session's bank rows lost their stereo ur"
        # kf_ur host mirror re-indexed by the merge offset
        assert set(sys_.kf_ur) == {0, kf_off, 1 + kf_off}
        # post-merge window BA (bank-sourced) holds metric scale: the
        # stereo residuals anchor it even with the merge edge gone
        m3 = sys_.map._replace(loop_valid=jnp.zeros_like(
            sys_.map.loop_valid))
        m3 = sys_._local_ba(m3, jnp.asarray(sys_.last_kf_idx, jnp.int32),
                            sys_.bank)
        pt_off = n_pts
        new_idx = np.asarray(ptc) + pt_off
        d_before = np.linalg.norm(
            np.asarray(sys_.map.pt_xyz[new_idx][:20]) -
            np.asarray(sys_.map.pt_xyz[new_idx][20:40]), axis=1)
        d_after = np.linalg.norm(
            np.asarray(m3.pt_xyz[new_idx][:20]) -
            np.asarray(m3.pt_xyz[new_idx][20:40]), axis=1)
        s = np.median(d_after / np.maximum(d_before, 1e-9))
        assert abs(s - 1.0) < 0.02, f"post-merge BA rescaled: {s}"
