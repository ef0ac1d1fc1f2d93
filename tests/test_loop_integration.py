"""Loop-closing integration: a drifted revisit gets detected and corrected."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.features.extractor import FeatureFrame
from orbslam3_tpu.ops import cameras, lie
from orbslam3_tpu.pipeline import loop_closing, system as slam_system
from orbslam3_tpu.slam_map import state as mapstate

K4 = (458.654, 457.296, 367.215, 248.375)
K4j = jnp.asarray(K4)
N_KP = 256


def pad_binding(pt_idx, n_cap=N_KP):
    n = pt_idx.shape[0]
    out = np.full(n_cap, -1, np.int32)
    out[:n] = np.asarray(pt_idx)
    return jnp.asarray(out)


def make_ff(xy, desc, n_cap=N_KP):
    n = xy.shape[0]
    pad = n_cap - n
    return FeatureFrame(
        xy=jnp.asarray(np.concatenate([xy, np.zeros((pad, 2))]), jnp.float32),
        response=jnp.ones(n_cap),
        octave=jnp.zeros(n_cap, jnp.int32),
        angle=jnp.zeros(n_cap),
        desc=jnp.asarray(np.concatenate([desc, np.zeros((pad, 8),
                                                        np.uint32)])),
        valid=jnp.asarray(np.arange(n_cap) < n))


class TestLoopIntegration:
    def test_detect_and_correct_drifted_revisit(self):
        rng = np.random.default_rng(0)
        n_pts = 200
        # the "place": landmarks in front of the origin
        X0 = np.stack([rng.uniform(-3, 3, n_pts),
                       rng.uniform(-2, 2, n_pts),
                       rng.uniform(4, 9, n_pts)], 1).astype(np.float32)
        desc0 = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)

        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752), enable_loop_closing=False,
            map_capacity=mapstate.MapCapacity(n_kf=32, n_pt=4096, n_obs=16384))
        sys_ = slam_system.System(cfg)
        m = sys_.map

        # KF0 at origin observing the place (true positions)
        R0, t0 = jnp.eye(3), jnp.zeros(3)
        uv0 = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X0)))
        m, k0 = mapstate.add_keyframe(m, R0, t0, 0.0, 0)
        m, pt0 = mapstate.add_points(
            m, jnp.asarray(X0), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0),
            0, 0, jnp.ones(n_pts, bool))
        m = mapstate.add_observations(m, k0, pt0, jnp.asarray(uv0),
                                      jnp.zeros(n_pts, jnp.int32),
                                      jnp.ones(n_pts, bool))
        ff0 = make_ff(uv0, desc0)
        sys_.kf_features[0] = ff0
        sys_.kf_bindings[0] = pad_binding(pt0)

        # intermediate KFs elsewhere (exploring), with their own landmarks
        n_mid = 14
        for k in range(1, n_mid + 1):
            Xk = np.stack([rng.uniform(-3, 3, 60) + 10 * k,
                           rng.uniform(-2, 2, 60),
                           rng.uniform(4, 9, 60)], 1).astype(np.float32)
            dk = rng.integers(0, 2 ** 32, (60, 8), dtype=np.uint32)
            Rk = jnp.eye(3)
            tk = jnp.asarray([-10.0 * k, 0, 0])
            uvk = np.asarray(cameras.pinhole_project(
                K4j, lie.se3_apply(Rk, tk, jnp.asarray(Xk))))
            m, kk = mapstate.add_keyframe(m, Rk, tk, float(k), k)
            m, ptk = mapstate.add_points(
                m, jnp.asarray(Xk), jnp.asarray(dk),
                jnp.tile(jnp.array([0.0, 0, 1]), (60, 1)),
                jnp.full(60, 1.0), jnp.full(60, 30.0), int(kk), k,
                jnp.ones(60, bool))
            m = mapstate.add_observations(m, kk, ptk, jnp.asarray(uvk),
                                          jnp.zeros(60, jnp.int32),
                                          jnp.ones(60, bool))
            sys_.kf_features[int(kk)] = make_ff(uvk, dk)
            sys_.kf_bindings[int(kk)] = pad_binding(ptk)

        # revisit KF: physically back at origin, but pose estimate drifted
        # by (ds scale, dt translation); its map points are NEW duplicates
        # triangulated in the drifted frame.
        ds = 1.12
        dtv = np.array([0.6, -0.3, 0.2], np.float32)
        # drifted world: x' = ds * x + dtv  (what the drifted SLAM believes)
        X_dup = (ds * X0[:150] + dtv).astype(np.float32)
        # drifted camera pose consistent with the same pixels:
        #   true camera at origin sees X0; drifted camera (R=I, t) must
        #   satisfy proj(X_dup + t) == proj(X0) -> t = -dtv ... with scale
        #   the camera frame is scaled: Xc' = ds*X0 -> same pixels.
        R_rev = jnp.eye(3)
        t_rev = jnp.asarray(-dtv)
        kf_rev = n_mid + 1
        uv_rev = uv0[:150]
        desc_rev = desc0[:150].copy()
        m, kr = mapstate.add_keyframe(m, R_rev, t_rev, float(kf_rev), kf_rev)
        m, ptr = mapstate.add_points(
            m, jnp.asarray(X_dup), jnp.asarray(desc_rev),
            jnp.tile(jnp.array([0.0, 0, 1]), (150, 1)),
            jnp.full(150, 1.0), jnp.full(150, 40.0), int(kr), kf_rev,
            jnp.ones(150, bool))
        m = mapstate.add_observations(m, kr, ptr, jnp.asarray(uv_rev),
                                      jnp.zeros(150, jnp.int32),
                                      jnp.ones(150, bool))
        ff_rev = make_ff(uv_rev, desc_rev)
        sys_.kf_features[int(kr)] = ff_rev
        sys_.kf_bindings[int(kr)] = pad_binding(ptr)
        sys_.map = m
        sys_.R_cur, sys_.t_cur = R_rev, t_rev
        sys_.last_kf_idx = int(kr)

        lc = loop_closing.LoopCloser(
            loop_closing.LoopConfig(consistency_needed=0, min_kf_gap=5),
            cfg.map_capacity.n_kf)
        # register all prior keyframes in the database
        for k in range(kf_rev):
            lc.add_keyframe(sys_.map, k, sys_.kf_features[k])

        closed = lc.try_close(sys_, ff_rev, int(kr))
        assert closed, "loop not closed"
        assert lc.n_loops_closed == 1
        # after correction the revisit KF's camera center must be ~origin
        m2 = sys_.map
        C = -m2.kf_R[kr].T @ m2.kf_t[kr]
        err = float(jnp.linalg.norm(C))
        assert err < 0.15, err
        # and its duplicate points must now coincide with the originals
        d = np.asarray(m2.pt_xyz[ptr]) - X0[:150]
        assert np.linalg.norm(d, axis=1).mean() < 0.2, \
            np.linalg.norm(d, axis=1).mean()
        # the closure persisted its edge (reference KeyFrame::AddLoopEdge)
        assert int(m2.n_loop) == 1
        assert int(m2.loop_i[0]) == int(kr) and int(m2.loop_j[0]) == 0

    def test_second_closure_keeps_first_seam(self):
        """TWO loop closures: the second pose-graph solve must still contain
        the first loop edge (reference KeyFrame::mspLoopEdges,
        include/KeyFrame.h:86-101 consumed by OptimizeEssentialGraph,
        src/Optimizer.cc:1848-2179) so the first seam stays closed."""
        rng = np.random.default_rng(5)
        n_pts = 180

        def place(x_off):
            X = np.stack([rng.uniform(-3, 3, n_pts) + x_off,
                          rng.uniform(-2, 2, n_pts),
                          rng.uniform(4, 9, n_pts)], 1).astype(np.float32)
            d = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
            return X, d

        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752), enable_loop_closing=False,
            map_capacity=mapstate.MapCapacity(n_kf=32, n_pt=4096,
                                              n_obs=16384))
        sys_ = slam_system.System(cfg)
        lc = loop_closing.LoopCloser(
            loop_closing.LoopConfig(consistency_needed=0, min_kf_gap=5),
            cfg.map_capacity.n_kf)
        m = sys_.map

        def add_kf(k, X, desc, R, t, n_obs=None):
            nonlocal m
            n = X.shape[0] if n_obs is None else n_obs
            uv = np.asarray(cameras.pinhole_project(
                K4j, lie.se3_apply(R, t, jnp.asarray(X))))
            m, kk = mapstate.add_keyframe(m, R, t, float(k), k)
            m, pt = mapstate.add_points(
                m, jnp.asarray(X), jnp.asarray(desc),
                jnp.tile(jnp.array([0.0, 0, 1]), (X.shape[0], 1)),
                jnp.full(X.shape[0], 1.0), jnp.full(X.shape[0], 40.0),
                int(kk), k, jnp.ones(X.shape[0], bool))
            m = mapstate.add_observations(
                m, kk, pt, jnp.asarray(uv),
                jnp.zeros(X.shape[0], jnp.int32),
                jnp.ones(X.shape[0], bool))
            ff = make_ff(uv, desc)
            sys_.kf_features[int(kk)] = ff
            sys_.kf_bindings[int(kk)] = pad_binding(pt)
            lc.add_keyframe(m, int(kk), ff)
            return int(kk), pt, ff, uv

        # place A (KF0, origin), exploration KFs 1..7, place B (KF8),
        # exploration 9..13
        XA, dA = place(0.0)
        kA, ptA, _, _ = add_kf(0, XA, dA, jnp.eye(3), jnp.zeros(3))
        for k in range(1, 8):
            Xk, dk = place(10.0 * k)
            add_kf(k, Xk[:60], dk[:60], jnp.eye(3),
                   jnp.asarray([-10.0 * k, 0, 0]))
        XB, dB = place(80.0)
        tB = jnp.asarray([-80.0, 0, 0])
        kB, ptB, _, _ = add_kf(8, XB, dB, jnp.eye(3), tB)
        for k in range(9, 14):
            Xk, dk = place(10.0 * k + 60.0)
            add_kf(k, Xk[:60], dk[:60], jnp.eye(3),
                   jnp.asarray([-10.0 * k - 60.0, 0, 0]))

        def drifted_revisit(k, X_true, desc, R_kf, t_kf, ds, dtv):
            """Duplicate landmarks in a drifted world; camera sees the
            SAME pixels as the true revisit (projective scale-invariance)."""
            nonlocal m
            X_dup = (ds * X_true + dtv).astype(np.float32)
            R = jnp.asarray(R_kf)
            t = ds * jnp.asarray(t_kf) - R @ jnp.asarray(dtv)
            return add_kf(k, X_dup[:150], desc[:150], R, t) + (R, t)

        # ---- first closure: drifted revisit of place A at KF14
        kr1, ptr1, ff1, _, _, _ = drifted_revisit(
            14, XA, dA, np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            1.10, np.array([0.5, -0.25, 0.15], np.float32))
        sys_.map = m
        sys_.R_cur = sys_.map.kf_R[kr1]
        sys_.t_cur = sys_.map.kf_t[kr1]
        sys_.last_kf_idx = kr1
        assert lc.try_close(sys_, ff1, kr1), "first loop not closed"
        assert lc.n_loops_closed == 1
        m = sys_.map
        assert int(m.n_loop) == 1

        # more exploration after the first closure
        for k in range(15, 17):
            Xk, dk = place(10.0 * k + 120.0)
            add_kf(k, Xk[:60], dk[:60], jnp.eye(3),
                   jnp.asarray([-10.0 * k - 120.0, 0, 0]))

        # ---- second closure: drifted revisit of place B (post-correction
        # coordinates!) at KF17
        XB_cur = np.asarray(m.pt_xyz[ptB])
        RB_cur = np.asarray(m.kf_R[kB])
        tB_cur = np.asarray(m.kf_t[kB])
        kr2, ptr2, ff2, _, _, _ = drifted_revisit(
            17, XB_cur, dB, RB_cur, tB_cur,
            1.08, np.array([-0.4, 0.2, -0.1], np.float32))
        sys_.map = m
        sys_.R_cur = sys_.map.kf_R[kr2]
        sys_.t_cur = sys_.map.kf_t[kr2]
        sys_.last_kf_idx = kr2
        assert lc.try_close(sys_, ff2, kr2), "second loop not closed"
        assert lc.n_loops_closed == 2
        m2 = sys_.map
        assert int(m2.n_loop) == 2

        # seam 2 closed: revisit KF sits at the candidate's camera center
        C2 = -np.asarray(m2.kf_R[kr2]).T @ np.asarray(m2.kf_t[kr2])
        CB = -np.asarray(m2.kf_R[kB]).T @ np.asarray(m2.kf_t[kB])
        assert np.linalg.norm(C2 - CB) < 0.3, np.linalg.norm(C2 - CB)
        # seam 1 STILL closed after the second pose-graph solve: the
        # persistent edge kept KF14 welded to KF0
        C1 = -np.asarray(m2.kf_R[kr1]).T @ np.asarray(m2.kf_t[kr1])
        CA = -np.asarray(m2.kf_R[kA]).T @ np.asarray(m2.kf_t[kA])
        assert np.linalg.norm(C1 - CA) < 0.3, np.linalg.norm(C1 - CA)
        # and the first edge is structurally in the essential graph
        ei, ej, *_, ok = loop_closing.build_essential_graph(m2)
        pairs = {(int(a), int(b)) for a, b, v in
                 zip(np.asarray(ei), np.asarray(ej), np.asarray(ok)) if v}
        assert (kr1, kA) in pairs and (kr2, kB) in pairs

    def test_cull_erases_keyframe_from_database(self):
        """Culled KFs must never come back as reloc/loop candidates
        (reference KeyFrame::SetBadFlag -> KeyFrameDatabase::erase,
        src/KeyFrameDatabase.cc:66)."""
        rng = np.random.default_rng(9)
        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752),
            map_capacity=mapstate.MapCapacity(n_kf=16, n_pt=1024,
                                              n_obs=4096))
        sys_ = slam_system.System(cfg)
        assert sys_.loop_closer is not None
        m = sys_.map
        X = np.stack([rng.uniform(-3, 3, 120), rng.uniform(-2, 2, 120),
                      rng.uniform(4, 9, 120)], 1).astype(np.float32)
        desc = rng.integers(0, 2 ** 32, (120, 8), dtype=np.uint32)
        for k in range(4):
            t = jnp.asarray([0.1 * k, 0, 0])
            uv = np.asarray(cameras.pinhole_project(
                K4j, lie.se3_apply(jnp.eye(3), t, jnp.asarray(X))))
            m, kk = mapstate.add_keyframe(m, jnp.eye(3), t, float(k), k)
            if k == 0:
                m, pt = mapstate.add_points(
                    m, jnp.asarray(X), jnp.asarray(desc),
                    jnp.tile(jnp.array([0.0, 0, 1]), (120, 1)),
                    jnp.full(120, 1.0), jnp.full(120, 40.0), 0, 0,
                    jnp.ones(120, bool))
            m = mapstate.add_observations(m, kk, pt, jnp.asarray(uv),
                                          jnp.zeros(120, jnp.int32),
                                          jnp.ones(120, bool))
            ff = make_ff(uv, desc)
            sys_.kf_features[int(kk)] = ff
            sys_.kf_bindings[int(kk)] = pad_binding(pt)
            # mirror into the device bank (the batched reloc program
            # gathers candidate features from it)
            sys_._bank_store(int(kk), ff, sys_.kf_bindings[int(kk)])
            sys_.loop_closer.add_keyframe(m, int(kk), ff)
        sys_.map = m
        # KF2 is a perfect match for its own descriptors before culling
        from orbslam3_tpu.place import keyframe_db as kdb
        bow, _ = sys_.loop_closer._bow(sys_.kf_features[2].desc,
                                       sys_.kf_features[2].valid)
        scores, _ = kdb.query(sys_.loop_closer.db, bow)
        assert float(scores[2]) > 0
        sys_._cull_keyframe(2)
        # erased from the DB, features/bindings dropped
        assert not bool(sys_.loop_closer.db.active[2])
        scores2, _ = kdb.query(sys_.loop_closer.db, bow)
        assert float(scores2[2]) <= 0
        assert 2 not in sys_.kf_features and 2 not in sys_.kf_bindings
        # relocalization against the same place still works via live KFs
        from orbslam3_tpu.pipeline import relocalization
        okk, R, t = relocalization.attempt_relocalization(
            sys_, sys_.kf_features[1], sys_.loop_closer, min_inliers=30)
        assert okk


class TestInertialLoopCorrection:
    def test_4dof_correction_preserves_scale_gravity_velocities(self):
        """Loop closure on an IMU-initialized (metric, gravity-aligned)
        map: the correction must be gauge-constrained — scale EXACTLY
        preserved, every KF correction a yaw rotation about world z, and
        keyframe velocities transported by their KF's rotation correction
        (VERDICT r3 missing #1; reference VertexPose4DoF/Edge4DoF,
        include/G2oTypes.h:155,816 + LoopClosing velocity correction)."""
        from orbslam3_tpu.pipeline import inertial_system

        rng = np.random.default_rng(0)
        n_pts = 200
        X0 = np.stack([rng.uniform(-3, 3, n_pts),
                       rng.uniform(-2, 2, n_pts),
                       rng.uniform(4, 9, n_pts)], 1).astype(np.float32)
        desc0 = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)

        cfg = slam_system.SlamConfig(
            cam_params=K4, image_hw=(480, 752), enable_loop_closing=False,
            post_loop_gba=False,
            map_capacity=mapstate.MapCapacity(n_kf=32, n_pt=4096,
                                              n_obs=16384))
        icfg = inertial_system.InertialConfig(imu_freq=200.0)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
        sys_.imu_initialized = True          # metric, gravity-aligned map
        m = sys_.map

        R0, t0 = jnp.eye(3), jnp.zeros(3)
        uv0 = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X0)))
        m, k0 = mapstate.add_keyframe(m, R0, t0, 0.0, 0)
        m, pt0 = mapstate.add_points(
            m, jnp.asarray(X0), jnp.asarray(desc0),
            jnp.tile(jnp.array([0.0, 0, 1]), (n_pts, 1)),
            jnp.full(n_pts, 1.0), jnp.full(n_pts, 30.0),
            0, 0, jnp.ones(n_pts, bool))
        m = mapstate.add_observations(m, k0, pt0, jnp.asarray(uv0),
                                      jnp.zeros(n_pts, jnp.int32),
                                      jnp.ones(n_pts, bool))
        ff0 = make_ff(uv0, desc0)
        sys_.kf_features[0] = ff0
        sys_.kf_bindings[0] = pad_binding(pt0)

        n_mid = 14
        for k in range(1, n_mid + 1):
            Xk = np.stack([rng.uniform(-3, 3, 60) + 10 * k,
                           rng.uniform(-2, 2, 60),
                           rng.uniform(4, 9, 60)], 1).astype(np.float32)
            dk = rng.integers(0, 2 ** 32, (60, 8), dtype=np.uint32)
            Rk = jnp.eye(3)
            tk = jnp.asarray([-10.0 * k, 0, 0])
            uvk = np.asarray(cameras.pinhole_project(
                K4j, lie.se3_apply(Rk, tk, jnp.asarray(Xk))))
            m, kk = mapstate.add_keyframe(m, Rk, tk, float(k), k)
            m, ptk = mapstate.add_points(
                m, jnp.asarray(Xk), jnp.asarray(dk),
                jnp.tile(jnp.array([0.0, 0, 1]), (60, 1)),
                jnp.full(60, 1.0), jnp.full(60, 30.0), int(kk), k,
                jnp.ones(60, bool))
            m = mapstate.add_observations(m, kk, ptk, jnp.asarray(uvk),
                                          jnp.zeros(60, jnp.int32),
                                          jnp.ones(60, bool))
            sys_.kf_features[int(kk)] = make_ff(uvk, dk)
            sys_.kf_bindings[int(kk)] = pad_binding(ptk)

        # revisit: physically at the origin pose, estimate drifted by a
        # world YAW + translation (the drift an inertial map actually
        # accumulates — the IMU pins scale, roll, pitch)
        dyaw = 0.10
        Rz = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.0, dyaw])))
        dtv = np.array([0.6, -0.3, 0.2], np.float32)
        X_dup = (X0[:150] @ Rz.T + dtv).astype(np.float32)
        # drifted camera consistent with the same pixels: camera coords
        # of X_dup under (R', t') must equal X0 -> R' = Rz^T, t' = -Rz^T d
        R_rev = jnp.asarray(Rz.T, jnp.float32)
        t_rev = jnp.asarray(-Rz.T @ dtv, jnp.float32)
        kf_rev = n_mid + 1
        uv_rev = uv0[:150]
        desc_rev = desc0[:150].copy()
        m, kr = mapstate.add_keyframe(m, R_rev, t_rev, float(kf_rev),
                                      kf_rev)
        m, ptr = mapstate.add_points(
            m, jnp.asarray(X_dup), jnp.asarray(desc_rev),
            jnp.tile(jnp.array([0.0, 0, 1]), (150, 1)),
            jnp.full(150, 1.0), jnp.full(150, 40.0), int(kr), kf_rev,
            jnp.ones(150, bool))
        m = mapstate.add_observations(m, kr, ptr, jnp.asarray(uv_rev),
                                      jnp.zeros(150, jnp.int32),
                                      jnp.ones(150, bool))
        ff_rev = make_ff(uv_rev, desc_rev)
        sys_.kf_features[int(kr)] = ff_rev
        sys_.kf_bindings[int(kr)] = pad_binding(ptr)

        # nonzero world-frame keyframe velocities (what the preint chain
        # would have estimated)
        K_cap = m.kf_R.shape[0]
        vels = np.zeros((K_cap, 3), np.float32)
        for k in range(kf_rev + 1):
            vels[k] = [0.5, 0.1 * k, -0.2]
        m = m._replace(kf_vel=jnp.asarray(vels))
        sys_.map = m
        sys_.R_cur, sys_.t_cur = R_rev, t_rev
        sys_.last_kf_idx = int(kr)
        sys_.vel = jnp.asarray(vels[kf_rev])
        sys_.last_body = sys_._cam_to_body(R_rev, t_rev)

        lc = loop_closing.LoopCloser(
            loop_closing.LoopConfig(consistency_needed=0, min_kf_gap=5),
            cfg.map_capacity.n_kf)
        for k in range(kf_rev):
            lc.add_keyframe(sys_.map, k, sys_.kf_features[k])

        m_before = sys_.map
        closed = lc.try_close(sys_, ff_rev, int(kr))
        assert closed, "loop not closed"
        m2 = sys_.map

        # loop actually corrected: revisit camera center back near origin
        C = -m2.kf_R[kr].T @ m2.kf_t[kr]
        assert float(jnp.linalg.norm(C)) < 0.15, float(jnp.linalg.norm(C))
        d = np.asarray(m2.pt_xyz[ptr]) - X0[:150]
        assert np.linalg.norm(d, axis=1).mean() < 0.25

        # scale EXACTLY preserved (4-DoF graph locks s=1: the point
        # scale-band bounds must come back bit-unchanged)
        np.testing.assert_array_equal(np.asarray(m2.pt_min_dist),
                                      np.asarray(m_before.pt_min_dist))
        # gravity locked: each KF correction is a rotation about world z
        nk = kf_rev + 1
        corr = np.einsum("kji,kjl->kil",
                         np.asarray(m_before.kf_R[:nk]),
                         np.asarray(m2.kf_R[:nk]))
        np.testing.assert_allclose(corr[:, 2, 2], 1.0, atol=1e-4)
        # velocities transported: rotated (norm preserved, z preserved),
        # and actually MOVED for KFs with a nonzero yaw correction
        v_old = vels[:nk]
        v_new = np.asarray(m2.kf_vel[:nk])
        np.testing.assert_allclose(np.linalg.norm(v_new, axis=1),
                                   np.linalg.norm(v_old, axis=1),
                                   rtol=1e-4)
        np.testing.assert_allclose(v_new[:, 2], v_old[:, 2], atol=1e-4)
        # expected transport: v' = R_a v with R_a = R_new^T R_old
        v_exp = np.einsum("kji,kjl,kl->ki", np.asarray(m2.kf_R[:nk]),
                          np.asarray(m_before.kf_R[:nk]), v_old)
        np.testing.assert_allclose(v_new, v_exp, atol=1e-5)
        yaw_corr = np.abs(np.arctan2(corr[:, 1, 0], corr[:, 0, 0]))
        moved = np.linalg.norm(v_new - v_old, axis=1)
        assert moved[yaw_corr > 0.02].min() > 1e-3, \
            "velocities were not transported"
        # tracker mirrors the corrected state
        np.testing.assert_allclose(np.asarray(sys_.vel),
                                   v_new[kf_rev], atol=1e-6)
