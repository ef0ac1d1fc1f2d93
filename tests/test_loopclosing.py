"""Place recognition, Sim3 solver, and pose-graph optimization tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.geometry import sim3solver
from orbslam3_tpu.ops import cameras, lie
from orbslam3_tpu.place import keyframe_db as kdb
from orbslam3_tpu.place import vocab
from orbslam3_tpu.solver import pose_graph

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32))


def corrupt(desc, rng, nbits):
    d = np.asarray(desc).copy()
    for i in range(d.shape[0]):
        for _ in range(nbits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1 << b)
    return jnp.asarray(d)


class TestVocab:
    def test_word_assignment_stable_under_noise(self):
        rng = np.random.default_rng(0)
        cb = jnp.asarray(vocab.seed_codebook(512))
        d = rand_desc(rng, 200)
        w1 = vocab.assign_words(d, cb)
        w2 = vocab.assign_words(corrupt(d, rng, 3), cb)
        agree = float(jnp.mean((w1 == w2).astype(jnp.float32)))
        assert agree > 0.6, agree

    def test_bow_l1_normalized(self):
        rng = np.random.default_rng(1)
        cb = jnp.asarray(vocab.seed_codebook(512))
        w = vocab.assign_words(rand_desc(rng, 300), cb)
        bv = vocab.bow_vector(w, jnp.ones(300, bool), 512)
        np.testing.assert_allclose(float(jnp.sum(bv)), 1.0, atol=1e-5)

    def test_kmeans_refine_improves_quantization(self):
        rng = np.random.default_rng(2)
        cb = jnp.asarray(vocab.seed_codebook(64, seed=3))
        d = rand_desc(rng, 2000)
        from orbslam3_tpu.ops import brief
        def qerr(c):
            dist = brief.hamming_distance(d, c)
            return float(jnp.mean(jnp.min(dist, axis=1)))
        e0 = qerr(cb)
        cb2 = vocab.kmeans_refine(cb, d, jnp.ones(2000, bool), iters=3)
        e1 = qerr(cb2)
        assert e1 < e0, (e0, e1)


class TestKeyframeDB:
    def test_query_finds_revisited_place(self):
        rng = np.random.default_rng(3)
        V = 512
        cb = jnp.asarray(vocab.seed_codebook(V))
        db = kdb.KeyframeDB.create(16, V)
        descs = [rand_desc(rng, 150) for _ in range(8)]
        for k, d in enumerate(descs):
            w = vocab.assign_words(d, cb)
            db = kdb.add(db, k, vocab.bow_vector(w, jnp.ones(150, bool), V))
        # query = noisy copy of place 2
        q = corrupt(descs[2], rng, 4)
        wq = vocab.assign_words(q, cb)
        bow = vocab.bow_vector(wq, jnp.ones(150, bool), V)
        scores, common = kdb.query(db, bow)
        assert int(jnp.argmax(scores)) == 2
        # exclusion mask works
        excl = jnp.zeros(16, bool).at[2].set(True)
        scores2, _ = kdb.query(db, bow, exclude=excl)
        assert int(jnp.argmax(scores2)) != 2

    def test_detect_candidates_groups(self):
        rng = np.random.default_rng(4)
        V = 512
        cb = jnp.asarray(vocab.seed_codebook(V))
        db = kdb.KeyframeDB.create(8, V)
        descs = [rand_desc(rng, 120) for _ in range(6)]
        for k, d in enumerate(descs):
            w = vocab.assign_words(d, cb)
            db = kdb.add(db, k, vocab.bow_vector(w, jnp.ones(120, bool), V))
        q = corrupt(descs[4], rng, 3)
        wq = vocab.assign_words(q, cb)
        bow = vocab.bow_vector(wq, jnp.ones(120, bool), V)
        covis = jnp.zeros((8, 8), bool)
        cand, score = kdb.detect_candidates(db, bow, jnp.zeros(8, bool),
                                            covis)
        assert int(cand[0]) == 4


class TestPersistentLoopEdges:
    def test_essential_graph_includes_persisted_edges(self):
        """A loop edge persisted via add_loop_edge must appear (valid) in
        every later build_essential_graph (reference KeyFrame::mspLoopEdges,
        include/KeyFrame.h:86-101)."""
        from orbslam3_tpu.slam_map import state as mapstate
        from orbslam3_tpu.pipeline import loop_closing
        cap = mapstate.MapCapacity(n_kf=16, n_pt=256, n_obs=1024)
        m = mapstate.empty_map(cap)
        for k in range(8):
            m, _ = mapstate.add_keyframe(
                m, jnp.eye(3), jnp.asarray([float(k), 0, 0]), float(k), k)
        m = mapstate.add_loop_edge(m, 6, 1, jnp.eye(3),
                                   jnp.zeros(3), jnp.asarray(1.0))
        assert int(m.n_loop) == 1
        ei, ej, eR, et, es, ok = loop_closing.build_essential_graph(m)
        pairs = {(int(a), int(b)) for a, b, v in
                 zip(np.asarray(ei), np.asarray(ej), np.asarray(ok)) if v}
        assert (6, 1) in pairs
        # culling an endpoint invalidates the edge
        m2 = m._replace(kf_valid=m.kf_valid.at[1].set(False))
        *_, ok2 = loop_closing.build_essential_graph(m2)
        ei2, ej2 = np.asarray(ei), np.asarray(ej)
        pairs2 = {(int(a), int(b)) for a, b, v in
                  zip(ei2, ej2, np.asarray(ok2)) if v}
        assert (6, 1) not in pairs2

    def test_db_erase_removes_candidate(self):
        """KeyFrameDatabase::erase parity (src/KeyFrameDatabase.cc:66): an
        erased KF can never be returned by query/detect_candidates."""
        rng = np.random.default_rng(7)
        V = 512
        cb = jnp.asarray(vocab.seed_codebook(V))
        db = kdb.KeyframeDB.create(8, V)
        descs = [rand_desc(rng, 120) for _ in range(6)]
        for k, d in enumerate(descs):
            w = vocab.assign_words(d, cb)
            db = kdb.add(db, k, vocab.bow_vector(w, jnp.ones(120, bool), V))
        q = corrupt(descs[3], rng, 3)
        wq = vocab.assign_words(q, cb)
        bow = vocab.bow_vector(wq, jnp.ones(120, bool), V)
        scores, _ = kdb.query(db, bow)
        assert int(jnp.argmax(scores)) == 3
        db = kdb.erase(db, 3)
        scores2, _ = kdb.query(db, bow)
        assert int(jnp.argmax(scores2)) != 3
        assert float(scores2[3]) <= 0
        cand, _ = kdb.detect_candidates(db, bow, jnp.zeros(8, bool),
                                        jnp.zeros((8, 8), bool))
        assert 3 not in set(np.asarray(cand).tolist())


class TestSim3Solver:
    def test_recovers_known_sim3(self):
        key = jax.random.PRNGKey(0)
        n = 80
        # map-1 world points in front of KF1 at origin
        X1 = jax.random.normal(key, (n, 3)) * jnp.array([1.5, 1.0, 0.8]) + \
            jnp.array([0.0, 0.0, 5.0])
        R1, t1 = jnp.eye(3), jnp.zeros(3)
        # map 2 = sim3-warped copy of map 1 (drifted duplicate)
        Rg = lie.exp_so3(jnp.array([0.05, -0.3, 0.1]))
        sg = jnp.asarray(1.4)
        tg = jnp.array([2.0, -1.0, 0.5])
        X2 = lie.sim3_apply(Rg, tg, sg, X1)
        # KF2 observes map-2 points from the warped camera
        uv1 = cameras.pinhole_project(K4, lie.se3_apply(R1, t1, X1))
        uv2 = uv1  # camera 2 sees identical pixels by construction
        Rcw2 = Rg.T
        tcw2 = -Rg.T @ tg
        # P2 = Rg^T (X2 - tg) = s * X1 — a scaled camera frame with the
        # SAME pixels (projective), so uv2 == uv1; the Sim3 between camera
        # frames is then (I, 0, 1/s).
        valid = jnp.ones(n, bool)
        res = sim3solver.solve_sim3(
            X1, X2, valid, uv1, uv2, R1, t1, Rcw2, tcw2,
            "pinhole", K4, jax.random.PRNGKey(1))
        assert bool(res.success), int(res.n_inliers)
        # check alignment: P1 = s R P2_cam + t with P2_cam = s * X1...
        P2cam = lie.se3_apply(Rcw2, tcw2, X2)
        P1cam = lie.se3_apply(R1, t1, X1)
        err = P1cam - (res.s12 * P2cam @ res.R12.T + res.t12)
        assert float(jnp.max(jnp.linalg.norm(err, axis=-1))) < 1e-3
        np.testing.assert_allclose(float(res.s12), 1.0 / float(sg), atol=0.01)

    def test_outliers_rejected(self):
        key = jax.random.PRNGKey(2)
        n = 60
        X1 = jax.random.normal(key, (n, 3)) + jnp.array([0.0, 0.0, 6.0])
        X2 = X1 * 1.2 + jnp.array([0.5, 0.0, 0.0])
        X2 = X2.at[:12].add(jax.random.normal(jax.random.PRNGKey(3),
                                              (12, 3)) * 3.0)
        R0, t0 = jnp.eye(3), jnp.zeros(3)
        uv1 = cameras.pinhole_project(K4, X1)
        uv2 = cameras.pinhole_project(K4, X2)
        res = sim3solver.solve_sim3(
            X1, X2, jnp.ones(n, bool), uv1, uv2, R0, t0, R0, t0,
            "pinhole", K4, jax.random.PRNGKey(4))
        assert bool(res.success)
        inl = np.asarray(res.inliers)
        assert inl[:12].mean() < 0.3
        assert inl[12:].mean() > 0.8


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self):
        """Chain of KFs with accumulated drift; a loop edge back to KF0
        pulls the chain closed and the optimizer distributes the error."""
        K = 12
        # ground truth: circle
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        gt_t = np.stack([np.cos(angles), np.sin(angles),
                         np.zeros(K)], 1) * 3.0
        gt_R = np.stack([np.asarray(lie.exp_so3(
            jnp.array([0.0, 0.0, a]))) for a in angles])
        # odometry measurements (exact relative poses S_ij = S_i S_j^-1)
        # vertices = world->kf: S_iw = inverse of (R_wi, t_wi)
        Rv, tv = [], []
        for k in range(K):
            Rcw = gt_R[k].T
            tcw = -Rcw @ gt_t[k]
            Rv.append(Rcw)
            tv.append(tcw)
        Rv = jnp.asarray(np.stack(Rv), jnp.float32)
        tv = jnp.asarray(np.stack(tv), jnp.float32)
        sv = jnp.ones(K)
        # drifted initial estimate: growing scale + translation drift
        drift_s = 1.15
        Rd, td, sd = [Rv[0]], [tv[0]], [1.0]
        for k in range(1, K):
            # relative truth j->i composed with drift
            Ri, ti, si = Rv[k], tv[k], 1.0
            td.append(ti + jnp.asarray([0.03 * k, -0.02 * k, 0.0]))
            Rd.append(Ri)
            sd.append(drift_s ** (k / (K - 1)))
        Rd = jnp.stack(Rd)
        td = jnp.stack(td)
        sd = jnp.asarray(sd, jnp.float32)

        # edges: consecutive (true relatives) + loop edge (K-1 -> 0 true)
        ei, ej, eR, et, es = [], [], [], [], []
        for k in range(K - 1):
            i, j = k + 1, k
            Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(Rv[j], tv[j],
                                                      jnp.asarray(1.0))
            Rm, tm, sm = lie.sim3_compose(Rv[i], tv[i], jnp.asarray(1.0),
                                          Rj_inv, tj_inv, sj_inv)
            ei.append(i); ej.append(j); eR.append(Rm); et.append(tm)
            es.append(sm)
        # loop edge 0 <-> K-1
        i, j = 0, K - 1
        Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(Rv[j], tv[j],
                                                  jnp.asarray(1.0))
        Rm, tm, sm = lie.sim3_compose(Rv[i], tv[i], jnp.asarray(1.0),
                                      Rj_inv, tj_inv, sj_inv)
        ei.append(i); ej.append(j); eR.append(Rm); et.append(tm); es.append(sm)

        res = pose_graph.optimize_pose_graph(
            Rd, td, sd,
            fixed=jnp.zeros(K, bool).at[0].set(True),
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(ei), e_j=jnp.asarray(ej),
            e_R=jnp.stack(eR), e_t=jnp.stack(et), e_s=jnp.stack(es),
            e_valid=jnp.ones(len(ei), bool), iterations=25)
        # recovered camera centers
        centers = -jnp.einsum("kij,kj->k i", jnp.swapaxes(res.R, 1, 2) * 0
                              + jnp.swapaxes(res.R, 1, 2), res.t) / \
            res.s[:, None]
        err = float(jnp.max(jnp.linalg.norm(centers - jnp.asarray(gt_t),
                                            axis=-1)))
        assert err < 0.05, err
        np.testing.assert_allclose(np.asarray(res.s), 1.0, atol=0.02)


class TestPoseGraph4DoF:
    def test_gauge_constrained_correction(self):
        """Inertial (4-DoF) essential graph: the correction must stay in
        yaw + translation — scale EXACTLY 1 and gravity alignment (each
        vertex's correction a world-z rotation), while still closing the
        loop (reference OptimizeEssentialGraph4DoF via VertexPose4DoF/
        Edge4DoF, include/G2oTypes.h:155,816)."""
        K = 12
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        gt_t = np.stack([np.cos(angles), np.sin(angles),
                         0.1 * np.sin(2 * angles)], 1) * 3.0
        gt_R = np.stack([np.asarray(lie.exp_so3(
            jnp.array([0.0, 0.0, a]))) for a in angles])
        Rv = jnp.asarray(np.stack([gt_R[k].T for k in range(K)]),
                         jnp.float32)
        tv = jnp.asarray(np.stack([-gt_R[k].T @ gt_t[k]
                                   for k in range(K)]), jnp.float32)
        # drifted estimate: growing yaw error + translation drift (the
        # anomaly an inertial map actually accumulates — scale and
        # gravity are held by the IMU, yaw and position drift)
        Rd, td = [Rv[0]], [tv[0]]
        for k in range(1, K):
            dyaw = 0.04 * k
            Rz = lie.exp_so3(jnp.asarray([0.0, 0.0, dyaw]))
            Rd.append(jnp.matmul(Rv[k], Rz))
            td.append(tv[k] + jnp.asarray([0.05 * k, -0.04 * k, 0.0]))
        Rd = jnp.stack(Rd)
        td = jnp.stack(td)
        sd = jnp.ones(K, jnp.float32)

        ei, ej, eR, et, es = [], [], [], [], []
        for k in range(K - 1):
            i, j = k + 1, k
            Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(
                Rv[j], tv[j], jnp.asarray(1.0))
            Rm, tm, sm = lie.sim3_compose(Rv[i], tv[i], jnp.asarray(1.0),
                                          Rj_inv, tj_inv, sj_inv)
            ei.append(i); ej.append(j); eR.append(Rm); et.append(tm)
            es.append(sm)
        i, j = 0, K - 1
        Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(
            Rv[j], tv[j], jnp.asarray(1.0))
        Rm, tm, sm = lie.sim3_compose(Rv[i], tv[i], jnp.asarray(1.0),
                                      Rj_inv, tj_inv, sj_inv)
        ei.append(i); ej.append(j); eR.append(Rm); et.append(tm)
        es.append(sm)

        res = pose_graph.optimize_pose_graph(
            Rd, td, sd,
            fixed=jnp.zeros(K, bool).at[0].set(True),
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(ei), e_j=jnp.asarray(ej),
            e_R=jnp.stack(eR), e_t=jnp.stack(et), e_s=jnp.stack(es),
            e_valid=jnp.ones(len(ei), bool), iterations=25,
            dof_mask=jnp.asarray(pose_graph.DOF4_MASK, jnp.float32))

        # scale locked EXACTLY (no exp(eps) drift)
        np.testing.assert_array_equal(np.asarray(res.s), 1.0)
        # gravity locked: every correction R_old^T R_new is a rotation
        # about world z => its (2,2) element is 1
        corr = np.einsum("kji,kjl->kil", np.asarray(Rd), np.asarray(res.R))
        np.testing.assert_allclose(corr[:, 2, 2], 1.0, atol=1e-4)
        np.testing.assert_allclose(corr[:, 2, :2], 0.0, atol=1e-3)
        # and the loop actually closes: camera centers near truth
        centers = -np.einsum("kji,kj->ki", np.asarray(res.R),
                             np.asarray(res.t))
        err = float(np.max(np.linalg.norm(centers - gt_t, axis=-1)))
        assert err < 0.08, err


class TestOnlineVocabRefine:
    def test_refine_improves_quantization_and_reencodes_db(self):
        """LoopCloser.refine_vocab: k-majority over the session's own
        keyframe descriptors must reduce quantization distance (the
        online analogue of DBoW2 training) and re-encode the stored DB
        so a revisit query still ranks its place first."""
        from orbslam3_tpu.features.extractor import FeatureFrame
        from orbslam3_tpu.ops import brief
        from orbslam3_tpu.pipeline import loop_closing

        rng = np.random.default_rng(3)
        n_kf, n_desc = 12, 256
        lc = loop_closing.LoopCloser(
            loop_closing.LoopConfig(vocab="seed"), 32)

        def make_ff(desc):
            n = desc.shape[0]
            return FeatureFrame(
                xy=jnp.zeros((n, 2)), response=jnp.ones(n),
                octave=jnp.zeros(n, jnp.int32), angle=jnp.zeros(n),
                desc=jnp.asarray(desc), valid=jnp.ones(n, bool))

        # session imagery: correlated descriptor families (what a real
        # session produces; the seed codebook is random bits)
        base = rng.integers(0, 2 ** 32, (n_desc, 8), dtype=np.uint32)
        kf_features = {}
        for k in range(n_kf):
            d = base.copy()
            for _ in range(6):     # small per-view corruption
                i = rng.integers(0, n_desc)
                d[i, rng.integers(0, 8)] ^= np.uint32(
                    1 << rng.integers(0, 32))
            kf_features[k] = make_ff(d)
            lc.add_keyframe(None, k, kf_features[k])

        def mean_qdist(cb):
            d = brief.hamming_distance(jnp.asarray(base), cb)
            return float(jnp.mean(jnp.min(d, axis=1)))

        q_before = mean_qdist(lc.codebook)
        lc.refine_vocab(kf_features)
        q_after = mean_qdist(lc.codebook)
        assert q_after < q_before - 1.0, (q_before, q_after)

        # the re-encoded DB still ranks a revisit of KF 3 first
        from orbslam3_tpu.place import keyframe_db as kdb
        q = make_ff(np.asarray(kf_features[3].desc))
        bow, _ = lc._bow(q.desc, q.valid)
        scores, _ = kdb.query(lc.db, bow)
        assert int(jnp.argmax(scores)) == 3


class TestPoseGraphCG:
    def test_matrix_free_cg_matches_dense(self):
        """The matrix-free CG path (pod-scale maps, no (7K,7K)
        densification) must reproduce the dense solve on the same
        problem."""
        rng = np.random.default_rng(0)
        K = 40
        angles = np.linspace(0, 2 * np.pi, K, endpoint=False)
        gt_t = np.stack([np.cos(angles), np.sin(angles),
                         0.2 * np.sin(3 * angles)], 1) * 4.0
        Rv, tv = [], []
        for k in range(K):
            Rcw = np.asarray(lie.exp_so3(
                jnp.asarray([0.0, 0.0, angles[k]]))).T
            Rv.append(Rcw)
            tv.append(-Rcw @ gt_t[k])
        Rv = jnp.asarray(np.stack(Rv), jnp.float32)
        tv = jnp.asarray(np.stack(tv), jnp.float32)
        # drifted init
        Rd, td, sd = [Rv[0]], [tv[0]], [1.0]
        for k in range(1, K):
            Rz = lie.exp_so3(jnp.asarray([0.0, 0.0, 0.01 * k]))
            Rd.append(jnp.matmul(Rv[k], Rz))
            td.append(tv[k] + jnp.asarray(
                rng.normal(0, 0.02 * k, 3), jnp.float32))
            sd.append(1.0 + 0.002 * k)
        Rd, td = jnp.stack(Rd), jnp.stack(td)
        sd = jnp.asarray(sd, jnp.float32)

        ei, ej, eR, et, es = [], [], [], [], []

        def add_edge(i, j):
            Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(
                Rv[j], tv[j], jnp.asarray(1.0))
            Rm, tm, sm = lie.sim3_compose(Rv[i], tv[i], jnp.asarray(1.0),
                                          Rj_inv, tj_inv, sj_inv)
            ei.append(i); ej.append(j); eR.append(Rm); et.append(tm)
            es.append(sm)

        for k in range(K - 1):
            add_edge(k + 1, k)
        add_edge(0, K - 1)
        for k in range(0, K - 5, 5):      # a few covis-like shortcuts
            add_edge(k + 4, k)

        kw = dict(
            fixed=jnp.zeros(K, bool).at[0].set(True),
            valid=jnp.ones(K, bool),
            e_i=jnp.asarray(ei), e_j=jnp.asarray(ej),
            e_R=jnp.stack(eR), e_t=jnp.stack(et), e_s=jnp.stack(es),
            e_valid=jnp.ones(len(ei), bool), iterations=20)
        dense = pose_graph.optimize_pose_graph(Rd, td, sd, solver="dense",
                                               **kw)
        cgres = pose_graph.optimize_pose_graph(Rd, td, sd, solver="cg",
                                               **kw)
        cd = -np.einsum("kji,kj->ki", np.asarray(dense.R),
                        np.asarray(dense.t)) / np.asarray(dense.s)[:, None]
        cc = -np.einsum("kji,kj->ki", np.asarray(cgres.R),
                        np.asarray(cgres.t)) / np.asarray(cgres.s)[:, None]
        # both near ground truth and near each other
        assert np.abs(cd - gt_t).max() < 0.05, np.abs(cd - gt_t).max()
        assert np.abs(cc - gt_t).max() < 0.05, np.abs(cc - gt_t).max()
        assert np.abs(cc - cd).max() < 0.02, np.abs(cc - cd).max()
        # 4-DoF mode also works matrix-free
        res4 = pose_graph.optimize_pose_graph(
            Rd, td, jnp.ones(K), solver="cg",
            dof_mask=jnp.asarray(pose_graph.DOF4_MASK), **kw)
        np.testing.assert_array_equal(np.asarray(res4.s), 1.0)
        corr = np.einsum("kji,kjl->kil", np.asarray(Rd),
                         np.asarray(res4.R))
        np.testing.assert_allclose(corr[:, 2, 2], 1.0, atol=1e-4)
