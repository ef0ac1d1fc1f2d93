"""Fusion / KF culling tests."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import cameras
from orbslam3_tpu.pipeline import fusion
from orbslam3_tpu.slam_map import state as mapstate
from test_loop_integration import K4, K4j, N_KP, make_ff, pad_binding


def base_map(cap=None):
    cap = cap or mapstate.MapCapacity(n_kf=8, n_pt=512, n_obs=4096)
    return mapstate.empty_map(cap)


class TestFuse:
    def test_binds_unmatched_keypoints(self):
        rng = np.random.default_rng(0)
        n = 50
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 8, n)], 1).astype(np.float32)
        desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
        m = base_map()
        m, k0 = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        d = jnp.linalg.norm(jnp.asarray(X), axis=1)
        m, pts = mapstate.add_points(
            m, jnp.asarray(X), jnp.asarray(desc), jnp.zeros((n, 3)),
            d / 3.6, d, 0, 0, jnp.ones(n, bool))
        uv = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X)))
        ff = make_ff(uv, desc)
        kp_pt = jnp.full(N_KP, -1, jnp.int32)   # keyframe has NO bindings
        m2, kp_pt2, n_fused = fusion.fuse_into_keyframe(
            m, 0, ff, kp_pt, "pinhole", K4j, (480, 752))
        bound = int(jnp.sum(kp_pt2 >= 0))
        assert bound >= n * 0.9, bound

    def test_merges_duplicates_keeping_more_observed(self):
        rng = np.random.default_rng(1)
        X = np.array([[0.0, 0.0, 5.0]], np.float32)
        desc = rng.integers(0, 2 ** 32, (1, 8), dtype=np.uint32)
        m = base_map()
        m, k0 = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        # original point with 3 observations (more established)
        m, p_orig = mapstate.add_points(
            m, jnp.asarray(X), jnp.asarray(desc), jnp.zeros((1, 3)),
            jnp.full(1, 5 / 3.6), jnp.full(1, 5.0), 0, 0,
            jnp.ones(1, bool))
        for kf in range(3):
            if kf > 0:
                m, _ = mapstate.add_keyframe(m, jnp.eye(3),
                                             jnp.zeros(3), float(kf), kf)
            m = mapstate.add_observations(
                m, kf, p_orig, jnp.zeros((1, 2)), jnp.zeros(1, jnp.int32),
                jnp.ones(1, bool))
        # duplicate point (1 observation), bound to the target keyframe
        m, p_dup = mapstate.add_points(
            m, jnp.asarray(X + 0.01), jnp.asarray(desc), jnp.zeros((1, 3)),
            jnp.full(1, 5 / 3.6), jnp.full(1, 5.0), 0, 5,
            jnp.ones(1, bool))
        uv = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X)))
        ff = make_ff(uv, desc)
        kp_pt = pad_binding(p_dup[:1])  # KF0's keypoint bound to duplicate
        m2, kp_pt2, n_fused = fusion.fuse_into_keyframe(
            m, 0, ff, kp_pt, "pinhole", K4j, (480, 752))
        assert int(n_fused) == 1
        # duplicate died, original survived and is now bound
        assert not bool(m2.pt_valid[p_dup[0]])
        assert bool(m2.pt_valid[p_orig[0]])
        assert int(kp_pt2[0]) == int(p_orig[0])


class TestKFCulling:
    def test_redundant_kf_detected_and_culled(self):
        rng = np.random.default_rng(2)
        n = 40
        X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(4, 8, n)], 1).astype(np.float32)
        m = base_map()
        # 5 KFs all observing the same points
        for kf in range(5):
            m, _ = mapstate.add_keyframe(m, jnp.eye(3),
                                         jnp.asarray([0.1 * kf, 0, 0]),
                                         float(kf), kf)
        m, pts = mapstate.add_points(
            m, jnp.asarray(X), jnp.zeros((n, 8), jnp.uint32),
            jnp.zeros((n, 3)), jnp.ones(n), jnp.full(n, 20.0), 0, 0,
            jnp.ones(n, bool))
        for kf in range(5):
            m = mapstate.add_observations(
                m, kf, pts, jnp.zeros((n, 2)), jnp.zeros(n, jnp.int32),
                jnp.ones(n, bool))
        red, frac = fusion.keyframe_redundancy(m, 2)
        assert bool(red) and float(frac) == 1.0
        m2 = fusion.cull_keyframe(m, 2)
        assert not bool(m2.kf_valid[2])
        # observations of KF2 dropped; other KFs unaffected
        assert int(jnp.sum(m2.obs_valid)) == 4 * n

    def test_distinctive_descriptor_is_min_median(self):
        """refresh_point_descriptors must realize ComputeDistinctiveDescriptors
        (reference src/MapPoint.cc:343): after several observations, the
        representative descriptor minimizes the median Hamming distance to
        the point's observation descriptors."""
        rng = np.random.default_rng(11)
        base = rng.integers(0, 2 ** 32, 8, dtype=np.uint32)

        def flip(d, nbits, seed):
            r = np.random.default_rng(seed)
            out = d.copy()
            for _ in range(nbits):
                w, b = r.integers(0, 8), r.integers(0, 32)
                out[w] ^= np.uint32(1 << b)
            return out

        # 5 observation descriptors: a central one, three near it, one far
        descs = [flip(base, 40, 1), base.copy(), flip(base, 8, 2),
                 flip(base, 10, 3), flip(base, 12, 4)]

        m = base_map()
        m, _ = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        X = np.array([[0.0, 0.0, 5.0]], np.float32)
        m, p = mapstate.add_points(
            m, jnp.asarray(X), jnp.asarray(descs[0][None]),
            jnp.zeros((1, 3)), jnp.ones(1), jnp.full(1, 20.0), 0, 0,
            jnp.ones(1, bool))
        uv = np.asarray(cameras.pinhole_project(K4j, jnp.asarray(X)))
        kp_pt = pad_binding(p[:1])
        for d in descs[1:]:
            ff = make_ff(uv, d[None])
            m = fusion.refresh_point_descriptors(m, ff, kp_pt)
        got = np.asarray(m.pt_desc[p[0]])

        # numpy oracle: exact reference reduction (all-pairs, median of
        # each row's sorted distances incl. self-0, argmin)
        def ham(a, b):
            return sum(bin(int(x) ^ int(y)).count("1")
                       for x, y in zip(a, b))
        D = np.array([[ham(a, b) for b in descs] for a in descs])
        med = np.sort(D, axis=1)[:, (len(descs) - 1) // 2]
        expect = descs[int(np.argmin(med))]
        np.testing.assert_array_equal(got, expect)
        assert int(m.pt_desc_n[p[0]]) == 5

    def test_unique_view_not_redundant(self):
        n = 20
        m = base_map()
        m, _ = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3), 0.0, 0)
        m, pts = mapstate.add_points(
            m, jnp.zeros((n, 3)), jnp.zeros((n, 8), jnp.uint32),
            jnp.zeros((n, 3)), jnp.ones(n), jnp.full(n, 20.0), 0, 0,
            jnp.ones(n, bool))
        m = mapstate.add_observations(
            m, 0, pts, jnp.zeros((n, 2)), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool))
        red, frac = fusion.keyframe_redundancy(m, 0)
        assert not bool(red)


class TestCovisibilityMatrix:
    """covisibility_matrix: dense == chunked == per-row weights
    (VERDICT r3 weak #6 — the detection/essential-graph path must not
    require an f32 (P, K) transient at pod scale)."""

    def _random_map(self, seed=7, n_kf=6, n_pt=200):
        rng = np.random.default_rng(seed)
        m = base_map(mapstate.MapCapacity(n_kf=8, n_pt=256, n_obs=4096))
        for k in range(n_kf):
            m, _ = mapstate.add_keyframe(m, jnp.eye(3), jnp.zeros(3),
                                         float(k), k)
        X = rng.uniform(-2, 2, (n_pt, 3)).astype(np.float32)
        desc = rng.integers(0, 2 ** 32, (n_pt, 8), dtype=np.uint32)
        d = jnp.linalg.norm(jnp.asarray(X), axis=1)
        m, pts = mapstate.add_points(
            m, jnp.asarray(X), jnp.asarray(desc), jnp.zeros((n_pt, 3)),
            d / 3.6, d + 1.0, 0, 0, jnp.ones(n_pt, bool))
        for k in range(n_kf):
            seen = jnp.asarray(rng.random(n_pt) < 0.4)
            m = mapstate.add_observations(
                m, k, pts, jnp.zeros((n_pt, 2)),
                jnp.zeros(n_pt, jnp.int32), seen)
        # kill a few points and one keyframe to exercise the masks
        m = m._replace(
            pt_valid=m.pt_valid & jnp.asarray(rng.random(256) < 0.9),
            kf_valid=m.kf_valid.at[2].set(False))
        return m

    def test_chunked_equals_dense(self):
        m = self._random_map()
        Wd = np.asarray(mapstate.covisibility_matrix(m))
        for chunk in (32, 100, 256):
            Wc = np.asarray(mapstate.covisibility_matrix(
                m, chunk=chunk, dense_max_entries=0))
            np.testing.assert_array_equal(Wd, Wc)

    def test_rows_match_covisibility_weights(self):
        m = self._random_map(seed=9)
        W = np.asarray(mapstate.covisibility_matrix(
            m, chunk=64, dense_max_entries=0))
        np.testing.assert_array_equal(W, W.T)
        for k in (0, 1, 3):
            row = np.asarray(mapstate.covisibility_weights(
                m, jnp.asarray(k)))
            expect = W[k].astype(np.int64).copy()
            expect[k] = 0
            np.testing.assert_array_equal(row, expect.astype(row.dtype))
