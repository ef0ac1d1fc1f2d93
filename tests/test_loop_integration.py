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
            loop_closing.LoopConfig(consistency_needed=1, min_kf_gap=5),
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
