"""Visual-inertial BA on a simulated trajectory with landmarks."""
import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.ops import cameras, imu, lie
from orbslam3_tpu.solver import inertial, vi_ba
from test_inertial import CALIB, G, make_factors, simulate

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


def build_vi_problem(seed=0, n_pts=150, noise_px=0.3, perturb=0.01,
                     excitation=1.0):
    Rs, ps, vs, accs, gyrs, dt = simulate(n_kf=8, kf_dt=0.4, seed=seed,
                                          excitation=excitation)
    f = make_factors(accs, gyrs, dt)
    K = Rs.shape[0]
    rng = np.random.default_rng(seed + 10)
    # landmarks in front of the trajectory (cameras look +z body = world-ish)
    X = np.stack([rng.uniform(-4, 6, n_pts), rng.uniform(-3, 3, n_pts),
                  rng.uniform(6, 14, n_pts)], 1).astype(np.float32)
    Rwb = jnp.asarray(Rs)
    pwb = jnp.asarray(ps)
    obs_cam = jnp.repeat(jnp.arange(K), n_pts)
    obs_pt = jnp.tile(jnp.arange(n_pts), K)
    # identity extrinsics: camera = body
    Xb = jax.vmap(lambda R, p: (jnp.asarray(X) - p) @ R)(Rwb, pwb)  # (K,N,3)
    uv = cameras.pinhole_project(K4, Xb.reshape(-1, 3))
    uv = uv + noise_px * jax.random.normal(jax.random.PRNGKey(seed), uv.shape)
    vis = Xb.reshape(-1, 3)[:, 2] > 0.5

    key = jax.random.PRNGKey(seed + 1)
    dx = perturb * jax.random.normal(key, (K, vi_ba.STATE_DIM))
    dx = dx.at[0].set(0.0).at[:, 9:15].set(0.0)
    Rp, pp, vp, bp = vi_ba.apply_delta(Rwb, pwb, jnp.asarray(vs),
                                       jnp.zeros((K, 6)), dx)
    Xp = jnp.asarray(X) + 0.03 * jax.random.normal(
        jax.random.PRNGKey(seed + 2), X.shape)

    prob = vi_ba.VIProblem(
        Rwb=Rp, pwb=pp, vel=vp, bias=bp,
        cam_fixed=jnp.zeros(K, bool).at[0].set(True),
        cam_valid=jnp.ones(K, bool),
        X=Xp, pt_valid=jnp.ones(n_pts, bool),
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=uv,
        obs_inv_sigma2=jnp.ones(uv.shape[0]),
        obs_valid=vis,
        factors=f, gravity=G,
        Rcb=jnp.eye(3), tcb=jnp.zeros(3))
    return prob, (Rwb, pwb, jnp.asarray(vs), jnp.asarray(X))


class TestVIBA:
    def test_recovers_trajectory(self):
        prob, (R_gt, p_gt, v_gt, X_gt) = build_vi_problem()
        res = vi_ba.vi_bundle_adjust(prob, "pinhole", K4, iterations=12)
        err_p = float(jnp.max(jnp.linalg.norm(res.pwb - p_gt, axis=-1)))
        err_v = float(jnp.mean(jnp.linalg.norm(res.vel - v_gt, axis=-1)))
        rot_err = float(jnp.max(jnp.linalg.norm(
            jax.vmap(lambda a, b: lie.log_so3(a.T @ b))(res.Rwb, R_gt),
            axis=-1)))
        assert err_p < 0.02, err_p
        assert err_v < 0.05, err_v
        assert rot_err < 0.01, rot_err
        # bias should stay near zero (true bias = 0)
        assert float(jnp.max(jnp.abs(res.bias))) < 0.05

    def test_staged_init_restores_scale(self):
        """Reference-parity staging (LocalMapping::InitializeIMU,
        src/LocalMapping.cc:1080): scale/gravity are solved by the
        inertial-only optimizer (explicit scale variable), the map is
        re-anchored, and only then FullInertialBA polishes — FIBA itself
        is NOT expected to fix a pure-scale error (its LM stalls in the
        visual gauge null direction; the reference never asks it to)."""
        # strong excitation: scale is only observable under acceleration
        prob, (R_gt, p_gt, v_gt, X_gt) = build_vi_problem(perturb=0.0,
                                                          excitation=4.0)
        s = 0.8
        prob_s = prob._replace(pwb=prob.pwb * s, X=prob.X * s,
                               vel=prob.vel * s)
        # stage 1: inertial-only init on the scaled poses
        res1 = inertial.inertial_only_init(
            prob_s.factors, prob_s.Rwb, prob_s.pwb,
            jnp.ones(prob_s.Rwb.shape[0], bool), iterations=60)
        s_est = float(res1.scale)
        assert abs(s_est - 1.0 / s) < 0.1, s_est  # recovers 1/0.8 = 1.25
        # stage 2: re-anchor map with the recovered scale + velocities
        prob_r = prob_s._replace(pwb=prob_s.pwb * res1.scale,
                                 X=prob_s.X * res1.scale,
                                 vel=res1.vel)
        # stage 3: FullInertialBA polish
        res = vi_ba.vi_bundle_adjust(prob_r, "pinhole", K4, iterations=10,
                                     bias_prior=1e4)
        err_after = float(jnp.mean(jnp.linalg.norm(res.pwb - p_gt, -1)))
        err_before = float(jnp.mean(jnp.linalg.norm(prob_s.pwb - p_gt, -1)))
        assert err_after < 0.2 * err_before, (err_before, err_after)


class TestVIBASchurDense:
    def test_dense_matches_matrix_free(self):
        """The dense window solve (one-matmul PCG matvecs — the
        production LocalInertialBA path) must converge to the same
        solution as the matrix-free reference."""
        import numpy as np
        prob, truth = build_vi_problem(seed=3)
        r1 = vi_ba.vi_bundle_adjust(prob, "pinhole", K4, iterations=12,
                                    schur="pcg")
        r2 = vi_ba.vi_bundle_adjust(prob, "pinhole", K4, iterations=12,
                                    schur="dense")
        assert abs(float(r1.cost) - float(r2.cost)) < \
            0.02 * max(float(r1.cost), 1.0), (float(r1.cost),
                                              float(r2.cost))
        d = np.max(np.abs(np.asarray(r1.pwb) - np.asarray(r2.pwb)))
        assert d < 5e-3, d
