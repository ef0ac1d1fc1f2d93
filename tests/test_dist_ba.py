"""Distributed Schur BA on the virtual 8-device CPU mesh vs single-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orbslam3_tpu.ops import cameras, lie
from orbslam3_tpu.parallel import dist_ba
from orbslam3_tpu.solver import ba

K_EUROC = jnp.array([458.654, 457.296, 367.215, 248.375])


def synth_problem(key, n_cams=6, n_pts=256, obs_cap=2048, noise_px=0.0):
    keys = jax.random.split(key, 5)
    X = jax.random.normal(keys[0], (n_pts, 3)) * jnp.array([2.0, 2.0, 1.0]) \
        + jnp.array([0.0, 0.0, 6.0])
    dxi = 0.02 * jax.random.normal(keys[1], (n_cams, 6))
    dxi = dxi.at[0].set(0.0)
    Rn, tn = lie.se3_exp(dxi)
    t_base = jnp.stack([jnp.array([0.3 * i, 0.0, 0.0])
                        for i in range(n_cams)])
    R, t = Rn, tn + t_base
    obs_cam = jnp.tile(jnp.arange(n_cams), n_pts)[:obs_cap]
    obs_pt = jnp.repeat(jnp.arange(n_pts), n_cams)[:obs_cap]
    n_obs = obs_cam.shape[0]
    uv = cameras.pinhole_project(
        K_EUROC, lie.se3_apply(R[obs_cam], t[obs_cam], X[obs_pt]))
    uv = uv + noise_px * jax.random.normal(keys[2], uv.shape)
    fixed = jnp.zeros(n_cams, bool).at[0].set(True).at[1].set(True)
    # perturb initial state
    dxi2 = 0.01 * jax.random.normal(keys[3], (n_cams, 6))
    dxi2 = dxi2.at[0].set(0.0).at[1].set(0.0)
    dR, dt = lie.se3_exp(dxi2)
    Rp, tp = lie.se3_compose(dR, dt, R, t)
    Xp = X + 0.05 * jax.random.normal(keys[4], X.shape)
    return ba.BAProblem(
        R=Rp, t=tp, cam_fixed=fixed, cam_valid=jnp.ones(n_cams, bool),
        X=Xp, pt_valid=jnp.ones(n_pts, bool),
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=uv,
        obs_inv_sigma2=jnp.ones(n_obs),
        obs_valid=jnp.ones(n_obs, bool)), (R, t, X)


@pytest.mark.multichip
class TestDistBA:
    def test_matches_single_device(self):
        assert len(jax.devices()) >= 8, "needs 8 virtual devices"
        prob, (R_gt, t_gt, X_gt) = synth_problem(jax.random.PRNGKey(0))
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        probp = dist_ba.partition_problem(prob, 8)
        R, t, X, cost = dist_ba.dist_bundle_adjust(
            probp, mesh, cam_model="pinhole", cam_params=K_EUROC,
            iterations=10)
        # compare against ground truth (exact observations -> exact recovery)
        err_t = float(jnp.max(jnp.linalg.norm(t - t_gt, axis=-1)))
        assert err_t < 5e-3, err_t
        err_X = float(jnp.mean(jnp.linalg.norm(X - X_gt, axis=-1)))
        assert err_X < 5e-3, err_X

    def test_partition_preserves_obs(self):
        prob, _ = synth_problem(jax.random.PRNGKey(1))
        probp = dist_ba.partition_problem(prob, 8)
        assert int(probp.obs_valid.sum()) == int(prob.obs_valid.sum())
        # every valid obs kept its (cam, pt, uv) triple
        a = set()
        for c, p, u, v, ok in zip(np.asarray(prob.obs_cam),
                                  np.asarray(prob.obs_pt),
                                  np.asarray(prob.obs_uv[:, 0]),
                                  np.asarray(prob.obs_uv[:, 1]),
                                  np.asarray(prob.obs_valid)):
            if ok:
                a.add((int(c), int(p), float(u), float(v)))
        b = set()
        for c, p, u, v, ok in zip(np.asarray(probp.obs_cam),
                                  np.asarray(probp.obs_pt),
                                  np.asarray(probp.obs_uv[:, 0]),
                                  np.asarray(probp.obs_uv[:, 1]),
                                  np.asarray(probp.obs_valid)):
            if ok:
                b.add((int(c), int(p), float(u), float(v)))
        assert a == b
        # shard-locality: every obs lives on its point's shard
        pts_per = prob.X.shape[0] // 8
        obs_per = prob.obs_cam.shape[0] // 8
        for i, (p, ok) in enumerate(zip(np.asarray(probp.obs_pt),
                                        np.asarray(probp.obs_valid))):
            if ok:
                assert i // obs_per == p // pts_per

    def test_comm_modes_agree(self):
        """The communication-avoiding 'dense' scheme (1 batched psum +
        1 cost psum per LM iteration) and the keyframe-block-sharded
        'camshard' scheme must converge to the same solution as the
        per-matvec-psum baseline (VERDICT r4 next-step #3: the ~35
        collectives/LM-iter latency floor is an algorithmic property;
        these modes remove it without changing the optimum).  n_cams=8
        so camshard's rows divide the mesh."""
        assert len(jax.devices()) >= 8, "needs 8 virtual devices"
        prob, (R_gt, t_gt, X_gt) = synth_problem(
            jax.random.PRNGKey(2), n_cams=8)
        mesh = Mesh(np.array(jax.devices()[:8]), ("shard",))
        probp = dist_ba.partition_problem(prob, 8)
        outs = {}
        for comm in ("matvec", "dense", "camshard"):
            R, t, X, cost = dist_ba.dist_bundle_adjust(
                probp, mesh, cam_model="pinhole", cam_params=K_EUROC,
                iterations=10, comm=comm)
            # exact observations -> every mode recovers ground truth
            err_t = float(jnp.max(jnp.linalg.norm(t - t_gt, axis=-1)))
            assert err_t < 5e-3, (comm, err_t)
            outs[comm] = (np.asarray(t), float(cost))
        # and the modes agree with each other to solver tolerance
        for comm in ("dense", "camshard"):
            d = np.max(np.abs(outs[comm][0] - outs["matvec"][0]))
            assert d < 2e-3, (comm, d)
