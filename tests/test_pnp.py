import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.geometry import pnp
from orbslam3_tpu.ops import cameras, lie

K4 = jnp.array([458.654, 457.296, 367.215, 248.375])


def scene(key, n=120, noise=0.4):
    keys = jax.random.split(key, 3)
    X = jax.random.normal(keys[0], (n, 3)) * jnp.array([2.0, 2.0, 1.2]) \
        + jnp.array([0.0, 0.0, 6.0])
    R = lie.exp_so3(jnp.array([0.2, -0.3, 0.1]))
    t = jnp.array([0.4, -0.2, 0.3])
    uv = cameras.pinhole_project(K4, lie.se3_apply(R, t, X))
    uv = uv + noise * jax.random.normal(keys[1], uv.shape)
    return X, uv, R, t


class TestPnP:
    def test_recovers_pose_no_prior(self):
        X, uv, R, t = scene(jax.random.PRNGKey(0))
        res = pnp.solve_pnp(X, uv, jnp.ones(X.shape[0], bool),
                            "pinhole", K4, jax.random.PRNGKey(1))
        assert bool(res.success), int(res.n_inliers)
        assert float(jnp.linalg.norm(lie.log_so3(res.R.T @ R))) < 5e-3
        assert float(jnp.linalg.norm(res.t - t)) < 2e-2

    def test_outlier_robust(self):
        X, uv, R, t = scene(jax.random.PRNGKey(2))
        n = X.shape[0]
        nb = n // 3
        uv = uv.at[:nb].set(jax.random.uniform(
            jax.random.PRNGKey(3), (nb, 2), minval=0, maxval=700))
        res = pnp.solve_pnp(X, uv, jnp.ones(n, bool),
                            "pinhole", K4, jax.random.PRNGKey(4))
        assert bool(res.success)
        assert float(jnp.linalg.norm(res.t - t)) < 3e-2
        inl = np.asarray(res.inliers)
        assert inl[:nb].mean() < 0.15

    def test_degenerate_few_points(self):
        X, uv, R, t = scene(jax.random.PRNGKey(5))
        valid = jnp.zeros(X.shape[0], bool).at[:8].set(True)
        res = pnp.solve_pnp(X, uv, valid, "pinhole", K4,
                            jax.random.PRNGKey(6), min_inliers=30)
        assert not bool(res.success)  # under min_inliers => reject


class TestReferenceRegime:
    """Equivalence study under the reference MLPnP RANSAC regime
    (src/Tracking.cc:838-845: prob .95, minInliers 50, maxIts 300,
    minSet 12) with octave-dependent measurement covariances — the ML
    part of MLPnP (MLPnPsolver.h:63-73)."""

    def _octave_scene(self, seed, n=200, outlier_frac=0.4):
        rng = np.random.default_rng(seed)
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-3, 3, n),
                      rng.uniform(4, 9, n)], 1).astype(np.float32)
        R = np.asarray(lie.exp_so3(jnp.asarray([0.25, -0.15, 0.3])),
                       np.float32)
        t = np.array([0.3, -0.4, 0.5], np.float32)
        uv = np.asarray(cameras.pinhole_project(
            K4, lie.se3_apply(jnp.asarray(R), jnp.asarray(t),
                              jnp.asarray(X))))
        # octave-dependent noise: sigma = 1.2^octave px (the covariance
        # MLPnP propagates into its bearing-space information matrices)
        octv = rng.integers(0, 8, n)
        sig = 1.2 ** octv
        uv = uv + (sig[:, None] * rng.standard_normal((n, 2))).astype(
            np.float32)
        # 30-50% gross outliers, as in the study regime
        nb = int(outlier_frac * n)
        bad = rng.choice(n, nb, replace=False)
        uv[bad] = rng.uniform([10, 10], [740, 470], (nb, 2))
        inv_s2 = (1.0 / (sig * sig)).astype(np.float32)
        return (jnp.asarray(X), jnp.asarray(uv), jnp.asarray(inv_s2),
                R, t, bad)

    def test_pose_recovery_at_reference_params(self):
        errs_r, errs_t = [], []
        for seed in range(5):
            X, uv, inv_s2, R, t, bad = self._octave_scene(
                seed, outlier_frac=0.3 + 0.05 * seed)  # 30..50%
            res = pnp.solve_pnp(
                X, uv, jnp.ones(X.shape[0], bool), "pinhole", K4,
                jax.random.PRNGKey(100 + seed), iterations=300,
                sample=12, min_inliers=50, inv_sigma2=inv_s2)
            assert bool(res.success), f"seed {seed}: {int(res.n_inliers)}"
            errs_r.append(float(jnp.linalg.norm(
                lie.log_so3(res.R.T @ jnp.asarray(R)))))
            errs_t.append(float(jnp.linalg.norm(res.t - jnp.asarray(t))))
        # ML-weighted recovery at the reference's operating point: the
        # rotation within ~0.6 deg and translation within 7 cm on a 6 m
        # deep scene across every outlier fraction in 30-50%
        assert max(errs_r) < 0.01, errs_r
        assert max(errs_t) < 0.07, errs_t

    def test_covariance_weighting_beats_unweighted(self):
        """The ML weighting must not be cosmetic: across seeds, weighted
        translation error <= unweighted on octave-heteroscedastic data."""
        gain = []
        for seed in range(6):
            X, uv, inv_s2, R, t, _ = self._octave_scene(7 + seed,
                                                        outlier_frac=0.35)
            kw = dict(iterations=300, sample=12, min_inliers=50)
            rw = pnp.solve_pnp(X, uv, jnp.ones(X.shape[0], bool),
                               "pinhole", K4, jax.random.PRNGKey(seed),
                               inv_sigma2=inv_s2, **kw)
            ru = pnp.solve_pnp(X, uv, jnp.ones(X.shape[0], bool),
                               "pinhole", K4, jax.random.PRNGKey(seed),
                               **kw)
            ew = float(jnp.linalg.norm(rw.t - jnp.asarray(t)))
            eu = float(jnp.linalg.norm(ru.t - jnp.asarray(t)))
            gain.append(eu - ew)
        assert np.mean(gain) > 0.0, gain
