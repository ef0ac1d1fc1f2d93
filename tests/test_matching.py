import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.features.extractor import FeatureFrame
from orbslam3_tpu.ops import matching


def make_ff(xy, desc, angle=None, octave=None, valid=None):
    n = xy.shape[0]
    return FeatureFrame(
        xy=jnp.asarray(xy, jnp.float32),
        response=jnp.ones(n),
        octave=jnp.zeros(n, jnp.int32) if octave is None else jnp.asarray(octave),
        angle=jnp.zeros(n) if angle is None else jnp.asarray(angle),
        desc=jnp.asarray(desc, jnp.uint32),
        valid=jnp.ones(n, bool) if valid is None else jnp.asarray(valid))


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def corrupt(desc, rng, nbits):
    """Flip nbits random bits in each descriptor."""
    d = desc.copy()
    for i in range(d.shape[0]):
        for _ in range(nbits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            d[i, w] ^= np.uint32(1 << b)
    return d


class TestMatchNN:
    def test_exact_match_permutation(self):
        rng = np.random.default_rng(0)
        d1 = rand_desc(rng, 50)
        perm = rng.permutation(50)
        d2 = d1[perm]
        m = matching.match_nn(jnp.asarray(d1), jnp.asarray(d2))
        assert bool(jnp.all(m.valid))
        np.testing.assert_array_equal(np.asarray(m.idx), np.argsort(perm))
        assert int(jnp.max(m.dist)) == 0

    def test_noisy_match_with_threshold(self):
        rng = np.random.default_rng(1)
        d1 = rand_desc(rng, 40)
        d2 = corrupt(d1, rng, 10)  # ~10 bit flips << TH_LOW
        m = matching.match_nn(jnp.asarray(d1), jnp.asarray(d2),
                              max_dist=matching.TH_LOW)
        assert float(jnp.mean(m.valid)) > 0.9
        idx = np.asarray(m.idx)
        ok = idx[np.asarray(m.valid)]
        matched_right = np.mean(ok == np.nonzero(np.asarray(m.valid))[0])
        assert matched_right > 0.95

    def test_mask_blocks_pairs(self):
        rng = np.random.default_rng(2)
        d1 = rand_desc(rng, 10)
        d2 = d1.copy()
        mask = jnp.zeros((10, 10), bool)  # nothing allowed
        m = matching.match_nn(jnp.asarray(d1), jnp.asarray(d2), mask)
        assert not bool(jnp.any(m.valid))

    def test_duplicate_target_resolution(self):
        rng = np.random.default_rng(3)
        base = rand_desc(rng, 1)
        # two queries close to the same target; only the closer keeps it
        d1 = np.concatenate([corrupt(base, rng, 2), corrupt(base, rng, 8)])
        m = matching.match_nn(jnp.asarray(d1), jnp.asarray(base),
                              max_dist=matching.TH_LOW)
        v = np.asarray(m.valid)
        assert v.sum() == 1
        assert v[0]  # the 2-bit-flip query wins

    def test_nn_ratio_gate(self):
        rng = np.random.default_rng(4)
        base = rand_desc(rng, 1)
        # target 0 and target 1 both ~6 bits from query -> ambiguous, ratio kills
        d2 = np.concatenate([corrupt(base, rng, 6), corrupt(base, rng, 7)])
        m = matching.match_nn(jnp.asarray(base), jnp.asarray(d2),
                              max_dist=100, nn_ratio=0.6)
        assert not bool(m.valid[0])

    def test_rotation_histogram(self):
        rng = np.random.default_rng(5)
        d1 = rand_desc(rng, 100)
        d2 = d1.copy()
        # 90 consistent rotations of ~10 deg, 10 outliers at random rot
        ang1 = jnp.zeros(100)
        rots = np.full(100, 10.0)
        rots[:10] = rng.uniform(60, 300, 10)
        ang2 = jnp.asarray(-rots)  # rot = ang1 - ang2 = rots
        m = matching.match_nn(jnp.asarray(d1), jnp.asarray(d2),
                              angles_a=ang1, angles_b=ang2,
                              check_rotation=True)
        v = np.asarray(m.valid)
        assert v[10:].all()
        assert v[:10].sum() <= 2  # outliers rejected


class TestStrategies:
    def test_search_for_initialization_window(self):
        rng = np.random.default_rng(6)
        n = 30
        d = rand_desc(rng, n)
        xy1 = rng.uniform(50, 400, (n, 2)).astype(np.float32)
        xy2 = xy1 + rng.uniform(-5, 5, (n, 2))  # small motion
        f1 = make_ff(xy1, d)
        f2 = make_ff(xy2, corrupt(d, rng, 5))
        m = matching.search_for_initialization(f1, f2, radius=100.0)
        v = np.asarray(m.valid)
        assert v.mean() > 0.8
        np.testing.assert_array_equal(np.asarray(m.idx)[v], np.nonzero(v)[0])
        # far-away decoy excluded by window
        f2_far = make_ff(xy1 + 300.0, corrupt(d, rng, 2))
        m2 = matching.search_for_initialization(f1, f2_far, radius=100.0)
        assert not bool(jnp.any(m2.valid))

    def test_projection_mask_octave_and_radius(self):
        uv = jnp.array([[100.0, 100.0]])
        pred_oct = jnp.array([2])
        pv = jnp.array([True])
        xy_f = jnp.array([[101.0, 99.0], [100.0, 140.0], [101.0, 100.0]])
        oct_f = jnp.array([1, 2, 7])
        kv = jnp.ones(3, bool)
        sf = jnp.asarray(1.2 ** np.arange(8), jnp.float32)
        m = matching.projection_mask(uv, pred_oct, pv, xy_f, oct_f, kv, sf,
                                     radius_th=4.0)
        # kp0: close + octave in [1,3] -> ok; kp1: too far; kp2: octave 7 no
        np.testing.assert_array_equal(np.asarray(m[0]), [True, False, False])

    def test_epipolar_mask(self):
        # F for pure horizontal translation: y2 = y1 (epipolar lines horizontal)
        F = jnp.array([[0.0, 0, 0], [0, 0, -1], [0, 1, 0]])
        xy_a = jnp.array([[100.0, 50.0]])
        xy_b = jnp.array([[200.0, 50.5], [200.0, 80.0]])
        s2 = jnp.ones(2)
        m = matching.epipolar_mask(xy_a, xy_b, F, s2)
        np.testing.assert_array_equal(np.asarray(m[0]), [True, False])
