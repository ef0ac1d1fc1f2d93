"""Window-gather regression tests.

The local-BA window gatherers cap the camera set at `cap_cams`.  The
selection must keep the IN-WINDOW (newest) keyframes when more cameras
than the cap observe the window's points — an unscored compact keeps the
lowest indices, i.e. the OLDEST anchors, and silently drops the live
window (measured on the vi-loop drive: the VI window BA became a no-op
once points were co-observed by >16 KFs, tracking drifted IMU-
inconsistent at ~0.1 deg/KF and the VIBA2 scale estimate hit 0.69 on a
metric map).  Reference semantics: the window KFs are always vertices,
outside observers are the fixed anchors (src/Optimizer.cc:1069-1140).
"""
import jax.numpy as jnp
import numpy as np

from orbslam3_tpu.pipeline import mapping
from orbslam3_tpu.slam_map import feature_bank, state as mapstate


def _crowded_map(n_kf=24, n_pt=20, kf_cap=32, kp=32):
    """Every point observed by every KF -> touched cams >> cap_cams."""
    cap = mapstate.MapCapacity(n_kf=kf_cap, n_pt=256, n_obs=2048)
    m = mapstate.empty_map(cap)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n_pt, 3)).astype(np.float32) +
                      np.array([0, 0, 5], np.float32))
    for k in range(n_kf):
        t = jnp.asarray([0.1 * k, 0.0, 0.0], jnp.float32)
        m, _ = mapstate.add_keyframe(m, jnp.eye(3), t, float(k), k)
    m, pts = mapstate.add_points(
        m, xyz, jnp.zeros((n_pt, 8), jnp.uint32), jnp.zeros((n_pt, 3)),
        jnp.full(n_pt, 0.1), jnp.full(n_pt, 10.0),
        jnp.zeros(n_pt, jnp.int32), 0, jnp.ones(n_pt, bool))
    bank = feature_bank.empty_bank(kf_cap, kp)
    for k in range(n_kf):
        uv = jnp.asarray(rng.uniform(0, 100, size=(n_pt, 2)), jnp.float32)
        m = mapstate.add_observations(
            m, jnp.full(n_pt, k, jnp.int32), pts, uv,
            jnp.zeros(n_pt, jnp.int32), jnp.ones(n_pt, bool))
        kp_pt = jnp.full(kp, -1, jnp.int32).at[:n_pt].set(pts)
        ff_xy = jnp.zeros((kp, 2), jnp.float32).at[:n_pt].set(uv)
        bank = bank._replace(
            xy=bank.xy.at[k].set(ff_xy),
            valid=bank.valid.at[k].set(jnp.arange(kp) < n_pt),
            kp_pt=bank.kp_pt.at[k].set(kp_pt))
    return m, bank


class TestWindowSurvivesAnchorCrowding:
    def _assert_window_selected(self, cam_sel, cam_ok, fixed, center, win):
        sel = set(np.asarray(cam_sel)[np.asarray(cam_ok)].tolist())
        for k in range(center - win + 1, center + 1):
            assert k in sel, f"window KF {k} evicted by anchors: {sel}"
        # and the window cams must be FREE, not fixed
        sel_arr = np.asarray(cam_sel)
        fx = np.asarray(fixed)
        for k in range(max(center - win + 1, 1), center + 1):
            at = np.nonzero(sel_arr == k)[0]
            assert at.size and not fx[at[0]], f"window KF {k} fixed"

    def test_problem_bank_temporal(self):
        m, bank = _crowded_map()
        prob, cam_sel, cam_ok, _, _ = mapping.gather_window_problem_bank(
            m, bank, jnp.asarray(23), window=4, n_levels=4,
            scale_factor=1.2, cap_cams=8, cap_pts=64, cap_obs=512,
            window_mode="temporal", min_anchors=1)
        self._assert_window_selected(cam_sel, cam_ok, prob.cam_fixed,
                                     23, 4)

    def test_problem_coo_temporal(self):
        m, _ = _crowded_map()
        prob, cam_sel, cam_ok, _, _ = mapping.gather_window_problem(
            m, jnp.asarray(23), window=4, n_levels=4, scale_factor=1.2,
            cap_cams=8, cap_pts=64, cap_obs=512,
            window_mode="temporal", min_anchors=1)
        self._assert_window_selected(cam_sel, cam_ok, prob.cam_fixed,
                                     23, 4)

    def test_grid_temporal(self):
        m, _ = _crowded_map()
        prob, cam_sel, cam_ok, _, _ = mapping.gather_window_grid(
            m, jnp.asarray(23), window=4, n_levels=4, scale_factor=1.2,
            cap_cams=8, cap_pts=64, window_mode="temporal",
            min_anchors=1)
        self._assert_window_selected(cam_sel, cam_ok, prob.cam_fixed,
                                     23, 4)

    def test_grid_bank_covis(self):
        m, bank = _crowded_map()
        prob, cam_sel, cam_ok, _, _ = mapping.gather_window_grid_bank(
            m, bank, jnp.asarray(23), window=4, n_levels=4,
            scale_factor=1.2, cam_model="pinhole",
            cam_params=jnp.asarray([100.0, 100.0, 50.0, 50.0]),
            cap_cams=8, cap_pts=64, window_mode="covis", min_anchors=1)
        # covis window: center + top covisible; at minimum the center
        # must survive and be free
        sel = np.asarray(cam_sel)[np.asarray(cam_ok)]
        assert 23 in sel.tolist()
        at = np.nonzero(np.asarray(cam_sel) == 23)[0]
        assert not np.asarray(prob.cam_fixed)[at[0]]

    def test_anchors_fill_remaining_capacity(self):
        m, bank = _crowded_map()
        _, cam_sel, cam_ok, _, _ = mapping.gather_window_problem_bank(
            m, bank, jnp.asarray(23), window=4, n_levels=4,
            scale_factor=1.2, cap_cams=8, cap_pts=64, cap_obs=512,
            window_mode="temporal", min_anchors=1)
        sel = set(np.asarray(cam_sel)[np.asarray(cam_ok)].tolist())
        anchors = sel - {20, 21, 22, 23}
        assert len(anchors) == 4  # cap 8 = 4 window + 4 anchors
