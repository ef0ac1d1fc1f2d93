"""IO-layer tests: native ingest pipeline (decode -> remap -> resize ->
CLAHE), stereo rectification maps, and the sensor sync pump.

Parity targets: the reference grabber pipeline
(ros2_ws/src/mono-inertial/include/image_grabber.hpp:96-225) and
upstream Settings rectification (include/Settings.h:32-94).
"""

import os
import threading

import numpy as np
import pytest

from orbslam3_tpu.io import native_ingest, pump, rectify


# ---------------------------------------------------------------- oracles
def _resize_np(src, oh, ow):
    h, w = src.shape
    sy, sx = h / oh, w / ow
    ys = np.clip((np.arange(oh) + 0.5) * sy - 0.5, 0, h - 1.001)
    xs = np.clip((np.arange(ow) + 0.5) * sx - 0.5, 0, w - 1.001)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = src[np.ix_(y0, x0)]
    b = src[np.ix_(y0, x0 + 1)]
    c = src[np.ix_(y0 + 1, x0)]
    d = src[np.ix_(y0 + 1, x0 + 1)]
    return (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy


def _clahe_np(src, clip, grid):
    h, w = src.shape
    th, tw = -(-h // grid), -(-w // grid)
    area = th * tw
    lut = np.zeros((grid, grid, 256))
    # round-half-up, like the C++ (int)(v + 0.5) — np.rint is half-to-even
    q = np.clip(np.floor(src + 0.5), 0, 255).astype(np.int32)
    # reflect-101 padded tile histograms
    yy = np.arange(grid * th)
    yy = np.where(yy < h, yy, 2 * (h - 1) - yy)
    xx = np.arange(grid * tw)
    xx = np.where(xx < w, xx, 2 * (w - 1) - xx)
    qp = q[np.ix_(yy, xx)]
    climit = max(1, int(clip * area / 256.0))
    for ty in range(grid):
        for tx in range(grid):
            tile = qp[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=256)
            excess = int(np.sum(np.maximum(hist - climit, 0)))
            hist = np.minimum(hist, climit)
            hist += excess // 256
            hist[: excess % 256] += 1
            lut[ty, tx] = 255.0 / area * np.cumsum(hist)
    gy = np.clip((np.arange(h) + 0.5) / th - 0.5, 0, None)
    ty0 = np.minimum(gy.astype(np.int32), grid - 2)
    fy = np.clip(gy - ty0, 0, 1)[:, None]
    gx = np.clip((np.arange(w) + 0.5) / tw - 0.5, 0, None)
    tx0 = np.minimum(gx.astype(np.int32), grid - 2)
    fx = np.clip(gx - tx0, 0, 1)[None, :]
    TY = ty0[:, None] + np.zeros_like(tx0)[None, :]
    TX = tx0[None, :] + np.zeros_like(ty0)[:, None]
    l00 = lut[TY, TX, q]
    l01 = lut[TY, TX + 1, q]
    l10 = lut[TY + 1, TX, q]
    l11 = lut[TY + 1, TX + 1, q]
    return (l00 * (1 - fx) + l01 * fx) * (1 - fy) + \
        (l10 * (1 - fx) + l11 * fx) * fy


def _write_png(path, img):
    from PIL import Image
    Image.fromarray(img.astype(np.uint8), mode="L").save(path)


# ------------------------------------------------------------ native ingest
@pytest.mark.skipif(not native_ingest.available(),
                    reason="native ingest unavailable")
class TestNativeIngestPipeline:
    def test_resize_and_clahe_match_oracle(self, tmp_path):
        rng = np.random.default_rng(0)
        src = rng.integers(0, 255, (96, 128)).astype(np.float32)
        p = str(tmp_path / "f.png")
        _write_png(p, src)

        ing = native_ingest.NativeIngest(
            [p], (96, 128), resize_hw=(48, 64), clahe_clip=3.0,
            clahe_grid=4, n_threads=1)
        got = next(iter(ing))
        ing.close()

        want = _clahe_np(_resize_np(src, 48, 64), 3.0, 4)
        assert got.shape == (48, 64)
        # float/oracle rounding + the 1.001-px edge clamp differ by at most
        # ~1 graylevel after the CLAHE LUT
        assert np.max(np.abs(got - want)) < 1.5
        assert np.mean(np.abs(got - want)) < 0.1

    def test_remap_then_resize(self, tmp_path):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 255, (64, 80)).astype(np.float32)
        p = str(tmp_path / "g.png")
        _write_png(p, src)
        # identity remap at full size, then 2x downscale
        ys, xs = np.mgrid[0:64, 0:80].astype(np.float32)
        remap = np.stack([xs, ys], -1)
        ing = native_ingest.NativeIngest(
            [p], (64, 80), remap=remap, src_hw=(64, 80),
            resize_hw=(32, 40), n_threads=1)
        got = next(iter(ing))
        ing.close()
        want = _resize_np(src, 32, 40)
        # interior exact; the remap's 1.001-px edge clamp perturbs the
        # last row/column by <=0.25 graylevels
        assert np.max(np.abs(got[:-1, :-1] - want[:-1, :-1])) < 1e-3
        assert np.max(np.abs(got - want)) < 0.3

    def test_legacy_size_mismatch_still_fails(self, tmp_path):
        rng = np.random.default_rng(2)
        src = rng.integers(0, 255, (32, 32)).astype(np.float32)
        p = str(tmp_path / "h.png")
        _write_png(p, src)
        # no remap, declared src size differs from decoded: frame rejected
        ing = native_ingest.NativeIngest([p], (16, 16), src_hw=(16, 16),
                                         n_threads=1)
        got = next(iter(ing))
        assert ing.failed == 1 and np.all(got == 0)
        ing.close()


# ---------------------------------------------------------- stereo rectify
class TestStereoRectify:
    def _rig(self):
        K1 = (458.0, 457.0, 367.0, 248.0)
        K2 = (455.0, 454.0, 379.0, 255.0)
        d1 = (-0.28, 0.07, 2e-4, 1.8e-5)
        d2 = (-0.28, 0.07, -1e-4, 3e-5)
        ang = np.deg2rad(1.2)
        R = rectify._exp_so3(np.array([0.3, -0.5, 0.8]) * ang)
        t = np.array([-0.11, 0.0004, -0.0007])
        return K1, d1, K2, d2, R, t

    def test_rows_align_and_disparity(self):
        K1, d1, K2, d2, R, t = self._rig()
        hw = (480, 752)
        m1, m2, nk, baseline, R1, R2 = rectify.stereo_rectify(
            K1, d1, K2, d2, R, t, hw)
        assert abs(baseline - np.linalg.norm(t)) < 1e-9

        # random world points in front of cam1
        rng = np.random.default_rng(0)
        X1 = np.stack([rng.uniform(-1.5, 1.5, 64),
                       rng.uniform(-1.0, 1.0, 64),
                       rng.uniform(3.0, 8.0, 64)], 1)
        X2 = X1 @ R.T + t
        fx, fy, cx, cy = nk
        Y1 = X1 @ R1.T
        Y2 = X2 @ R2.T
        u1 = fx * Y1[:, 0] / Y1[:, 2] + cx
        v1 = fy * Y1[:, 1] / Y1[:, 2] + cy
        u2 = fx * Y2[:, 0] / Y2[:, 2] + cx
        v2 = fy * Y2[:, 1] / Y2[:, 2] + cy
        # epipolar rows align; disparity = f b / z and strictly positive
        assert np.max(np.abs(v1 - v2)) < 1e-6
        d = u1 - u2
        assert np.all(d > 0)
        assert np.max(np.abs(d - fx * baseline / Y1[:, 2])) < 1e-6

    def test_map_round_trip(self):
        """map (u,v) -> source pixel; re-rectifying that source pixel must
        land back at (u,v) (verifies rotation direction + distortion)."""
        K1, d1, K2, d2, R, t = self._rig()
        hw = (480, 752)
        m1, m2, nk, _, R1, R2 = rectify.stereo_rectify(
            K1, d1, K2, d2, R, t, hw)
        fx, fy, cx, cy = nk
        for (K, dist, Rr, mp) in ((K1, d1, R1, m1), (K2, d2, R2, m2)):
            us = np.array([100, 376, 650])
            vs = np.array([80, 240, 400])
            for u in us:
                for v in vs:
                    xs, ys = mp[v, u]
                    # undistort source pixel by fixed-point iteration
                    xd = (xs - K[2]) / K[0]
                    yd = (ys - K[3]) / K[1]
                    x, y = xd, yd
                    for _ in range(20):
                        xD, yD = rectify._distort(
                            np.asarray(x), np.asarray(y), dist, "radtan")
                        x, y = x + (xd - xD), y + (yd - yD)
                    ray = Rr @ np.array([x, y, 1.0])
                    ur = fx * ray[0] / ray[2] + cx
                    vr = fy * ray[1] / ray[2] + cy
                    assert abs(ur - u) < 1e-3 and abs(vr - v) < 1e-3

    def test_kb8_maps_finite(self):
        K1, d1, K2, d2, R, t = self._rig()
        kb = (0.01, -0.002, 0.0003, -4e-5)
        m1, m2, nk, _, _, _ = rectify.stereo_rectify(
            K1, kb, K2, kb, R, t, (480, 752), model="kb8")
        assert np.isfinite(m1).all() and np.isfinite(m2).all()


# ------------------------------------------------------------- sensor pump
class TestSensorPump:
    def test_imu_batching_and_timeshift(self):
        p = pump.SensorPump(timeshift_cam_imu=0.005)
        for k in range(100):                       # IMU 200 Hz
            p.feed_imu(k * 0.005, np.zeros(3), np.zeros(3))
        for i in range(8):                         # images 20 Hz
            p.feed_image(i * 0.05, np.full((4, 4), i, np.float32))
        p.finish()
        frames = list(p.sync())
        assert len(frames) == 8
        seen = 0
        last_t = -1.0
        for f in frames:
            assert f.ts == pytest.approx(f.index * 0.05 + 0.005)
            for (t, g, a) in f.imu:
                assert last_t < t <= f.ts + 1e-12
                last_t = t
            seen += len(f.imu)
        # every sample up to the last frame time is consumed exactly once
        assert seen == sum(1 for k in range(100)
                           if k * 0.005 <= frames[-1].ts)

    def test_gnss_attach_window(self):
        p = pump.SensorPump()
        p.feed_imu(10.0, np.zeros(3), np.zeros(3))
        p.feed_gnss(0.30, np.array([1.0, 2.0, 3.0]))
        p.feed_gnss(0.52, np.array([4.0, 5.0, 6.0]))
        for i in range(6):
            p.feed_image(i * 0.1, np.zeros((2, 2), np.float32))
        p.finish()
        frames = list(p.sync(require_imu=False, gnss_window=0.03))
        got = [(f.index, None if f.gnss is None else f.gnss[0])
               for f in frames]
        assert got[3] == (3, 1.0)      # fix at 0.30 matches frame t=0.3
        assert got[5] == (5, 4.0)      # fix at 0.52 within 30 ms of t=0.5
        assert got[0][1] is None and got[1][1] is None

    def test_threaded_producer(self):
        p = pump.SensorPump()

        def produce():
            for i in range(30):
                p.feed_imu(i * 0.01, np.zeros(3), np.zeros(3))
                if i % 3 == 2:
                    p.feed_image(i * 0.01 - 0.005,
                                 np.zeros((2, 2), np.float32))
            p.finish()

        th = threading.Thread(target=produce)
        th.start()
        frames = list(p.sync())
        th.join()
        assert len(frames) == 10
        assert [f.index for f in frames] == list(range(10))


# ------------------------------------------------------- euroc pump e2e
@pytest.mark.skipif(not native_ingest.available(),
                    reason="native ingest unavailable")
def test_pump_euroc_dataset(tmp_path):
    """Mini ASL-layout sequence through the full pump: native decode +
    CLAHE + IMU batching."""
    from orbslam3_tpu.io import euroc

    mav = tmp_path / "mav0"
    (mav / "cam0" / "data").mkdir(parents=True)
    (mav / "imu0").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["#ts,filename"]
    for i in range(5):
        name = f"{i:019d}.png"
        _write_png(str(mav / "cam0" / "data" / name),
                   rng.integers(0, 255, (48, 64)))
        rows.append(f"{int((1.0 + i * 0.05) * 1e9)},{name}")
    (mav / "cam0" / "data.csv").write_text("\n".join(rows))
    imu_rows = ["#ts,wx,wy,wz,ax,ay,az"]
    for k in range(120):
        imu_rows.append(f"{int((0.9 + k * 0.005) * 1e9)},0,0,0,0,0,9.81")
    (mav / "imu0" / "data.csv").write_text("\n".join(imu_rows))

    seq = euroc.EurocSequence(str(tmp_path))
    frames = list(pump.pump_euroc(seq, clahe_clip=2.0, n_threads=2))
    assert len(frames) == 5
    assert all(f.image.shape == (48, 64) for f in frames)
    assert all(len(f.imu) > 0 for f in frames[1:])
    assert all(np.isfinite(f.image).all() for f in frames)
