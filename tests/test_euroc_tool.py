"""End-to-end integration of tools/run_euroc.py on a generated
EuRoC-format (ASL-layout) dataset tree (VERDICT r3 item 9).

A synthetic sequence is written to disk exactly as EuRoC ships it:
mav0/cam0/data.csv + data/*.png (PNG-encoded, radtan-DISTORTED renders so
the tool's undistortion remap is exercised meaningfully), mav0/imu0/
data.csv at 200 Hz consistent with the camera path, and the GT csv.  The
tool's real main() then runs the loader -> (native or numpy) ingest ->
undistort -> pump -> System -> trajectory -> evaluate_ate chain.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from orbslam3_tpu.io import euroc
from orbslam3_tpu.utils import synth_render as sr

FPS = 20.0
IMU_HZ = 200.0
N_FRAMES = 60
G_W = np.array([0.0, 0.0, -9.81])


def radtan_rays(params, dist, hw):
    """(H, W, 3) camera rays whose pinhole projection THEN radtan
    distortion lands on each pixel — i.e. rendering with these rays
    produces a radtan-distorted image (cv::undistortPoints iteration)."""
    fx, fy, cx, cy = params[:4]
    k1, k2, p1, p2 = dist
    h, w = hw
    u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                       np.arange(h, dtype=np.float64))
    xd = (u - cx) / fx
    yd = (v - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(8):
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return np.stack([x, y, np.ones_like(x)], -1).astype(np.float32)


def cam_path(t):
    """Camera center + (constant) look-down orientation at time t.
    Fast low pass (1.2 m/s at 2.5 m over the plane): enough parallax for
    monocular init within ~3 frames at 20 Hz, before feature turnover
    erodes the reference-frame match count below the init gate."""
    x = 1.20 * t
    y = 0.20 * np.sin(0.8 * t)
    return sr.look_down_pose(x, y, 2.5)


def cam_center(t):
    return np.array([1.20 * t, 0.20 * np.sin(0.8 * t), -2.5])


def cam_accel(t):
    return np.array([0.0, -0.20 * 0.8 * 0.8 * np.sin(0.8 * t), 0.0])


@pytest.fixture(scope="module")
def euroc_tree(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("euroc_seq")
    cam_dir = root / "mav0" / "cam0" / "data"
    cam1_dir = root / "mav0" / "cam1" / "data"
    depth_dir = root / "mav0" / "depth0" / "data"
    imu_dir = root / "mav0" / "imu0"
    gt_dir = root / "mav0" / "state_groundtruth_estimate0"
    for d in (cam_dir, cam1_dir, depth_dir, imu_dir, gt_dir):
        d.mkdir(parents=True)

    cam = euroc.EUROC_CAM0
    cam1 = euroc.EUROC_CAM1
    rng = np.random.default_rng(3)
    tex = sr.block_texture(rng, block=10)
    rays = radtan_rays(cam["params"], cam["distortion"], cam["resolution"])
    rays1 = radtan_rays(cam1["params"], cam1["distortion"],
                        cam1["resolution"])
    # cam1 <- cam0 from the factory body extrinsics (T_BS = body<-sensor)
    T_c1_c0 = np.linalg.inv(cam1["T_BS"]) @ cam["T_BS"]
    # undistorted-pinhole pixel rays for the aligned depth images
    h, w = cam["resolution"]
    fx, fy, cx, cy = cam["params"]
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    rays_ud = np.stack([(uu - cx) / fx, (vv - cy) / fy,
                        np.ones_like(uu)], -1)

    cam_rows = []
    gt_rows = []
    for i in range(N_FRAMES):
        t = i / FPS
        ts_ns = int(round(t * 1e9))
        R_cw, t_cw = cam_path(t)
        img = sr.render_plane(R_cw, t_cw, np.asarray(cam["params"]),
                              cam["resolution"], tex, tex_scale=80.0,
                              rays=rays)
        img = np.clip(img + rng.normal(0, 1.0, img.shape), 0,
                      255).astype(np.uint8)
        name = f"{ts_ns}.png"
        Image.fromarray(img, "L").save(str(cam_dir / name))
        cam_rows.append(f"{ts_ns},{name}")
        # right camera: same world plane through T_c1_w = T_c1_c0 T_c0_w
        R1_cw = T_c1_c0[:3, :3] @ R_cw
        t1_cw = T_c1_c0[:3, :3] @ t_cw + T_c1_c0[:3, 3]
        img1 = sr.render_plane(R1_cw.astype(np.float32),
                               t1_cw.astype(np.float32),
                               np.asarray(cam1["params"]),
                               cam1["resolution"], tex, tex_scale=80.0,
                               rays=rays1)
        img1 = np.clip(img1 + rng.normal(0, 1.0, img1.shape), 0,
                       255).astype(np.uint8)
        Image.fromarray(img1, "L").save(str(cam1_dir / name))
        # aligned metric depth (undistorted pinhole frame, like the RGB
        # the tool undistorts): ray-plane intersection with z=0
        Rwc = np.asarray(R_cw).T
        twc = -Rwc @ np.asarray(t_cw)
        d_w = rays_ud @ Rwc.T                 # (H, W, 3) world dirs
        s = -twc[2] / np.maximum(d_w[..., 2], 1e-6)
        depth16 = np.clip(s * 5000.0, 0, 65535).astype(np.uint16)
        Image.fromarray(depth16).save(str(depth_dir / name))
        c = cam_center(t)
        gt_rows.append(f"{ts_ns},{c[0]},{c[1]},{c[2]},1,0,0,0")
    (root / "mav0" / "cam0" / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")
    (root / "mav0" / "cam1" / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")
    (root / "mav0" / "depth0" / "data.csv").write_text(
        "#timestamp [ns],filename\n" + "\n".join(cam_rows) + "\n")
    (gt_dir / "data.csv").write_text(
        "#timestamp, p_x, p_y, p_z, qw, qx, qy, qz\n" +
        "\n".join(gt_rows) + "\n")

    # IMU at 200 Hz consistent with the path: constant orientation
    # (gyro = 0), accelerometer = R_bw (a_w - g_w)
    Tbc = euroc.EUROC_IMU["Tbc"]
    Rbc = Tbc[:3, :3]
    R_cw0, _ = cam_path(0.0)
    Rbw = Rbc @ R_cw0
    imu_rows = []
    n_imu = int(N_FRAMES / FPS * IMU_HZ) + 1
    for k in range(n_imu):
        t = k / IMU_HZ
        a_body = Rbw @ (cam_accel(t) - G_W)
        imu_rows.append(f"{int(round(t * 1e9))},0,0,0,"
                        f"{a_body[0]},{a_body[1]},{a_body[2]}")
    (imu_dir / "data.csv").write_text(
        "#timestamp,wx,wy,wz,ax,ay,az\n" + "\n".join(imu_rows) + "\n")
    return str(root)


@pytest.mark.slow
class TestRunEurocTool:
    def _run(self, argv, capsys):
        import run_euroc
        old = sys.argv
        sys.argv = ["run_euroc.py"] + argv
        try:
            run_euroc.main()
        finally:
            sys.argv = old
        return capsys.readouterr().out

    def test_mono_end_to_end(self, euroc_tree, capsys, tmp_path):
        out_traj = str(tmp_path / "traj.txt")
        out = self._run([euroc_tree, "--mode", "mono", "--out", out_traj,
                         "--features", "1200"], capsys)
        assert f"processed {N_FRAMES} frames" in out, out
        assert "resets=0" in out, out
        # trajectory file in TUM format with most frames present
        lines = [ln for ln in open(out_traj).read().splitlines() if ln]
        assert len(lines) > 0.6 * N_FRAMES, len(lines)
        assert len(lines[0].split()) == 8   # ts tx ty tz qx qy qz qw
        # the ATE oracle ran against the generated GT and is sane
        assert "ATE: rmse=" in out, out
        rmse = float(out.split("ATE: rmse=")[1].split()[0])
        span = np.linalg.norm(cam_center(N_FRAMES / FPS) - cam_center(0.0))
        assert np.isfinite(rmse) and rmse < 0.15 * span, (rmse, span)

    def test_stereo_end_to_end(self, euroc_tree, capsys, tmp_path):
        """RAW cam0+cam1 through the calibration-derived rectification
        maps into the StereoSystem; metric scale (no alignment scale
        needed) — VERDICT r4 weak #4 (this arm had never executed)."""
        out_traj = str(tmp_path / "traj_st.txt")
        out = self._run([euroc_tree, "--mode", "stereo", "--out",
                         out_traj, "--features", "1200"], capsys)
        assert f"processed {N_FRAMES} frames" in out, out
        assert "resets=0" in out, out
        lines = [ln for ln in open(out_traj).read().splitlines() if ln]
        assert len(lines) > 0.6 * N_FRAMES
        assert "ATE: rmse=" in out, out
        rmse = float(out.split("ATE: rmse=")[1].split()[0])
        scale = float(out.split("scale=")[1].split()[0])
        span = np.linalg.norm(cam_center(N_FRAMES / FPS) - cam_center(0.0))
        assert rmse < 0.15 * span, (rmse, span)
        assert abs(scale - 1.0) < 0.1, f"stereo lost metric scale {scale}"

    def test_stereo_inertial_end_to_end(self, euroc_tree, capsys,
                                        tmp_path):
        """EuRoC stereo-inertial (reference Examples/Stereo-Inertial):
        rectified pair + IMU, fixed-scale inertial machinery."""
        out_traj = str(tmp_path / "traj_svi.txt")
        out = self._run([euroc_tree, "--mode", "stereo-inertial",
                         "--out", out_traj, "--features", "1200"], capsys)
        assert f"processed {N_FRAMES} frames" in out, out
        assert "resets=0" in out, out
        lines = [ln for ln in open(out_traj).read().splitlines() if ln]
        assert len(lines) > 0.6 * N_FRAMES
        rmse = float(out.split("ATE: rmse=")[1].split()[0])
        scale = float(out.split("scale=")[1].split()[0])
        span = np.linalg.norm(cam_center(N_FRAMES / FPS) - cam_center(0.0))
        assert rmse < 0.15 * span, (rmse, span)
        assert abs(scale - 1.0) < 0.1, scale

    def test_rgbd_end_to_end(self, euroc_tree, capsys, tmp_path):
        """--mode rgbd: undistorted RGB + aligned 16-bit metric depth
        (mav0/depth0) into RGBDSystem (VERDICT r4 weak #4: the tool had
        no rgbd arm despite RGBDSystem existing)."""
        out_traj = str(tmp_path / "traj_rgbd.txt")
        out = self._run([euroc_tree, "--mode", "rgbd", "--out", out_traj,
                         "--features", "1200"], capsys)
        assert f"processed {N_FRAMES} frames" in out, out
        assert "resets=0" in out, out
        lines = [ln for ln in open(out_traj).read().splitlines() if ln]
        assert len(lines) > 0.6 * N_FRAMES
        rmse = float(out.split("ATE: rmse=")[1].split()[0])
        scale = float(out.split("scale=")[1].split()[0])
        span = np.linalg.norm(cam_center(N_FRAMES / FPS) - cam_center(0.0))
        assert rmse < 0.15 * span, (rmse, span)
        assert abs(scale - 1.0) < 0.1, f"rgbd lost metric scale {scale}"

    def test_mono_inertial_pump(self, euroc_tree, capsys, tmp_path):
        """The IMU pump path: images + 200 Hz IMU through pump_euroc
        (SyncWithImu parity) into the InertialSystem."""
        out_traj = str(tmp_path / "traj_vi.txt")
        out = self._run([euroc_tree, "--mode", "mono-inertial",
                         "--out", out_traj, "--features", "1200"], capsys)
        assert f"processed {N_FRAMES} frames" in out, out
        assert "resets=0" in out, out
        lines = [ln for ln in open(out_traj).read().splitlines() if ln]
        assert len(lines) > 0.6 * N_FRAMES
        assert "ATE: rmse=" in out, out
