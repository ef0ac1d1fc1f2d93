"""Run SLAM on a EuRoC/TUM-VI sequence and report ATE.

Usage:
  python tools/run_euroc.py <sequence_dir> [--mode mono|mono-inertial|stereo]
         [--out traj.txt] [--max-frames N] [--viz map.png]

The sequence dir is the standard ASL layout (contains mav0/).  EuRoC
images are radtan-undistorted (native C++ ingest when available, host
numpy fallback); the trajectory is evaluated against the ground truth
with Horn+scale alignment (reference oracle evaluate_ate_scale.py).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--mode", default="mono",
                    choices=["mono", "mono-inertial", "stereo",
                             "stereo-inertial", "rgbd"])
    ap.add_argument("--depth-scale", type=float, default=5000.0,
                    help="rgbd: raw 16-bit depth units per meter "
                         "(TUM-RGBD convention 5000)")
    ap.add_argument("--dataset", default="euroc",
                    choices=["euroc", "tumvi"],
                    help="calibration preset family (tumvi = 512x512 "
                         "KB8 fisheye rig)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--viz", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--features", type=int, default=1200)
    ap.add_argument("--clahe", type=float, default=0.0,
                    help="CLAHE clip limit (0 = off), applied in ingest")
    ap.add_argument("--timeshift", type=float, default=0.0,
                    help="cam->IMU time offset [s] (grabber parity)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from orbslam3_tpu import config as presets
    from orbslam3_tpu.features.extractor import OrbParams
    from orbslam3_tpu.io import euroc, native_ingest, pump
    from orbslam3_tpu.eval import ate
    from orbslam3_tpu.pipeline import inertial_system, stereo_system
    from orbslam3_tpu.pipeline import system as slam

    seq = euroc.EurocSequence(args.sequence)
    tumvi = args.dataset == "tumvi"
    cam = euroc.TUMVI_CAM0 if tumvi else euroc.EUROC_CAM0
    orb = OrbParams(n_features=args.features)

    # TUM-VI mono modes consume raw KB8 fisheye pixels (cam_model="kb8",
    # no remap); EuRoC mono modes undistort radtan to the pinhole model
    maps = [None] if tumvi else \
        [euroc.undistort_map(cam["params"], cam["distortion"],
                             cam["resolution"])]
    if args.mode == "mono":
        cfg = (presets.tumvi_mono if tumvi else presets.euroc_mono)(orb=orb)
        sys_ = slam.System(cfg)
    elif args.mode == "mono-inertial":
        cfg, icfg = (presets.tumvi_mono_inertial if tumvi
                     else presets.euroc_mono_inertial)(orb=orb)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
    elif args.mode == "stereo-inertial":
        # KB8 fisheye pair (TUM-VI) or radtan pair (EuRoC) rectified to
        # a shared virtual pinhole, fixed-scale inertial init
        from orbslam3_tpu.pipeline import stereo_inertial_system
        mk = presets.tumvi_stereo_inertial if tumvi \
            else presets.euroc_stereo_inertial
        cfg, icfg, scfg, map0, map1 = mk(orb=orb)
        sys_ = stereo_inertial_system.StereoInertialSystem(cfg, icfg, scfg)
        maps = [map0, map1]
        seq_r = euroc.EurocSequence(args.sequence, cam="cam1")
    elif args.mode == "rgbd":
        # aligned metric depth in mav0/depth0/data/<ts>.png (16-bit,
        # depth_scale units per meter); RGB undistorted like mono
        if tumvi:
            ap.error("--mode rgbd uses the EuRoC pinhole preset; "
                     "--dataset tumvi (raw KB8 fisheye) is not a valid "
                     "combination")
        from orbslam3_tpu.pipeline import rgbd_system
        cfg, scfg = presets.euroc_rgbd(orb=orb)
        sys_ = rgbd_system.RGBDSystem(cfg, scfg)
        seq_d = euroc.EurocSequence(args.sequence, cam="depth0")
    else:
        # RAW cam0+cam1 through calibration-derived rectification maps
        cfg, scfg, map0, map1 = presets.euroc_stereo_rectified(orb=orb)
        sys_ = stereo_system.StereoSystem(cfg, scfg)
        maps = [map0, map1]
        seq_r = euroc.EurocSequence(args.sequence, cam="cam1")

    n = len(seq.images) if not args.max_frames else \
        min(args.max_frames, len(seq.images))

    def make_stream(s, umap):
        """Native threaded ingest when the .so builds, numpy fallback."""
        if native_ingest.available():
            return iter(native_ingest.NativeIngest(
                [r.path for r in s.images[:n]], cam["resolution"], umap,
                src_hw=cam["resolution"], clahe_clip=args.clahe))
        return (s.load_image(s.images[i]) if umap is None else
                euroc.apply_undistort(s.load_image(s.images[i]), umap)
                for i in range(n))

    t0 = time.time()
    i = 0
    if args.mode == "stereo":
        left, right = make_stream(seq, maps[0]), make_stream(seq_r, maps[1])
        for i in range(n):
            rec = seq.images[i]
            state, pose = sys_.track_stereo(
                jnp.asarray(next(left)), jnp.asarray(next(right)), rec.ts)
            if i % 100 == 0:
                print(f"frame {i}/{n} state={state} kf={sys_.n_kf_host} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    elif args.mode == "stereo-inertial":
        # left camera + IMU through the sync pump; right camera decoded
        # in lockstep (pair indices align in the ASL layout)
        seq_r.images = seq_r.images[:n]
        right = make_stream(seq_r, maps[1])
        seq.images = seq.images[:n]
        for fr in pump.pump_euroc(seq, remap=maps[0],
                                  timeshift_cam_imu=args.timeshift,
                                  clahe_clip=args.clahe):
            for (t_imu, gyro, acc) in fr.imu:
                sys_.grab_imu(t_imu, gyro, acc)
            state, pose = sys_.track_stereo(
                jnp.asarray(fr.image), jnp.asarray(next(right)), fr.ts)
            i = fr.index
            if i % 100 == 0:
                print(f"frame {i}/{n} state={state} kf={sys_.n_kf_host} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    elif args.mode == "rgbd":
        from PIL import Image
        left = make_stream(seq, maps[0])
        for i in range(n):
            rec = seq.images[i]
            depth = np.asarray(
                Image.open(seq_d.images[i].path),
                dtype=np.float32) / args.depth_scale
            state, pose = sys_.track_rgbd(
                jnp.asarray(next(left)), depth, rec.ts)
            if i % 100 == 0:
                print(f"frame {i}/{n} state={state} kf={sys_.n_kf_host} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    else:
        # image+IMU through the sensor sync pump (reference SyncWithImu
        # batching semantics, image_grabber.hpp:113-225)
        seq.images = seq.images[:n]
        for fr in pump.pump_euroc(seq, remap=maps[0],
                                  timeshift_cam_imu=args.timeshift,
                                  clahe_clip=args.clahe):
            if args.mode == "mono-inertial":
                for (t_imu, gyro, acc) in fr.imu:
                    sys_.grab_imu(t_imu, gyro, acc)
            state, pose = sys_.track_monocular(jnp.asarray(fr.image), fr.ts)
            i = fr.index
            if i % 100 == 0:
                print(f"frame {i}/{n} state={state} kf={sys_.n_kf_host} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s ({n / wall:.1f} fps), "
          f"resets={sys_.n_resets}")

    if args.out:
        with open(args.out, "w") as f:
            f.write(sys_.trajectory_tum())
        print("trajectory ->", args.out)
    if args.viz:
        from orbslam3_tpu import viz
        print("map plot ->", viz.plot_map(sys_, args.viz))

    try:
        gt_ts, gt_xyz = seq.read_groundtruth()
        est_ts = np.asarray([p[0] for p in sys_.trajectory])
        est_xyz = np.stack([p[2] for p in sys_.trajectory])
        r = ate.evaluate_ate(est_ts, est_xyz, gt_ts, gt_xyz)
        print("ATE: rmse=%.4f m  median=%.4f m  scale=%.3f  pairs=%d" %
              (r["rmse"], r["median"], r["scale"], r["n_pairs"]))
    except FileNotFoundError:
        print("no ground truth found; skipping ATE")


if __name__ == "__main__":
    main()
