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
                    choices=["mono", "mono-inertial", "stereo"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--viz", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--features", type=int, default=1200)
    args = ap.parse_args()

    import jax.numpy as jnp
    from orbslam3_tpu import config as presets
    from orbslam3_tpu.features.extractor import OrbParams
    from orbslam3_tpu.io import euroc, native_ingest
    from orbslam3_tpu.eval import ate
    from orbslam3_tpu.pipeline import inertial_system, stereo_system
    from orbslam3_tpu.pipeline import system as slam

    seq = euroc.EurocSequence(args.sequence)
    cam = euroc.EUROC_CAM0
    orb = OrbParams(n_features=args.features)

    if args.mode == "mono":
        cfg = presets.euroc_mono(orb=orb)
        sys_ = slam.System(cfg)
    elif args.mode == "mono-inertial":
        cfg, icfg = presets.euroc_mono_inertial(orb=orb)
        sys_ = inertial_system.InertialSystem(cfg, icfg)
    else:
        cfg, scfg = presets.euroc_stereo(orb=orb)
        sys_ = stereo_system.StereoSystem(cfg, scfg)

    umap = euroc.undistort_map(cam["params"], cam["distortion"],
                               cam["resolution"])
    n = len(seq.images) if not args.max_frames else \
        min(args.max_frames, len(seq.images))

    # frame source: native threaded ingest when the .so builds
    if native_ingest.available():
        stream = iter(native_ingest.NativeIngest(
            [r.path for r in seq.images[:n]], cam["resolution"], umap,
            src_hw=cam["resolution"]))
        get_frame = lambda i: next(stream)
        print("using native C++ ingest")
    else:
        get_frame = lambda i: euroc.apply_undistort(
            seq.load_image(seq.images[i]), umap)

    imu_cursor = 0
    t0 = time.time()
    for i in range(n):
        rec = seq.images[i]
        img = get_frame(i)
        if args.mode == "mono-inertial":
            while imu_cursor < len(seq.imu) and \
                    seq.imu[imu_cursor].ts <= rec.ts:
                r = seq.imu[imu_cursor]
                sys_.grab_imu(r.ts, r.gyro, r.acc)
                imu_cursor += 1
        state, pose = sys_.track_monocular(jnp.asarray(img), rec.ts)
        if i % 100 == 0:
            print(f"frame {i}/{n} state={state} kf={int(sys_.map.n_kf)} "
                  f"pts={int(sys_.map.n_pt)} ({time.time() - t0:.0f}s)",
                  flush=True)
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
