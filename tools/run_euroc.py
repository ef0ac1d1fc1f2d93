"""Run monocular SLAM on a EuRoC sequence and report ATE.

Usage:
  python tools/run_euroc.py <sequence_dir> [--out traj.txt] [--max-frames N]

The sequence dir is the standard ASL layout (contains mav0/).  Images are
radtan-undistorted host-side with the EuRoC cam0 calibration, then fed to
the engine; the trajectory is evaluated against the EuRoC ground truth with
Horn+scale alignment (reference oracle: evaluation/evaluate_ate_scale.py).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--out", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--features", type=int, default=1200)
    args = ap.parse_args()

    import jax.numpy as jnp
    from orbslam3_tpu.features.extractor import OrbParams
    from orbslam3_tpu.io import euroc
    from orbslam3_tpu.eval import ate
    from orbslam3_tpu.pipeline import system as slam

    seq = euroc.EurocSequence(args.sequence)
    cam = euroc.EUROC_CAM0
    umap = euroc.undistort_map(cam["params"], cam["distortion"],
                               cam["resolution"])
    cfg = slam.SlamConfig(
        cam_model="pinhole", cam_params=cam["params"],
        image_hw=cam["resolution"],
        orb=OrbParams(n_features=args.features))
    sys_ = slam.System(cfg)

    n = len(seq.images) if not args.max_frames else \
        min(args.max_frames, len(seq.images))
    t0 = time.time()
    for i, rec in enumerate(seq.images[:n]):
        img = euroc.apply_undistort(seq.load_image(rec), umap)
        state, pose = sys_.track_monocular(jnp.asarray(img), rec.ts)
        if i % 100 == 0:
            el = time.time() - t0
            print(f"frame {i}/{n} state={state} kf={int(sys_.map.n_kf)} "
                  f"pts={int(sys_.map.n_pt)} ({el:.0f}s)", flush=True)
    wall = time.time() - t0
    print(f"processed {n} frames in {wall:.1f}s "
          f"({n / wall:.1f} fps), resets={sys_.n_resets}")

    if args.out:
        with open(args.out, "w") as f:
            f.write(sys_.trajectory_tum())
        print("trajectory ->", args.out)

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
