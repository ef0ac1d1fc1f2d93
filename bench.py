"""Benchmark: end-to-end monocular SLAM frames/s on synthetic EuRoC-like
frames, on the real TPU.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the C++ reference logs per-frame tracking
time with a 50 ms real-time pump; EuRoC-class CPU tracking is ~33 fps
(30 ms/frame).  vs_baseline is measured fps / 33.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from orbslam3_tpu.features.extractor import OrbParams, extract_jit
    from orbslam3_tpu.ops import matching
    from orbslam3_tpu.pipeline import tracking
    from orbslam3_tpu.slam_map import state as mapstate

    p = OrbParams(n_features=1200, n_levels=8)
    cam = jnp.asarray([458.654, 457.296, 367.215, 248.375], jnp.float32)
    cap = mapstate.MapCapacity(n_kf=64, n_pt=8192, n_obs=65536)

    rng = np.random.default_rng(0)
    # uint8 on the wire: 4x less host->device bandwidth, cast on device
    imgs = [jnp.asarray(rng.integers(0, 255, (480, 752), dtype=np.uint8))
            for _ in range(8)]

    # build a plausible map: points from extracted features at depth ~5
    ff0 = extract_jit(imgs[0], p)
    m = mapstate.empty_map(cap)
    n = int(jnp.sum(ff0.valid))
    rays = jnp.concatenate([
        (ff0.xy - cam[2:4]) / cam[0:2], jnp.ones((ff0.xy.shape[0], 1))], 1)
    X = rays * 5.0
    m, idx = mapstate.add_points(
        m, X, ff0.desc, rays / jnp.linalg.norm(rays, axis=1, keepdims=True),
        jnp.full(ff0.xy.shape[0], 2.0), jnp.full(ff0.xy.shape[0], 10.0),
        0, 0, ff0.valid)

    # The map is device-resident state (a closure constant): per-frame
    # inputs are only the image and the pose guess, like a deployed
    # tracker.  The pose output feeds the next frame's guess (constant-
    # velocity warm start), making the chain honestly sequential.
    @jax.jit
    def frame_step(img, R_guess, t_guess):
        ff = extract_jit(img, p)
        tr = tracking.track_local_map(
            m, ff, R_guess, t_guess, "pinhole", cam, (480, 752),
            radius_th=jnp.asarray(15.0))
        return tr.R, tr.t, tr.n_inliers

    R, t = jnp.eye(3), jnp.zeros(3)
    out = frame_step(imgs[0], R, t)
    jax.block_until_ready(out)

    iters = 50
    t0 = time.perf_counter()
    R, t = jnp.eye(3), jnp.zeros(3)
    for i in range(iters):
        R, t, n_inl = frame_step(imgs[i % len(imgs)], R, t)
    jax.block_until_ready((R, t))
    dt = time.perf_counter() - t0
    fps = iters / dt
    baseline_fps = 33.0  # see BASELINE.md: ~30 ms/frame CPU tracking class
    print(json.dumps({
        "metric": "mono_tracking_frames_per_second",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
