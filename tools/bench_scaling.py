"""Distributed-BA scaling benchmark: 1..N shards over the available mesh.

Reports LM iterations/s of the distributed Schur bundle adjuster at each
shard count and the scaling efficiency vs 1 shard (the BASELINE.json
"report 1 chip / 1 host / N hosts" requirement; on a 1-chip dev setup run
with JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to exercise the collective path on a virtual mesh).

Usage: python tools/bench_scaling.py [--cams 64] [--pts 16384] [--obs 131072]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=64)
    ap.add_argument("--pts", type=int, default=16384)
    ap.add_argument("--obs", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from orbslam3_tpu.ops import cameras, lie
    from orbslam3_tpu.parallel import dist_ba
    from orbslam3_tpu.solver import ba

    K4 = jnp.asarray([458.654, 457.296, 367.215, 248.375], jnp.float32)
    n_dev = len(jax.devices())
    key = jax.random.PRNGKey(0)
    C, P, O = args.cams, args.pts, args.obs
    X = jax.random.normal(key, (P, 3)) + jnp.array([0.0, 0.0, 8.0])
    R = jnp.tile(jnp.eye(3), (C, 1, 1))
    t = jnp.stack([jnp.array([0.2 * i, 0.0, 0.0]) for i in range(C)])
    obs_cam = jax.random.randint(jax.random.PRNGKey(1), (O,), 0, C)
    obs_pt = jax.random.randint(jax.random.PRNGKey(2), (O,), 0, P)
    uv = cameras.pinhole_project(
        K4, lie.se3_apply(R[obs_cam], t[obs_cam], X[obs_pt]))
    prob = ba.BAProblem(
        R=R, t=t,
        cam_fixed=jnp.zeros(C, bool).at[0].set(True).at[1].set(True),
        cam_valid=jnp.ones(C, bool),
        X=X + 0.01, pt_valid=jnp.ones(P, bool),
        obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=uv,
        obs_inv_sigma2=jnp.ones(O), obs_valid=jnp.ones(O, bool))

    results = {}
    shard_counts = [s for s in [1, 2, 4, 8] if s <= n_dev and
                    P % s == 0 and O % s == 0]
    for s in shard_counts:
        mesh = Mesh(np.array(jax.devices()[:s]), ("shard",))
        probp = dist_ba.partition_problem(prob, s)
        run = lambda: dist_ba.dist_bundle_adjust(
            probp, mesh, cam_model="pinhole", cam_params=K4,
            iterations=args.iters)
        jax.block_until_ready(run())  # compile
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        ips = args.iters / dt
        results[s] = ips
        eff = ips / (results[1] * 1) if 1 in results else 1.0
        print(f"shards={s:2d}  LM iters/s={ips:8.2f}  "
              f"efficiency vs 1 shard={eff:0.2f}", flush=True)
    if len(results) > 1:
        smax = max(results)
        eff = results[smax] / (results[1] * 1)
        print(f"\nscaling {1}->{smax} shards: {eff:0.2f}x throughput "
              f"({eff / 1:0.2f} efficiency on this fabric)")


if __name__ == "__main__":
    main()
