"""Multi-process (multi-host topology) distributed-BA correctness.

Spawns 2 JAX processes (2 virtual CPU devices each, Gloo as the DCN)
that run the engine's sharded pipeline BA over the GLOBAL 4-device
mesh, and checks the result matches a single-process 4-device run —
the multi-controller recipe of SURVEY §5.8 / the ≥2-host target,
exercised end to end on this machine.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["SLAM_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from orbslam3_tpu.parallel import multihost
multihost.initialize_from_env()
import jax.numpy as jnp
from orbslam3_tpu.ops import cameras, lie
from orbslam3_tpu.parallel import dist_ba
from orbslam3_tpu.solver import ba

mesh = multihost.global_mesh()
n_shards = mesh.devices.size
assert n_shards == 4, n_shards
K4 = jnp.asarray([458.654, 457.296, 367.215, 248.375], jnp.float32)
C, P, O = 6, 256, 1024
import numpy as np_
rng = np_.random.default_rng(0)
X = jnp.asarray(rng.normal(0, 1, (P, 3)) * [2, 2, 1] + [0, 0, 8], jnp.float32)
R = jnp.tile(jnp.eye(3)[None], (C, 1, 1))
t = jnp.asarray(np_.stack([np_.linspace(0, 1, C), np_.zeros(C), np_.zeros(C)], 1), jnp.float32)
obs_cam = jnp.asarray(rng.integers(0, C, O), jnp.int32)
obs_pt = jnp.asarray(np_.arange(O) % P, jnp.int32)
uv = cameras.pinhole_project(K4, lie.se3_apply(R[obs_cam], t[obs_cam], X[obs_pt]))
uv = uv + jnp.asarray(rng.normal(0, 0.5, (O, 2)), jnp.float32)
prob = ba.BAProblem(
    R=R, t=t, cam_fixed=jnp.arange(C) == 0, cam_valid=jnp.ones(C, bool),
    X=X + jnp.asarray(rng.normal(0, 0.02, (P, 3)), jnp.float32),
    pt_valid=jnp.ones(P, bool), obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=uv,
    obs_inv_sigma2=jnp.ones(O), obs_valid=jnp.ones(O, bool))
dprob = dist_ba.partition_problem(prob, n_shards)
R2, t2, X2, cost = dist_ba.dist_bundle_adjust(
    prob=dprob, mesh=mesh, cam_model="pinhole", cam_params=K4, iterations=4)
if jax.process_index() == 0:
    out = {"t": np_.asarray(t2).tolist(), "cost": float(cost)}
    open(os.environ["SLAM_OUT"], "w").write(json.dumps(out))
"""


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for n_proc, dev_per in ((1, 4), (2, 2)):
        procs = []
        out_path = str(tmp_path / f"out_{n_proc}.json")
        for pid in range(n_proc):
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            env["SLAM_REPO"] = repo
            env["SLAM_OUT"] = out_path
            env["SLAM_NUM_PROCESSES"] = str(n_proc)
            env["SLAM_PROCESS_ID"] = str(pid)
            env["SLAM_COORDINATOR"] = f"127.0.0.1:{29610 + n_proc}"
            env["XLA_FLAGS"] = (
                "--xla_force_host_platform_device_count=%d" % dev_per)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _WORKER], env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                text=True))
        errs = [p.communicate(timeout=300)[1] for p in procs]
        for p, e in zip(procs, errs):
            assert p.returncode == 0, e[-2000:]
        results[n_proc] = json.load(open(out_path))

    t1 = np.asarray(results[1]["t"])
    t2 = np.asarray(results[2]["t"])
    # same global mesh size + same data: the solves agree up to LM
    # accept/reject flips seeded by psum reduction order across the DCN
    # boundary (the cost comparison is a binary branch; the monocular
    # scale gauge then absorbs the difference) — assert equivalent
    # convergence, not bitwise equality
    assert np.isfinite(t1).all() and np.isfinite(t2).all()
    assert np.abs(t1 - t2).max() < 5e-2, np.abs(t1 - t2).max()
    true_tx = np.linspace(0, 1, 6)
    for t in (t1, t2):
        assert np.abs(t[:, 0] - true_tx).max() < 0.1
    assert abs(results[1]["cost"] - results[2]["cost"]) < \
        0.2 * max(results[1]["cost"], 1.0)
