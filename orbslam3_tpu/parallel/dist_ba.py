"""Distributed Schur-complement bundle adjustment over a device mesh.

This is the build's "model parallelism" (SURVEY §2.11, §5.7): map points
and their observations are sharded across devices; each shard marginalizes
its own points (embarrassingly parallel) and the reduced camera system is
solved matrix-free by PCG whose K-sized contractions are `psum`s over the
ICI — the same `solver.ba._solve_schur` code path as single-device, with
`reduce=psum`.  The reference's equivalent is a single-threaded g2o sparse
solve (src/Optimizer.cc:74-85) — there is no distribution to port, this is
the TPU-native design the driver's north star prescribes.

Sharding invariant: observations must be partitioned so that all
observations of a point live on that point's shard (`partition_problem`
does this host-side once per solve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import lie
from ..solver import ba as ba_mod
from ..solver.ba import BAProblem

_HI = jax.lax.Precision.HIGHEST


def partition_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Repack points + observations so shard s owns points
    [s*P/n, (s+1)*P/n) and all of their observations (padded per shard).

    Host-side, runs once per solve; keeps capacities static.
    """
    P_cap = prob.X.shape[0]
    O_cap = prob.obs_cam.shape[0]
    assert P_cap % n_shards == 0, "point capacity must divide shard count"
    assert O_cap % n_shards == 0, "obs capacity must divide shard count"
    pts_per = P_cap // n_shards
    obs_per = O_cap // n_shards

    # point shard of each observation
    shard_of_obs = jnp.clip(prob.obs_pt // pts_per, 0, n_shards - 1)
    # stable sort obs by (shard, invalid-last)
    key = shard_of_obs * 2 + (~prob.obs_valid).astype(jnp.int32)
    order = jnp.argsort(key * O_cap + jnp.arange(O_cap))
    # count per shard; if any shard overflows obs_per we drop the excess
    # (reported via obs_valid)
    sh = shard_of_obs[order]
    pos_in_shard = jnp.arange(O_cap) - jax.lax.cummax(
        jnp.where(jnp.concatenate([jnp.array([True]), sh[1:] != sh[:-1]]),
                  jnp.arange(O_cap), 0))
    keep = pos_in_shard < obs_per
    dst = sh * obs_per + jnp.minimum(pos_in_shard, obs_per - 1)

    def scatter(arr, fill):
        out = jnp.full((O_cap,) + arr.shape[1:], fill, arr.dtype)
        return out.at[dst].set(jnp.where(
            keep.reshape((-1,) + (1,) * (arr.ndim - 1)), arr[order], out[dst]))

    out = prob._replace(
        obs_cam=scatter(prob.obs_cam, 0),
        obs_pt=scatter(prob.obs_pt, 0),
        obs_uv=scatter(prob.obs_uv, 0.0),
        obs_inv_sigma2=scatter(prob.obs_inv_sigma2, 1.0),
        obs_valid=scatter(prob.obs_valid, False))
    if prob.obs_ur is not None:
        out = out._replace(obs_ur=scatter(prob.obs_ur, -1.0))
    return out


def dist_bundle_adjust(prob: BAProblem, mesh: Mesh, axis: str = "shard",
                       cam_model: str = "pinhole", cam_params=None,
                       iterations: int = 5, lam0: float = 1e-4,
                       chi2_th: float = 5.991, use_robust: bool = True,
                       pcg_iters: int = 32):
    """Distributed LM: points+observations sharded over `axis`, cameras
    replicated; reduced-system PCG matvecs psum over the mesh.

    `prob` must already be partitioned with `partition_problem(n_shards)`.
    Returns (R, t, X, cost) with the same shapes as the input problem.
    """
    n_shards = mesh.shape[axis]
    P_cap = prob.X.shape[0]
    pts_per = P_cap // n_shards

    pspec_pt = P(axis)          # leading dim sharded
    pspec_rep = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspec_rep, pspec_rep, pspec_pt, pspec_pt, pspec_pt,
                  pspec_pt, pspec_pt, pspec_pt, pspec_pt,
                  pspec_rep, pspec_rep, pspec_rep),
        out_specs=(pspec_rep, pspec_rep, pspec_pt, pspec_rep),
        check_vma=False)
    def lm_loop(R0, t0, X0, pt_valid, obs_cam, obs_pt, obs_uv, obs_is2,
                obs_valid, cam_fixed, cam_valid, lam_init):
        my = jax.lax.axis_index(axis)
        pt_base = my * pts_per
        # shard-local problem: obs_pt rebased into the local point block
        lo_pt = jnp.clip(obs_pt - pt_base, 0, X0.shape[0] - 1)
        lo_valid = obs_valid & (obs_pt >= pt_base) & \
            (obs_pt < pt_base + X0.shape[0])
        shard_prob = BAProblem(
            R=R0, t=t0, cam_fixed=cam_fixed, cam_valid=cam_valid,
            X=X0, pt_valid=pt_valid,
            obs_cam=obs_cam, obs_pt=lo_pt, obs_uv=obs_uv,
            obs_inv_sigma2=obs_is2, obs_valid=lo_valid)

        def reduce(v):
            return jax.lax.psum(v, axis)

        def step(carry, _):
            R, t, X, lam, best_cost = carry
            Hcc_l, bc_l, Hpp, bp, Cobs, cost_l, _, _ = \
                ba_mod._build_normal_eq(shard_prob, R, t, X, cam_model,
                                        cam_params, chi2_th, use_robust)
            # global camera system via ICI psum
            Hcc = reduce(Hcc_l)
            bc = reduce(bc_l)
            cur_cost = reduce(cost_l)
            dx_cam, dx_pt = ba_mod._solve_schur(
                Hcc, bc, Hpp, bp, Cobs, obs_cam, lo_pt, lam,
                cam_fixed, pt_valid, pcg_iters=pcg_iters, reduce=reduce)

            dR, dt = lie.se3_exp(dx_cam)
            R_new, t_new = lie.se3_compose(dR, dt, R, t)
            R_new = lie.normalize_rotation(R_new)
            X_new = X + dx_pt
            new_cost = reduce(ba_mod._cost_only(
                shard_prob, R_new, t_new, X_new, cam_model, cam_params,
                chi2_th, use_robust))
            accept = new_cost < cur_cost
            R = jnp.where(accept, R_new, R)
            t = jnp.where(accept, t_new, t)
            X = jnp.where(accept, X_new, X)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-9, 1e6)
            return (R, t, X, lam, jnp.minimum(new_cost, cur_cost)), None

        init = (R0, t0, X0, lam_init, jnp.asarray(jnp.inf, jnp.float32))
        (R, t, X, _, cost), _ = jax.lax.scan(step, init, None,
                                             length=iterations)
        return R, t, X, cost

    lam = jnp.asarray(lam0, jnp.float32)
    return lm_loop(prob.R, prob.t, prob.X, prob.pt_valid,
                   prob.obs_cam, prob.obs_pt, prob.obs_uv,
                   prob.obs_inv_sigma2, prob.obs_valid,
                   prob.cam_fixed, prob.cam_valid, lam)
