"""Distributed Schur-complement bundle adjustment over a device mesh.

This is the build's "model parallelism" (SURVEY §2.11, §5.7): map points
and their observations are sharded across devices; each shard marginalizes
its own points (embarrassingly parallel) and contributes a partial reduced
camera system; one `psum` over the ICI assembles the global (6K x 6K)
system, which every device solves redundantly (it is small); point updates
back-substitute shard-locally.  The reference's equivalent is a
single-threaded g2o sparse solve (src/Optimizer.cc:74-85) — there is no
distribution to port, this is the TPU-native design the driver's
north star prescribes.

Sharding invariant: observations must be partitioned so that all
observations of a point live on that point's shard (`partition_problem`
does this host-side once per solve).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def _shard_normal_eq(prob_shard: BAProblem, R, t, X_shard, pt_base,
                     cam_model, cam_params, chi2_th, use_robust):
    """Per-shard pieces.  X_shard: this shard's points; obs_pt is global,
    rebased by pt_base."""
    local = prob_shard._replace(
        X=X_shard,
        obs_pt=jnp.clip(prob_shard.obs_pt - pt_base, 0, X_shard.shape[0] - 1),
        obs_valid=prob_shard.obs_valid &
        (prob_shard.obs_pt >= pt_base) &
        (prob_shard.obs_pt < pt_base + X_shard.shape[0]))
    return ba_mod._build_normal_eq(local, R, t, X_shard, cam_model,
                                   cam_params, chi2_th, use_robust)


def dist_bundle_adjust(prob: BAProblem, mesh: Mesh, axis: str = "shard",
                       cam_model: str = "pinhole", cam_params=None,
                       iterations: int = 5, lam0: float = 1e-4,
                       chi2_th: float = 5.991, use_robust: bool = True):
    """Distributed LM: points sharded over `axis`, cameras replicated.

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
        shard_prob = BAProblem(
            R=R0, t=t0, cam_fixed=cam_fixed, cam_valid=cam_valid,
            X=X0, pt_valid=pt_valid,
            obs_cam=obs_cam, obs_pt=obs_pt, obs_uv=obs_uv,
            obs_inv_sigma2=obs_is2, obs_valid=obs_valid)

        def step(carry, _):
            R, t, X, lam, best_cost = carry
            Hcc_l, bc_l, Hpp, bp, Ccp, cost_l, _, _ = _shard_normal_eq(
                shard_prob, R, t, X, pt_base, cam_model, cam_params,
                chi2_th, use_robust)
            # global camera system via ICI psum
            Hcc = jax.lax.psum(Hcc_l, axis)
            bc = jax.lax.psum(bc_l, axis)
            cur_cost = jax.lax.psum(cost_l, axis)

            K = Hcc.shape[0]
            Hcc_d = Hcc + lam * jnp.eye(6)[None]
            Hpp_d = Hpp + lam * jnp.eye(3)[None]
            pt_on = pt_valid.astype(jnp.float32)[:, None, None]
            Hpp_d = Hpp_d * pt_on + jnp.eye(3)[None] * (1 - pt_on)
            Hpp_inv = ba_mod._spd_inv3(Hpp_d)
            CW = jnp.einsum("kpij,pjl->kpil", Ccp, Hpp_inv, precision=_HI)
            S_off_l = jnp.einsum("kpil,qpml->kqim", CW, Ccp, precision=_HI)
            # psum partial Schur pieces (each shard's point marginalization)
            S_off = jax.lax.psum(S_off_l, axis)
            rhs = bc - jax.lax.psum(
                jnp.einsum("kpil,pl->ki", CW, bp, precision=_HI), axis)
            S = -S_off
            S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
            free = (~cam_fixed).astype(jnp.float32)
            ff = free[:, None] * free[None, :]
            S = S * ff[:, :, None, None]
            S = S.at[jnp.arange(K), jnp.arange(K)].add(
                jnp.eye(6)[None] * (1 - free)[:, None, None])
            rhs = rhs * free[:, None]
            Sd = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
            dx_cam = jnp.linalg.solve(Sd, rhs.reshape(K * 6)).reshape(K, 6)
            delta_p = bp - jnp.einsum("kpil,ki->pl", Ccp, dx_cam,
                                      precision=_HI)
            dx_pt = jnp.einsum("pij,pj->pi", Hpp_inv, delta_p, precision=_HI)
            dx_pt = dx_pt * pt_valid.astype(jnp.float32)[:, None]

            dR, dt = lie.se3_exp(dx_cam)
            R_new, t_new = lie.se3_compose(dR, dt, R, t)
            R_new = lie.normalize_rotation(R_new)
            X_new = X + dx_pt
            new_cost_l = ba_mod._cost_only(
                shard_prob._replace(
                    obs_pt=jnp.clip(shard_prob.obs_pt - pt_base, 0,
                                    X_new.shape[0] - 1),
                    obs_valid=shard_prob.obs_valid &
                    (shard_prob.obs_pt >= pt_base) &
                    (shard_prob.obs_pt < pt_base + X_new.shape[0]),
                    X=X_new),
                R_new, t_new, X_new, cam_model, cam_params, chi2_th,
                use_robust)
            new_cost = jax.lax.psum(new_cost_l, axis)
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

    pt_valid_shardable = prob.pt_valid
    lam = jnp.asarray(lam0, jnp.float32)
    return lm_loop(prob.R, prob.t, prob.X, pt_valid_shardable,
                   prob.obs_cam, prob.obs_pt, prob.obs_uv,
                   prob.obs_inv_sigma2, prob.obs_valid,
                   prob.cam_fixed, prob.cam_valid, lam)
