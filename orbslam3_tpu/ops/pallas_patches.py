"""Pallas TPU kernels: fused per-keypoint patch extraction for the ORB
front-end (IC-angle moments + BRIEF sampling patches).

Behavioral reference: the per-thread patch walks in
/root/reference/src/cuda/Angle_gpu.cu (IC_Angle_kernel) and
/root/reference/src/cuda/Orb_gpu.cu (calcOrb_kernel) — each CUDA block
reads a keypoint-centred window from texture memory.

Why a kernel: the XLA formulation (ops/orient.py extract_patches /
ops/brief.py compute_descriptors) lowers the vmapped dynamic-slice to a
serial HBM-latency-bound `while` loop — measured 2.2 ms/frame for 1200
keypoints on v5e, the single largest front-end cost after the pyramid.
Here the pyramid atlas is pinned in VMEM and the per-keypoint "slice"
happens on-chip.

Mosaic constraint (learned the hard way): a dynamic vector load from
VMEM must have its sublane (second-minor) start provably a multiple of
8 and may not have a dynamic lane start at all.  So per keypoint we
load a FULL-WIDTH row block starting at the keypoint's row rounded
down to a multiple of 8 (hinted with `pl.multiple_of`), then bring the
window to the origin with two `pltpu.roll`s (tpu.dynamic_rotate
supports dynamic shift amounts on both sublanes and lanes), and take a
static corner slice:

  * raw atlas:  (31, 31) window -> IC moments (m10, m01) reduced
    in-kernel (the (N, 961) patch tensor never exists);
  * blurred atlas: (39, 39) window written out for the binned-BRIEF
    one-hot matmuls (ops/brief.descriptors_from_patches).

The two atlases are processed by two separate pallas_calls because a
single core's VMEM (~16 MB on v5e) cannot hold both (~6.9 MB each)
plus output double-buffers comfortably.  Keypoint index arrays arrive
via scalar prefetch (SMEM) so slice starts are known to the address
units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import brief, orient

BLK = 32          # keypoints per grid program
ROWS = 48         # row block per keypoint: window (<=39+7 residual) fits
S_MOM = 2 * orient.HALF_PATCH_SIZE + 1    # 31
S_BRF = 2 * brief._PATCH_R + 1            # 39


def _win_kernel(s: int, reduce_moments: bool):
    """Build a kernel body extracting an (s, s) window per keypoint."""

    if reduce_moments:
        def kernel(sc_ref, img_ref, wu_ref, wv_ref, out_ref):
            g = pl.program_id(0)

            def body(i, carry):
                k = g * BLK + i
                ya = pl.multiple_of(sc_ref[0, k], 8)
                big = img_ref[pl.ds(ya, ROWS), :]
                big = pltpu.roll(big, sc_ref[1, k], axis=0)
                big = pltpu.roll(big, sc_ref[2, k], axis=1)
                p = big[0:s, 0:s]
                m10 = jnp.sum(p * wu_ref[:, :])
                m01 = jnp.sum(p * wv_ref[:, :])
                out_ref[pl.ds(i, 1), :] = jnp.stack([m10, m01]).reshape(1, 2)
                return carry

            jax.lax.fori_loop(0, BLK, body, 0)
    else:
        def kernel(sc_ref, img_ref, out_ref):
            g = pl.program_id(0)

            def body(i, carry):
                k = g * BLK + i
                ya = pl.multiple_of(sc_ref[0, k], 8)
                big = img_ref[pl.ds(ya, ROWS), :]
                big = pltpu.roll(big, sc_ref[1, k], axis=0)
                big = pltpu.roll(big, sc_ref[2, k], axis=1)
                out_ref[i, :, :] = big[0:s, 0:s]
                return carry

            jax.lax.fori_loop(0, BLK, body, 0)

    return kernel


def _pad_atlas(img: jnp.ndarray) -> jnp.ndarray:
    """Pad rows so every aligned ROWS-row load stays in bounds, and lanes
    to a multiple of 128."""
    h, w = img.shape
    hp = -(-(h + ROWS - S_MOM + 7) // 8) * 8
    wp = -(-w // 128) * 128
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


def _starts(c0: jnp.ndarray, wp: int) -> jnp.ndarray:
    """(3, n) int32 [aligned row start, row shift, col shift] from per-
    keypoint window starts c0 = (y0, x0)."""
    y0, x0 = c0
    ya = (y0 // 8) * 8
    rs = (ROWS - (y0 - ya)) % ROWS
    cs = (wp - x0) % wp
    return jnp.stack([ya, rs, cs])


def _call(kernel, sc, img, extra, out_shape, out_spec, interpret):
    h, w = img.shape
    n_pad = sc.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((h, w), lambda g, sc_: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(e.shape, lambda g, sc_: (0, 0),
                               memory_space=pltpu.VMEM) for e in extra],
        out_specs=out_spec,
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(sc, img, *extra)


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_moments_and_patches(atlas_raw: jnp.ndarray,
                                atlas_blur: jnp.ndarray,
                                xy: jnp.ndarray,
                                interpret: bool = False):
    """(H, W) f32 atlases + (N, 2) float keypoint coords ->
    (moments (N, 2) f32, brief_patches (N, S_BRF*S_BRF) f32).

    Window starts are clamped in-bounds, matching orient.extract_patches
    (floor centre) / brief.compute_descriptors (rounded centre).
    """
    h, w = atlas_raw.shape
    n = xy.shape[0]
    raw = _pad_atlas(atlas_raw)
    blu = _pad_atlas(atlas_blur)
    wp = raw.shape[1]

    xf = xy[:, 0].astype(jnp.int32)          # floor for moments
    yf = xy[:, 1].astype(jnp.int32)
    xr = jnp.round(xy[:, 0]).astype(jnp.int32)   # round for BRIEF
    yr = jnp.round(xy[:, 1]).astype(jnp.int32)
    m_y0 = jnp.clip(yf - orient.HALF_PATCH_SIZE, 0, h - S_MOM)
    m_x0 = jnp.clip(xf - orient.HALF_PATCH_SIZE, 0, w - S_MOM)
    b_y0 = jnp.clip(yr - brief._PATCH_R, 0, h - S_BRF)
    b_x0 = jnp.clip(xr - brief._PATCH_R, 0, w - S_BRF)

    n_pad = -(-n // BLK) * BLK
    pad = ((0, 0), (0, n_pad - n))
    sc_m = jnp.pad(_starts((m_y0, m_x0), wp), pad)
    sc_b = jnp.pad(_starts((b_y0, b_x0), wp), pad)

    wu, wv = orient._moment_weights()
    wu = jnp.asarray(wu)
    wv = jnp.asarray(wv)

    mom = _call(
        _win_kernel(S_MOM, True), sc_m, raw, (wu, wv),
        jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        pl.BlockSpec((BLK, 2), lambda g, sc_: (g, 0),
                     memory_space=pltpu.VMEM),
        interpret)
    pat = _call(
        _win_kernel(S_BRF, False), sc_b, blu, (),
        jax.ShapeDtypeStruct((n_pad, S_BRF, S_BRF), jnp.float32),
        pl.BlockSpec((BLK, S_BRF, S_BRF), lambda g, sc_: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        interpret)
    return mom[:n], pat[:n].reshape(n, S_BRF * S_BRF)


def ic_angle_and_patches(atlas_raw, atlas_blur, xy, interpret=False):
    """Fused replacement for orient.ic_angle + the patch slice inside
    brief.compute_descriptors: returns (angle_deg (N,), patches
    (N, S_BRF^2))."""
    mom, pat = extract_moments_and_patches(atlas_raw, atlas_blur, xy,
                                           interpret=interpret)
    ang = jnp.arctan2(mom[:, 1], mom[:, 0])
    ang = jnp.where(ang < 0, ang + 2 * jnp.pi, ang)
    return ang * (180.0 / jnp.pi), pat
