"""Stereo matching: left-right ORB association on rectified pairs.

Parity target: upstream Frame::ComputeStereoMatches (stereo path is dead
code in the fork but required by the build's stereo configs): for each
left keypoint, search the same rectified row (band of +-2 px scaled by
octave) within the disparity range, best Hamming descriptor wins, giving
per-keypoint right-coordinate uR and depth = fx * baseline / disparity.

TPU design: one masked Hamming NN over all left x right pairs — the row
band, disparity range, and octave gates are just mask terms.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import matching


class StereoDepth(NamedTuple):
    ur: jnp.ndarray      # (N,) right-image u coordinate (-1 if none)
    depth: jnp.ndarray   # (N,) metric depth (0 if none)
    valid: jnp.ndarray   # (N,) bool


def stereo_match(ff_l, ff_r, fx: float, baseline: float,
                 row_tol: float = 2.0,
                 min_depth: float = 0.1, max_depth: float = 40.0,
                 scale_factor: float = 1.2) -> StereoDepth:
    """Associate left keypoints with right keypoints on a rectified pair."""
    min_disp = fx * baseline / max_depth
    max_disp = fx * baseline / min_depth
    du = ff_l.xy[:, None, 0] - ff_r.xy[None, :, 0]   # disparity candidates
    dv = jnp.abs(ff_l.xy[:, None, 1] - ff_r.xy[None, :, 1])
    tol = row_tol * scale_factor ** ff_l.octave.astype(jnp.float32)
    mask = (dv <= tol[:, None]) & (du >= min_disp) & (du <= max_disp)
    mask &= ff_l.valid[:, None] & ff_r.valid[None, :]
    oct_ok = jnp.abs(ff_l.octave[:, None] - ff_r.octave[None, :]) <= 1
    mask &= oct_ok
    mm = matching.match_nn(ff_l.desc, ff_r.desc, mask,
                           max_dist=matching.TH_HIGH, nn_ratio=0.9)
    j = jnp.maximum(mm.idx, 0)
    ur = ff_r.xy[j, 0]
    disp = jnp.clip(ff_l.xy[:, 0] - ur, 1e-3, None)
    depth = fx * baseline / disp
    ok = mm.valid & (depth > min_depth) & (depth < max_depth)
    return StereoDepth(ur=jnp.where(ok, ur, -1.0),
                       depth=jnp.where(ok, depth, 0.0), valid=ok)
