"""Rotated BRIEF (rBRIEF) 256-bit descriptors.

Behavioral reference: /root/reference/src/cuda/Orb_gpu.cu calcOrb_kernel —
for each of 256 point pairs (p, q) from the standard learned ORB pattern
(Rublee et al. 2011; the constant table originates from OpenCV and is
stored here as data in orbslam3_tpu/data/orb_pattern.npy), sample the
5x5-Gaussian-blurred image at the pattern points rotated by the keypoint
angle (round-to-nearest), and set bit k iff I(p) < I(q).

TPU design: one gather of shape (N, 512) instead of 256 serial reads per
thread; bit packing via matmul with a power-of-two vector (MXU-friendly).
Descriptors are returned both bit-packed (N, 8) uint32 for Hamming popcount
matmuls and that is the canonical storage format.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

_PATTERN_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "data", "orb_pattern.npy")


@functools.lru_cache(maxsize=None)
def pattern() -> np.ndarray:
    """(512, 2) int32 pattern points (x, y); pairs are (2k, 2k+1)."""
    return np.load(_PATTERN_PATH)


def compute_descriptors(img_blurred: jnp.ndarray, xy: jnp.ndarray,
                        angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Descriptors for N keypoints.

    img_blurred: (H, W) f32; xy: (N, 2) float (level coords);
    angle_deg: (N,).  Returns (N, 8) uint32 (256 bits, little-endian bit
    order within each 32-bit word: word w bit b = pair index 32w+b).
    """
    h, w = img_blurred.shape
    pat = jnp.asarray(pattern(), jnp.float32)  # (512, 2) x, y
    ang = angle_deg * (jnp.pi / 180.0)
    ca, sa = jnp.cos(ang), jnp.sin(ang)  # (N,)

    px, py = pat[:, 0], pat[:, 1]  # (512,)
    # rotated integer offsets, round-half-to-even like __float2int_rn
    rx = jnp.round(px[None, :] * ca[:, None] - py[None, :] * sa[:, None])
    ry = jnp.round(px[None, :] * sa[:, None] + py[None, :] * ca[:, None])
    gx = jnp.clip(jnp.round(xy[:, 0:1]) + rx, 0, w - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(xy[:, 1:2]) + ry, 0, h - 1).astype(jnp.int32)

    vals = img_blurred[gy, gx]  # (N, 512) gather
    t0 = vals[:, 0::2]
    t1 = vals[:, 1::2]
    bits = (t0 < t1).astype(jnp.uint32)  # (N, 256)

    shifts = jnp.asarray(1 << np.arange(32, dtype=np.uint32), jnp.uint32)
    words = jnp.sum(bits.reshape(-1, 8, 32) * shifts[None, None, :], axis=-1)
    return words.astype(jnp.uint32)  # (N, 8)


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) float {0,1} (for popcount-by-matmul)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return b.reshape(desc.shape[0], 256).astype(jnp.float32)


def hamming_distance(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance (Na, 8)x(Nb, 8) uint32 -> (Na, Nb) int32.

    popcount(a XOR b) = |a| + |b| - 2 a.b on the unpacked bit vectors —
    one (Na, 256) @ (256, Nb) matmul that rides the MXU, replacing the
    reference's per-pair popcount bit hack (src/ORBmatcher.cc:1375).
    """
    A = unpack_bits(desc_a)
    B = unpack_bits(desc_b)
    na = jnp.sum(A, axis=1, keepdims=True)
    nb = jnp.sum(B, axis=1, keepdims=True)
    dot = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    return (na + nb.T - 2.0 * dot).astype(jnp.int32)
