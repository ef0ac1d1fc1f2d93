"""Image ops for the ORB front-end: pyramid resize + Gaussian blur.

Reference recipe (src/ORBextractor.cc:607-623 ComputePyramid): level L is a
bilinear resize of level L-1 by 1/scaleFactor; every level additionally gets
a 5x5 Gaussian (sigma=1.2, BORDER_REFLECT_101 — src/ORBextractor.cc:145)
used only for descriptor sampling.  FAST/orientation run on the unblurred
pyramid.

TPU design: images are f32 (0..255) arrays; resize via jax.image (bilinear,
half-pixel convention, same as cv::resize INTER_LINEAR); blur as two 1-D
convolutions that XLA fuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale_factor: float):
    """Static per-level (h, w), matching cvRound(dim * invScale^L)
    (reference src/ORBextractor.cc:596-599)."""
    shapes = []
    for lv in range(n_levels):
        s = 1.0 / (scale_factor ** lv)
        # cvRound = round-half-to-even
        shapes.append((int(np.rint(h * s)), int(np.rint(w * s))))
    return shapes


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(img, out_hw, method="linear")


@functools.lru_cache(maxsize=None)
def _gauss_kernel_np(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 5, sigma: float = 1.2) -> jnp.ndarray:
    """Separable Gaussian with reflect-101 border (cv BORDER_REFLECT_101)."""
    k = jnp.asarray(_gauss_kernel_np(ksize, sigma))
    r = ksize // 2
    p = jnp.pad(img, ((r, r), (r, r)), mode="reflect")  # np reflect == REFLECT_101
    # horizontal then vertical 1-D convs via conv_general_dilated
    x = p[None, None, :, :]
    kh = k.reshape(1, 1, 1, ksize)
    kv = k.reshape(1, 1, ksize, 1)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID")
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID")
    return x[0, 0]


def build_pyramid(img: jnp.ndarray, n_levels: int, scale_factor: float):
    """Returns (pyramid, blurred_pyramid) — lists of per-level images.

    Static shapes per level; the whole chain lives in one jit trace.
    """
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale_factor)
    pyr = [img]
    for lv in range(1, n_levels):
        pyr.append(resize_bilinear(pyr[-1], shapes[lv]))
    blurred = [gaussian_blur(p) for p in pyr]
    return pyr, blurred
