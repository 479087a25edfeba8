"""Image pyramids and resizing.

The reference builds its 4-level pyramid with `cv::resize` at scale 0.5
(src/algorithm.cpp:139-154; default INTER_LINEAR).  For an exact 0.5 scale,
OpenCV's bilinear sampling positions land in the center of each 2x2 input
block, so the downsample is exactly 2x2 mean pooling (with truncated odd
edges) — implemented here as a reshape-mean, which XLA fuses into a single
cheap pass.  The KITTI loader's half-resolution resize uses INTER_NEAREST
(src/dataset.cpp:76-77), provided as `nearest_half`."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp


def down2(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution by exact 2x2 mean (cv::resize INTER_LINEAR at 0.5)."""
    H, W = img.shape
    h, w = H // 2, W // 2
    x = img[: 2 * h, : 2 * w]
    return x.reshape(h, 2, w, 2).mean(axis=(1, 3))


def nearest_half(img: jnp.ndarray) -> jnp.ndarray:
    """Half-resolution nearest-neighbor (cv::resize INTER_NEAREST at 0.5).

    OpenCV picks source index floor(dst * 2) = even rows/cols.
    """
    H, W = img.shape
    return img[: 2 * (H // 2) : 2, : 2 * (W // 2) : 2]


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[level0 = img, level1 = down2(img), ...] (algorithm.cpp:139-154)."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(down2(pyr[-1]))
    return pyr
