"""Batched image transforms as matmuls: area resize + grayscale.

The reference ETL resizes frames with ``cv2.resize(..., INTER_AREA)`` and
converts BGR->gray (/root/reference/src/dataprocessing.py:259-265), one
frame at a time on the host.  Area resampling is *separable*, so here it is
expressed as two small matrix multiplies

    out = R_h @ img @ R_w^T

where ``R_h (H_out, H_in)`` / ``R_w (W_out, W_in)`` hold the exact pixel
coverage fractions of each output cell.  This maps the whole batched resize
onto the MXU (and matches cv2.INTER_AREA output to ~1e-6 for float inputs;
cv2's uint8 path additionally rounds).
"""

from __future__ import annotations

import functools

import jax

import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights, the cv2.COLOR_BGR2GRAY definition
_BGR_WEIGHTS = np.array([0.114, 0.587, 0.299], dtype=np.float32)
_RGB_WEIGHTS = _BGR_WEIGHTS[::-1].copy()


@functools.lru_cache(maxsize=64)
def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) row-stochastic area-coverage matrix."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for o in range(out_size):
        start = o * scale
        end = (o + 1) * scale
        i0 = int(np.floor(start))
        i1 = int(np.ceil(end))
        for i in range(i0, min(i1, in_size)):
            cover = min(end, i + 1) - max(start, i)
            if cover > 0:
                w[o, i] = cover
        w[o] /= w[o].sum()
    return w.astype(np.float32)


def area_resize(images: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Area-average resize of (..., H, W) images to (..., out_h, out_w)."""
    in_h, in_w = images.shape[-2], images.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return images
    rh = jnp.asarray(_area_weights(in_h, out_h))  # (out_h, in_h)
    rw = jnp.asarray(_area_weights(in_w, out_w))  # (out_w, in_w)
    x = images.astype(jnp.float32)
    # HIGHEST precision: keeps bit-level parity with cv2.INTER_AREA (the
    # default would round matmul inputs to bf16 on the MXU)
    hp = jax.lax.Precision.HIGHEST
    # (..., H, W) @ (W, out_w) -> (..., H, out_w); then contract H
    x = jnp.einsum("...hw,ow->...ho", x, rw, precision=hp)
    x = jnp.einsum("...ho,ph->...po", x, rh, precision=hp)
    return x


def bgr_to_gray(images: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) BGR -> (...,) luma, cv2.COLOR_BGR2GRAY weights."""
    return images.astype(jnp.float32) @ jnp.asarray(_BGR_WEIGHTS)


def rgb_to_gray(images: jnp.ndarray) -> jnp.ndarray:
    return images.astype(jnp.float32) @ jnp.asarray(_RGB_WEIGHTS)


def area_resize_np(images: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Numpy twin for the host-side ETL (no device round-trip)."""
    in_h, in_w = images.shape[-2], images.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return images.astype(np.float32)
    rh = _area_weights(in_h, out_h)
    rw = _area_weights(in_w, out_w)
    x = images.astype(np.float32)
    x = np.einsum("...hw,ow->...ho", x, rw)
    x = np.einsum("...ho,ph->...po", x, rh)
    return x
