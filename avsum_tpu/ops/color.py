"""Color-space ops (jittable).

``rgb_to_hsv_cv`` reproduces OpenCV's 8-bit HSV convention (H in [0,180),
S,V in [0,255]) because the shot detector's scores must be comparable to
PySceneDetect's ContentDetector, which consumes cv2 HSV frames
(/root/reference/features/extractors.py:390-393 uses scenedetect's
defaults on cv2-decoded frames).
"""

from __future__ import annotations

import jax.numpy as jnp


def yuv420_to_rgb_device(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """Device-side planar 4:2:0 -> RGB channel tuple (BT.601 full range).

    y: [..., H, W] uint8; u, v: [..., H/2, W/2] uint8. Returns (r, g, b)
    float32 [..., H, W] channels (channel-separated layout — see below).
    Nearest chroma upsample, matching io/y4m.py::yuv420_to_rgb. Shipping
    YUV planes + converting on device halves host->device bytes vs RGB.
    """
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    # nearest 2x upsample on the last two axes
    uf = jnp.repeat(jnp.repeat(uf, 2, axis=-2), 2, axis=-1)
    vf = jnp.repeat(jnp.repeat(vf, 2, axis=-2), 2, axis=-1)
    uf = uf[..., : y.shape[-2], : y.shape[-1]]
    vf = vf[..., : y.shape[-2], : y.shape[-1]]
    r = yf + 1.4020 * vf
    b = yf + 1.7720 * uf
    g = (yf - 0.299 * r - 0.114 * b) / 0.587
    clip = lambda c: jnp.clip(c, 0.0, 255.0)
    return clip(r), clip(g), clip(b)


def rgb_to_hsv_channels(rgb: jnp.ndarray):
    """[..., 3] RGB in [0,255] -> (H, S, V) channel tuple, OpenCV 8-bit
    ranges: H in [0, 180), S and V in [0, 255] (float; no uint8 rounding).

    Returns separate [...]-shaped channel arrays (minor dim = width) —
    the TPU-friendly layout; see the note below.
    """
    # NOTE: slice channels FIRST so every subsequent op works on [..., W]
    # arrays (minor dim = width). Keeping the trailing size-3 channel axis
    # through the elementwise chain is a TPU layout pathology (lane dim 3
    # of 128) — it inflated this kernel's runtime ~100x.
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = v - mn
    safe = jnp.where(delta > 0, delta, 1.0)

    h = jnp.where(
        v == r,
        60.0 * (g - b) / safe,
        jnp.where(
            v == g,
            120.0 + 60.0 * (b - r) / safe,
            240.0 + 60.0 * (r - g) / safe,
        ),
    )
    h = jnp.where(delta > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2: H/2 to fit 8 bits
    s = jnp.where(v > 0, 255.0 * delta / jnp.where(v > 0, v, 1.0), 0.0)
    return h, s, v


def rgb_to_hsv_cv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB -> [..., 3] HSV (stacked convenience wrapper; prefer
    :func:`rgb_to_hsv_channels` in device code — the stacked layout puts a
    size-3 axis in the lane dimension)."""
    h, s, v = rgb_to_hsv_channels(rgb)
    return jnp.stack([h, s, v], axis=-1)
