"""Color-space ops (jittable).

``rgb_to_hsv_cv`` reproduces OpenCV's 8-bit HSV convention (H in [0,180),
S,V in [0,255]) because the shot detector's scores must be comparable to
PySceneDetect's ContentDetector, which consumes cv2 HSV frames
(/root/reference/features/extractors.py:390-393 uses scenedetect's
defaults on cv2-decoded frames).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv_cv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB in [0,255] -> [..., 3] HSV, OpenCV 8-bit ranges.

    H in [0, 180), S in [0, 255], V in [0, 255] (float; no uint8 rounding).
    """
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
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
    return jnp.stack([h, s, v], axis=-1)
