# uint8 HSV <-> RGB conversions with OpenCV semantics, as JAX ops.
#
# The reference shuttles single colours through cv2.cvtColor on the host at
# every edit (ref: ui/backend.py:98-100, 108-125) — a device<->host hop this
# rebuild eliminates by reproducing cv2's 8-bit fixed-point conversion rules
# directly in jnp (H in [0,180), S/V in [0,255]).  Exactness is covered by
# tests/test_colorspace.py which sweeps a colour grid against cv2.

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] uint8 RGB -> [..., 3] uint8 HSV (cv2.COLOR_RGB2HSV).

    cv2's integer pipeline computes s = round(255*diff/v) and
    h = round(30*sector_val/diff) mod 180 via 12-bit reciprocal tables;
    plain float math with round() reproduces it bit-exactly.
    """
    rgb = rgb.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_v = jnp.where(v == 0, 1.0, v)
    safe_diff = jnp.where(diff == 0, 1.0, diff)
    s = jnp.where(v == 0, 0.0, jnp.round(255.0 * diff / safe_v))
    val = jnp.where(
        v == r, g - b,
        jnp.where(v == g, (b - r) + 2.0 * diff, (r - g) + 4.0 * diff))
    h = jnp.where(diff == 0, 0.0, jnp.round(30.0 * val / safe_diff))
    h = jnp.where(h < 0, h + 180.0, h)
    h = jnp.where(h >= 180, h - 180.0, h)
    return jnp.stack([h, s, v], axis=-1).astype(jnp.uint8)


def hsv_to_rgb_u8(hsv: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] uint8 HSV -> [..., 3] uint8 RGB (cv2.COLOR_HSV2RGB)."""
    hsv = hsv.astype(jnp.float32)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = h * (2.0 / 60.0)              # [0,180) -> sector units [0,6)
    s = s * (1.0 / 255.0)
    sector = jnp.floor(h)
    frac = h - sector
    tab0 = v
    tab1 = v * (1.0 - s)
    tab2 = v * (1.0 - s * frac)
    tab3 = v * (1.0 - s * (1.0 - frac))
    sector = sector.astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab0, tab2, tab1, tab1, tab3], tab0)
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab3, tab0, tab0, tab2, tab1], tab1)
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [tab1, tab1, tab3, tab0, tab0], tab2)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)
