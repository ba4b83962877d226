"""Detector pixel binning.

Replaces the per-ray Python accumulation loop in the reference
(``_TraceObject.py:289-291`` — the hottest loop in its profile) with a
vectorized scatter-add that XLA lowers to a single fused kernel on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bin_image(
    x_local: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    nx: int,
    ny: int,
    pixel_size: float,
) -> jax.Array:
    """Accumulate ray hits into an [nx, ny] image.

    Pixel convention matches the reference (``_TraceObject.py:257-291``):
    local coordinates are divided by ``pixel_size`` and shifted so that
    channel (0,0) is centered on the bottom-left pixel; hits are rounded to
    the nearest channel; out-of-grid hits are dropped.

    Weighted accumulation generalizes the reference's +1 per ray: with unit
    weights the images agree; in ``weight`` interaction mode the image is the
    expected photon count (differentiable w.r.t. upstream parameters through
    ``weight``; pixel assignment itself is a hard binning).
    """
    px = x_local[:, 0] / pixel_size + (nx - 1) / 2.0
    py = x_local[:, 1] / pixel_size + (ny - 1) / 2.0
    ix = jnp.round(px).astype(jnp.int32)
    iy = jnp.round(py).astype(jnp.int32)
    ok = mask & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
    # Masked-out rays scatter weight 0 into pixel (0, 0).
    ix = jnp.where(ok, ix, 0)
    iy = jnp.where(ok, iy, 0)
    w = jnp.where(ok, weight, 0.0)
    flat = jnp.zeros((nx * ny,), dtype=x_local.dtype)
    flat = flat.at[ix * ny + iy].add(w)
    return flat.reshape(nx, ny)


def bin_image_bilinear(
    x_local: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    nx: int,
    ny: int,
    pixel_size: float,
) -> jax.Array:
    """Differentiable accumulation: bilinear splat onto 4 neighbor pixels.

    Unlike ``bin_image`` (hard nearest-pixel assignment with zero positional
    gradient), each hit distributes its weight linearly to the four
    surrounding pixel centers, so the image is piecewise-linear in the local
    hit coordinates and ``jax.grad`` flows through optic pose. Integral is
    preserved for in-bounds hits; expected images converge to ``bin_image``
    up to half-pixel smoothing.
    """
    px = x_local[:, 0] / pixel_size + (nx - 1) / 2.0
    py = x_local[:, 1] / pixel_size + (ny - 1) / 2.0
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)

    flat = jnp.zeros((nx * ny,), dtype=x_local.dtype)
    for dx, wx in ((0, 1.0 - fx), (1, fx)):
        for dy, wy in ((0, 1.0 - fy), (1, fy)):
            ix = ix0 + dx
            iy = iy0 + dy
            ok = mask & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
            idx = jnp.where(ok, ix * ny + iy, 0)
            w = jnp.where(ok, weight * wx * wy, 0.0)
            flat = flat.at[idx].add(w)
    return flat.reshape(nx, ny)
