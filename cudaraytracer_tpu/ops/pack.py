"""Framebuffer packing: linear radiance -> display RGBA8.

Analog of the reference's per-pixel gamma + pack epilogue
(reference: CudaRayTracer/src/Cuda/Kernel.cu:151-157 and RgbToInt at
Kernel.cu:12-19): divide by sample count, gamma-2 (sqrt), scale to [0,255],
pack.  Runs on device; the host pulls only the uint8 image.
"""

from __future__ import annotations

import jax.numpy as jnp


def tonemap(radiance: jnp.ndarray, spp) -> jnp.ndarray:
    """Mean radiance -> gamma-2 display float in [0,1]. radiance: f32[...,3]."""
    mean = radiance / jnp.asarray(spp, radiance.dtype)
    return jnp.sqrt(jnp.clip(mean, 0.0, 1.0))


def to_rgba8(display: jnp.ndarray) -> jnp.ndarray:
    """Display float [...,3] in [0,1] -> uint8 [...,4] with opaque alpha."""
    rgb = jnp.clip(display * 255.0, 0.0, 255.0).astype(jnp.uint8)
    alpha = jnp.full(rgb.shape[:-1] + (1,), 255, jnp.uint8)
    return jnp.concatenate([rgb, alpha], axis=-1)


def pack_rgba8(radiance: jnp.ndarray, spp) -> jnp.ndarray:
    """radiance f32[...,3] accumulated over ``spp`` samples -> uint8[...,4]."""
    return to_rgba8(tonemap(radiance, spp))
