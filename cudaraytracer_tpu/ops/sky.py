"""Gradient sky background.

Analog of the miss branch in the reference radiance loop
(reference: CudaRayTracer/src/Cuda/Kernel.cu:40-45): lerp between
``background_start`` and ``background_end`` by the unit ray direction's y.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.vec import lerp, normalize

# Reference defaults (CudaRayTracer/src/Cuda/CudaLayer.h:143-144).
DEFAULT_BACKGROUND_START = (1.0, 1.0, 1.0)
DEFAULT_BACKGROUND_END = (0.5, 0.7, 1.0)


def sky_color(
    ray_dir: jnp.ndarray,  # f32[R,3], need not be normalized
    background_start: jnp.ndarray,  # f32[3]
    background_end: jnp.ndarray,  # f32[3]
) -> jnp.ndarray:
    unit = normalize(ray_dir)
    t = 0.5 * (unit[..., 1] + 1.0)
    return lerp(
        jnp.broadcast_to(background_start, unit.shape),
        jnp.broadcast_to(background_end, unit.shape),
        t,
    )
