"""Image I/O helpers.

Analog of the reference's stb usage (reference: CudaRayTracer/src/Utils/
RawStbImage.h:12-22 for loading; the reference cannot save renders at all —
offline PNG output is an improvement).  PIL-backed with a raw-PPM fallback.
"""

from __future__ import annotations

import numpy as np


def save_png(path: str, image: np.ndarray, flip_vertical: bool = True):
    """Save an RGB(A) uint8 or float [0,1] image.

    ``flip_vertical`` converts framebuffer order (row 0 = bottom, the
    reference's GL convention — it flips at display time with uv coords,
    CudaLayer.cpp:402) to standard image order.
    """
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if flip_vertical:
        arr = arr[::-1]
    try:
        from PIL import Image

        mode = "RGBA" if arr.shape[-1] == 4 else "RGB"
        Image.fromarray(arr, mode).save(path)
    except ImportError:  # raw PPM fallback (RGB only)
        rgb = arr[..., :3]
        with open(path.rsplit(".", 1)[0] + ".ppm", "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
            f.write(rgb.tobytes())


def load_rgb(path: str) -> np.ndarray:
    """uint8[H,W,3] from any common image file (stbi_load analog)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.uint8)
