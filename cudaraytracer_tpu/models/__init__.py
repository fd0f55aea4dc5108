from . import bvh, camera, renderer, scene, scenes, wavefront

__all__ = ["bvh", "camera", "renderer", "scene", "scenes", "wavefront"]
