from . import camera, renderer, scene

__all__ = ["camera", "renderer", "scene"]
