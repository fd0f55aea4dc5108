from . import intersect, materials, pack, sky, textures

__all__ = ["intersect", "materials", "pack", "sky", "textures"]
