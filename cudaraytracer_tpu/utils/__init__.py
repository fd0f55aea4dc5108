from . import rng, vec

__all__ = ["rng", "vec"]
