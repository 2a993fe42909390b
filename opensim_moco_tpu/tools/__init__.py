from .inverse import Inverse
from .track import Track

__all__ = ["Inverse", "Track"]
