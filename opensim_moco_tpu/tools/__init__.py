from .inverse import Inverse

__all__ = ["Inverse"]
