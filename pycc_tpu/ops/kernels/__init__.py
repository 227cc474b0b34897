from .vvvv import vvvv_pallas

__all__ = ["vvvv_pallas"]
