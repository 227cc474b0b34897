from .molecules import moldict

__all__ = ["moldict"]
