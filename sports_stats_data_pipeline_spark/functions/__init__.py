from . import parsing, text, vectors  # noqa: F401

__all__ = ["parsing", "text", "vectors"]
