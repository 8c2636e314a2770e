from .gorilla import decode, encode  # noqa: F401
