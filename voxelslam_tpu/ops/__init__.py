from . import eigh3  # noqa: F401
