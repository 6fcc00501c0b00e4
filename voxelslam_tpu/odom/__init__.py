from . import noise, esikf  # noqa: F401
