from . import serialization  # noqa: F401
