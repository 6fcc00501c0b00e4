from . import propagation, preintegration  # noqa: F401
