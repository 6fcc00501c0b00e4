from . import hba  # noqa: F401
