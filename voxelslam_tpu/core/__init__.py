from . import so3, state, cluster, hashing, config  # noqa: F401
