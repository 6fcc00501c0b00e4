from . import lidar_factor, optimizer  # noqa: F401
