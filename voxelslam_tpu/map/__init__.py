from . import hashmap, voxelmap  # noqa: F401
