from . import posegraph, icp, btc  # noqa: F401
