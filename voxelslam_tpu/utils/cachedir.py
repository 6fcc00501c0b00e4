"""Machine-keyed persistent-compile-cache location.

The workspace's `.jax_cache` is shared between THIS sandbox host and
the driver's machine (bench/multichip runs execute elsewhere with a
different CPU feature set).  XLA:CPU caches AOT machine code keyed by
the computation only — loading an entry compiled for a CPU with more
features (AMX/AVX-512 variants) SIGILLs/segfaults (observed: suite
crash inside compilation_cache.get_executable_and_time).  TPU
executables are device code and safe to share.

CPU-pinned processes must therefore use a cache directory salted with
the local CPU feature set.
"""

from __future__ import annotations

import hashlib
import os


def cpu_cache_dir(root: str = "/root/repo") -> str:
    """Persistent cache dir for CPU-backend processes, keyed by the
    host's CPU flags so AOT code never crosses machine types."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                key = "noflags"
    except OSError:
        key = "nocpuinfo"
    d = os.path.join(root, f".jax_cache_cpu_{key}")
    os.makedirs(d, exist_ok=True)
    return d
