"""Timing, counters and memory observability.

The reference instruments the pipeline with ad-hoc wall-clock deltas
t0..t8 and a VmRSS parse (voxelslam.cpp:1551-1717, get_memory
voxelslam.hpp:257-279), printed via (mostly commented) printf.  This
module provides the structured equivalent: named stage timers with
running statistics, event counters, and process/device memory
probes, drainable as a dict for logging/metrics export.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class StageStat:
    count: int = 0
    total: float = 0.0
    max: float = 0.0
    last: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total += dt
        self.max = max(self.max, dt)
        self.last = dt

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class Telemetry:
    def __init__(self):
        self.stages: Dict[str, StageStat] = defaultdict(StageStat)
        self.counters: Dict[str, int] = defaultdict(int)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name].add(time.perf_counter() - t0)

    def count(self, name: str, inc: int = 1):
        self.counters[name] += inc

    def snapshot(self) -> dict:
        out = {
            f"{k}.mean_ms": round(v.mean * 1e3, 3) for k, v in self.stages.items()
        }
        out.update(
            {f"{k}.max_ms": round(v.max * 1e3, 3) for k, v in self.stages.items()}
        )
        out.update(dict(self.counters))
        out["host_rss_gb"] = host_memory_gb()
        return out

    def report(self) -> str:
        lines = ["stage                     mean_ms    max_ms  count"]
        for k in sorted(self.stages):
            s = self.stages[k]
            lines.append(
                f"{k:24s} {s.mean * 1e3:9.2f} {s.max * 1e3:9.2f} {s.count:6d}"
            )
        for k in sorted(self.counters):
            lines.append(f"{k:24s} {self.counters[k]}")
        lines.append(f"host_rss_gb              {host_memory_gb():.2f}")
        return "\n".join(lines)


def host_memory_gb() -> float:
    """VmRSS of this process (get_memory, voxelslam.hpp:257-279)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return 0.0


def trim_host_heap() -> None:
    """Return freed-but-retained glibc arenas to the OS
    (malloc_trim(0), the reference's idle-time trim at
    voxelslam.cpp:1536).  XLA/axon compiles peak several GB of
    temporary host allocations per large program; glibc keeps those
    arenas after free, so RSS plateaus at the compile peak instead of
    the working set.  Call after warmup bursts, never per scan."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use_gb": s.get("bytes_in_use", 0) / 2**30,
                    "peak_gb": s.get("peak_bytes_in_use", 0) / 2**30,
                }
        except Exception:
            pass
    return out
