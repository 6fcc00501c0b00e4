"""In-process A/B: sort-based vs hash-probe voxel_average on the TPU.

The forward bisect (scripts/bisect_fwd.py) measured the device
downsample at 4.05 ms/scan — the single most expensive stage of the
fused steady step at bench shapes.  This times both implementations
as standalone jitted programs with chained (data-dependent) reps, at
the steady-step shape (8192 -> 2048 @ 0.25 m) and the keyframe shape
(16384 -> 16384 @ 0.1 m).

Separate programs carry 1-4 ms dispatch overhead on the tunnel
(CLAUDE.md) — identical for both variants, so the DELTA is the
signal, not the absolute.

Usage: python scripts/ab_downsample.py [reps]
"""

import sys
import time
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    sys.path.insert(0, "/root/repo")
    from voxelslam_tpu.ops import downsample

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    log("device:", jax.devices()[0])

    rng = np.random.default_rng(0)

    def scan_like(n):
        """Surface-coherent points: beams sweeping a room (the cell
        occupancy pattern is what the dedupe cost depends on)."""
        az = np.linspace(-1.2, 1.2, n) + rng.normal(0, 0.002, n)
        el = np.tile(np.linspace(-0.4, 0.4, 64), n // 64 + 1)[:n]
        r = 6.0 / np.maximum(np.abs(np.cos(az) * np.cos(el)), 0.15)
        r = np.minimum(r, 9.0)
        return np.stack([
            r * np.cos(el) * np.cos(az),
            r * np.cos(el) * np.sin(az),
            r * np.sin(el),
        ], 1).astype(np.float32)

    for (N, M, vs, label) in [
        (8192, 2048, 0.25, "steady"),
        (16384, 16384, 0.1, "keyframe"),
    ]:
        pts = scan_like(N)
        mask = np.ones(N, bool)

        def bench(fn, name):
            f = jax.jit(partial(fn, voxel_size=vs, m_out=M))
            o = f(jnp.asarray(pts), jnp.asarray(mask))
            jax.device_get(o.pts)  # compile + settle
            p = jnp.asarray(pts)
            t0 = time.time()
            for _ in range(reps):
                o = f(p, jnp.asarray(mask))
                # data dependence chains the dispatches
                p = p + 0.0 * o.pts[0, 0]
            jax.device_get(o.pts)
            dt = (time.time() - t0) / reps * 1000.0
            log(f"[{label}] {name:5s} {dt:7.3f} ms  "
                f"(n_voxels {int(o.n_voxels)})")
            return dt

        # alternate twice to expose drift
        for rnd in range(2):
            a = bench(downsample.voxel_average_sort, "sort")
            b = bench(downsample.voxel_average_hash, "hash")
            log(f"[{label}] round {rnd}: hash - sort = {b - a:+.3f} ms")


if __name__ == "__main__":
    main()
