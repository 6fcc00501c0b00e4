"""Sweep the padded static shapes of the fused steady step on TPU:
the per-scan cost is bandwidth/latency-bound in the (C,)-sized map
passes and the (N_DS, V)-sized point/factor math, so right-sizing the
padding is a first-order throughput lever.  ATE impact is checked
separately on CPU (tests) — this only measures speed.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")

from voxelslam_tpu.imu import propagation as prop  # noqa: E402
from voxelslam_tpu.map.voxelmap import MapParams  # noqa: E402
from voxelslam_tpu.odom import pipeline as pl  # noqa: E402

B = 8


def bench_shape(name, n_raw, n_ds, max_vox, cap, ba_iter=2):
    mp_ = MapParams(capacity=cap, max_probe=16, voxel_size=1.0)
    ppl = pl.PipelineParams(
        map_params=mp_, win_size=10, n_raw=n_raw, n_ds=n_ds, n_imu=64,
        max_ba_voxels=max_vox, ba_max_iter=ba_iter,
    )
    rng = np.random.default_rng(0)
    imu_noise = prop.noise_from_cfg(0.01, 0.1, 1e-4, 1e-4)
    carry = pl.make_empty_carry(ppl, imu_noise)
    carry = carry._replace(win_count=jnp.int32(10))

    def room_pts(n):
        walls = []
        for axis, lim in ((0, 6.0), (1, 4.5), (2, 2.0)):
            for sgn in (-1, 1):
                k = n // 6
                q = rng.uniform(-6, 6, (k, 3))
                q[:, axis] = sgn * lim
                walls.append(q)
        out = np.concatenate(walls)
        if len(out) < n:
            out = np.concatenate([out, out[: n - len(out)]])
        return out[:n]

    flats = []
    for b in range(B):
        dt = np.full(64, 0.005, np.float32)
        flats.append(pl.pack_scan_flat(
            room_pts(n_raw), np.linspace(0, 0.1, n_raw), n_raw,
            dt, np.tile([0.0, 0.0, 0.05], (64, 1)),
            np.tile([0.0, 0.0, 9.8], (64, 1)),
            np.linspace(0, 0.1, 64), 20, 0.0, 0.1 * (b + 1), ppl,
        ))
    flats = jnp.asarray(np.stack(flats))
    eye3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    t0 = time.time()
    c, outs = pl.steady_step_batch(carry, flats, ppl, imu_noise, eye3,
                                   z3, jnp.float32(1.0))
    jax.block_until_ready(c.x.p)
    comp = time.time() - t0
    t0 = time.time()
    n = 3
    for _ in range(n):
        c, outs = pl.steady_step_batch(c, flats, ppl, imu_noise, eye3,
                                       z3, jnp.float32(1.0))
    jax.block_until_ready(c.x.p)
    ms = (time.time() - t0) / (n * B) * 1000
    print(f"{name:42s} {ms:7.2f} ms/scan  -> {1000/ms:5.1f} scans/s"
          f"  (compile {comp:.0f}s)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        # the exact bench operating point, for controlled comparisons
        bench_shape("raw8192 ds2048 V2048 C=2^16", 8192, 2048, 2048, 1 << 16)
        bench_shape("raw8192 ds2048 V2048 C=2^15", 8192, 2048, 2048, 1 << 15)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "small":
        bench_shape("ds2048 V2048 C=2^16", 32768, 2048, 2048, 1 << 16)
        bench_shape("ds2048 V2048 C=2^15", 32768, 2048, 2048, 1 << 15)
        bench_shape("ds2048 V1024 C=2^15", 32768, 2048, 1024, 1 << 15)
        bench_shape("ds1536 V1536 C=2^15", 32768, 1536, 1536, 1 << 15)
        return
    bench_shape("BASE raw32k ds4096 V4096 C=2^17", 32768, 4096, 4096, 1 << 17)
    bench_shape("ds2048 V2048 C=2^17", 32768, 2048, 2048, 1 << 17)
    bench_shape("ds2048 V2048 C=2^16", 32768, 2048, 2048, 1 << 16)
    bench_shape("ds4096 V2048 C=2^16", 32768, 4096, 2048, 1 << 16)
    bench_shape("ds2048 V1024 C=2^16", 32768, 2048, 1024, 1 << 16)
    bench_shape("ds2048 V2048 C=2^16 ba1", 32768, 2048, 2048, 1 << 16, 1)


if __name__ == "__main__":
    main()
