"""Per-stage timing + roofline utilization of the scan step at
production shapes on the TPU.

Times each pipeline stage as its own jitted program and reports XLA's
cost analysis (FLOPs, HBM bytes) against v5e peaks, so the limiting
resource per stage is visible (run with the default axon env; one TPU
process at a time).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")

from voxelslam_tpu.core import synthetic  # noqa: E402
from voxelslam_tpu.imu import propagation as prop  # noqa: E402
from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.lba import optimizer as opt  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.map.voxelmap import MapParams  # noqa: E402
from voxelslam_tpu.odom import esikf, pipeline as pl  # noqa: E402
from voxelslam_tpu.ops import downsample  # noqa: E402

# v5e-1 peaks (per chip): ~197 TFLOP/s bf16 MXU (f32-highest runs the
# MXU in multi-pass, ~1/4 of that), ~819 GB/s HBM
PEAK_F32 = 197e12 / 4.0
PEAK_HBM = 819e9


def timeit(name, fn, *args, n=10):
    jfn = jax.jit(fn)
    try:
        cost = jfn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
    except Exception:
        flops, byts = 0.0, 0.0
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    mfu = flops / dt / PEAK_F32 * 100
    hbm = byts / dt / PEAK_HBM * 100
    print(
        f"{name:28s} {dt * 1000:8.2f} ms   "
        f"{flops / 1e9:8.2f} GF ({mfu:5.1f}% MXU)  "
        f"{byts / 1e6:8.1f} MB ({hbm:5.1f}% HBM)"
    )
    return out


def main():
    print("device:", jax.devices()[0])
    print(f"{'stage':28s} {'time':>11s}   {'flops':>20s}  {'bytes':>18s}")
    mp_ = MapParams(capacity=1 << 17, max_probe=16, voxel_size=1.0)
    W, N_DS, N_RAW = 10, 4096, 32768
    rng = np.random.default_rng(0)

    # representative data: points on room surfaces (like a real scan)
    def room_pts(n):
        walls = []
        for axis, lim in ((0, 6.0), (1, 4.5), (2, 2.0)):
            for sgn in (-1, 1):
                k = n // 6
                p = rng.uniform(-6, 6, (k, 3))
                p[:, axis] = sgn * lim
                walls.append(p)
        out = np.concatenate(walls)
        if len(out) < n:
            out = np.concatenate([out, out[: n - len(out)]])
        return out[:n]
    pts_b = jnp.asarray(
        np.stack([room_pts(N_DS) for _ in range(W)]), jnp.float32
    )
    var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-4, (W, N_DS, 3, 3))
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (W, 3, 3))
    p = jnp.asarray(rng.normal(size=(W, 3)) * 0.1, jnp.float32)
    valid = jnp.ones((W, N_DS), bool)
    vm = voxelmap.empty(mp_, W)

    def scatter_f(vm, pts, var, R, p, valid):
        return voxelmap.scatter(vm, pts, var, R, p, valid, jnp.float32(0), mp_)[:3]

    vm, scratch, _ = timeit("scatter (W=10 x 4096)", scatter_f, vm, pts_b,
                            var, R, p, valid)

    # scatter sub-stages
    flat_w = (jnp.einsum("wij,wnj->wni", R, pts_b) + p[:, None, :]).reshape(-1, 3)
    fv = valid.reshape(-1)
    timeit("  assign (40960 pts)",
           lambda vm, q, v: voxelmap.assign(vm, q, v, mp_), vm, flat_w, fv)
    from voxelslam_tpu.map import hashmap as hm
    coord, lvl, slot0 = jax.jit(
        lambda vm, q, v: voxelmap.assign(vm, q, v, mp_))(vm, flat_w, fv)
    timeit("  insert_points (resolved)",
           lambda k, c, l, v, s0: hm.insert_points(k, c, l, v, 16, 16384,
                                                   known_slot=s0),
           vm.keys, coord, lvl, fv, slot0)
    timeit("  lookup (40960)",
           lambda k, c, l: hm.lookup(k, c, l, 16), vm.keys, coord, lvl)

    vm, _ = timeit("recut full (131k slots)",
                   lambda vm, s: voxelmap.recut(vm, s, mp_), vm, scratch)

    # incremental steady-state path
    def push_f(vm, q, v, R1, p1, m):
        return voxelmap.push_scan(vm, q, v, R1, p1, m, jnp.int32(W - 1),
                                  jnp.float32(0), mp_)

    vm2, _, touched, _ = timeit("push_scan (1 x 4096)", push_f, vm, pts_b[0],
                             var[0], R[0], p[0], valid[0])
    timeit("recut_touched (<=4096)",
           lambda vm, R, p, t: voxelmap.recut_touched(vm, R, p, t, mp_, N_DS),
           vm2, R, p, touched)
    timeit("window_sums full (131k x W)",
           lambda vm, R, p: voxelmap.window_sums(vm, R, p, mp_), vm, R, p)
    timeit("marginalize_column (compact)",
           lambda vm, R1, p1: voxelmap.marginalize_column(
               vm, R1, p1, jnp.int32(0), mp_, size=N_DS), vm, R[0], p[0])
    timeit("clear_window_col (ring)",
           lambda vm: voxelmap.clear_window_col(vm, jnp.int32(0)), vm)
    timeit("slide_window_cols (roll)", voxelmap.slide_window_cols, vm)

    match_pts = pts_b[0]
    var1 = var[0]
    m1 = valid[0]
    timeit("match (4096 pts)",
           lambda vm, q, v, m: voxelmap.match(vm, q, v, m, mp_),
           vm, match_pts, var1, m1)

    from voxelslam_tpu.core import state as st
    x = st.identity()
    timeit("esikf (4 it / 2 match)",
           lambda x, vm, q, v, m: esikf.update(x, vm, q, v, m, mp_),
           x, vm, match_pts, var1, m1)

    add_n = jnp.sum(vm.win_n, axis=1)
    factors = timeit("harvest (4096 factors)",
                     lambda vm, a: lf.harvest(vm, a, mp_, 4096), vm, add_n)

    xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (W,) + a.shape), st.identity())
    xs = xs._replace(R=R, p=p)
    from voxelslam_tpu.imu import preintegration as pre
    pres = pre.identity((W - 1,))
    pres = pres._replace(
        cov=jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32) * 1e-4,
                             (W - 1, 15, 15)),
        dtime=jnp.full((W - 1,), 0.1, jnp.float32),
    )

    timeit("lidar hess (4096 voxels)",
           lambda f, R, p: lf.evaluate_hess(
               f, lf.evaluate_residual(f, R, p)[1], R, p), factors, R, p)
    timeit("li_ba (2 LM iters)",
           lambda xs, f, pres: opt.li_ba(xs, f, pres, max_iter=2),
           xs, factors, pres)

    raw = jnp.asarray(rng.uniform(-6, 6, (N_RAW, 3)), jnp.float32)
    rmask = jnp.ones((N_RAW,), bool)
    timeit("downsample (32k raw)",
           lambda r, m: downsample.voxel_average(r, m, 0.1, N_DS), raw, rmask)

    timeit("marginalize (find-or-create)",
           lambda vm, pts, var, R, p, m: voxelmap.marginalize(
               vm, pts, var, R, p, m, mp_),
           vm, match_pts, var1, R[0], p[0], m1)

    # ---- the full fused steady step at bench shapes ----
    ppl = pl.PipelineParams(
        map_params=mp_, win_size=W, n_raw=N_RAW, n_ds=N_DS, n_imu=64,
        max_ba_voxels=4096, ba_max_iter=2,
    )
    imu_noise = prop.noise_from_cfg(0.01, 0.1, 1e-4, 1e-4)
    carry = pl.make_empty_carry(ppl, imu_noise)
    carry = carry._replace(win_count=jnp.int32(W), vmap=vm)
    flat = jnp.zeros((pl.flat_len(ppl),), jnp.float32)
    flat = flat.at[N_RAW * 4 + 64 * 8].set(4096.0)
    flat = flat.at[N_RAW * 4 + 64 * 8 + 1].set(32.0)
    eye3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    def step_f(carry, flat):
        return pl.steady_step_flat(carry, flat, ppl, imu_noise, eye3, z3,
                                   jnp.float32(1.0))

    timeit("FULL steady_step", step_f, carry, flat, n=5)


if __name__ == "__main__":
    main()
