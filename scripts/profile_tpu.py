"""Per-stage timing of the scan step at production shapes on the TPU.

Times each pipeline stage as its own jitted program to locate the
bottleneck (run with the default axon env; one TPU process at a time).
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


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return out


def main():
    print("device:", jax.devices()[0])
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

    scatter_j = jax.jit(
        lambda vm, pts, var, R, p, valid: voxelmap.scatter(
            vm, pts, var, R, p, valid, jnp.float32(0), mp_
        )
    )
    vm, scratch, _ = timeit("scatter (W=10 x 4096)", scatter_j, vm, pts_b, var, R, p, valid)

    # scatter sub-stages
    flat_w = (jnp.einsum("wij,wnj->wni", R, pts_b) + p[:, None, :]).reshape(-1, 3)
    fv = valid.reshape(-1)
    assign_j = jax.jit(lambda vm, q, v: voxelmap.assign(vm, q, v, mp_))
    timeit("  assign (40960 pts)", assign_j, vm, flat_w, fv)
    from voxelslam_tpu.map import hashmap as hm
    coord, lvl, _ = assign_j(vm, flat_w, fv)
    ins_j = jax.jit(lambda k, c, l, v: hm.insert_points(k, c, l, v, 16, 16384))
    timeit("  insert_points", ins_j, vm.keys, coord, lvl, fv)
    lookup_j = jax.jit(lambda k, c, l: hm.lookup(k, c, l, 16))
    timeit("  lookup (40960)", lookup_j, vm.keys, coord, lvl)

    recut_j = jax.jit(lambda vm, s: voxelmap.recut(vm, s, mp_))
    vm, _ = timeit("recut (131k slots)", recut_j, vm, scratch)

    # incremental steady-state path: one-scan push + window_sums
    push_j = jax.jit(
        lambda vm, q, v, R1, p1, m: voxelmap.push_scan(
            vm, q, v, R1, p1, m, jnp.int32(W - 1), jnp.float32(0), mp_
        )
    )
    timeit("push_scan (1 x 4096)", push_j, vm, pts_b[0], var[0], R[0],
           p[0], valid[0])
    wsums_j = jax.jit(lambda vm, R, p: voxelmap.window_sums(vm, R, p, mp_))
    timeit("window_sums (131k x W)", wsums_j, vm, R, p)
    mcol_j = jax.jit(
        lambda vm, R1, p1: voxelmap.marginalize_column(
            vm, R1, p1, jnp.int32(0), mp_
        )
    )
    timeit("marginalize_column", mcol_j, vm, R[0], p[0])
    slide_j = jax.jit(voxelmap.slide_window_cols)
    timeit("slide_window_cols", slide_j, vm)

    match_pts = pts_b[0]
    var1 = var[0]
    m1 = valid[0]
    match_j = jax.jit(
        lambda vm, q, v, m: voxelmap.match(vm, q, v, m, mp_)
    )
    timeit("match (4096 pts)", match_j, vm, match_pts, var1, m1)

    from voxelslam_tpu.core import state as st
    x = st.identity()
    esikf_j = jax.jit(
        lambda x, vm, q, v, m: esikf.update(x, vm, q, v, m, mp_)
    )
    timeit("esikf update (4 iters)", esikf_j, x, vm, match_pts, var1, m1)

    harvest_j = jax.jit(lambda vm, s: lf.harvest(vm, s, mp_, 4096))
    factors = timeit("harvest (4096 factors)", harvest_j, vm, scratch)

    xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (W,) + a.shape), st.identity())
    xs = xs._replace(R=R, p=p)
    from voxelslam_tpu.imu import preintegration as pre
    pres = pre.identity((W - 1,))
    pres = pres._replace(cov=jnp.broadcast_to(jnp.eye(15, dtype=jnp.float32) * 1e-4, (W - 1, 15, 15)), dtime=jnp.full((W - 1,), 0.1, jnp.float32))

    hess_j = jax.jit(
        lambda f, R, p: lf.evaluate_hess(
            f, lf.evaluate_residual(f, R, p)[1], R, p
        )
    )
    timeit("lidar hess (4096 voxels)", hess_j, factors, R, p)

    liba_j = jax.jit(
        lambda xs, f, pres: opt.li_ba(xs, f, pres, max_iter=3)
    )
    timeit("li_ba (3 LM iters)", liba_j, xs, factors, pres)

    raw = jnp.asarray(rng.uniform(-6, 6, (N_RAW, 3)), jnp.float32)
    rmask = jnp.ones((N_RAW,), bool)
    ds_j = jax.jit(lambda r, m: downsample.voxel_average(r, m, 0.1, N_DS))
    timeit("downsample (32k raw)", ds_j, raw, rmask)

    margi_j = jax.jit(
        lambda vm, pts, var, R, p, m: voxelmap.marginalize(vm, pts, var, R, p, m, mp_)
    )
    timeit("marginalize", margi_j, vm, match_pts, var1, R[0], p[0], m1)

    # micro: the scatter building blocks
    from voxelslam_tpu.ops import segsum
    K = 40960
    idx = jnp.sort(jnp.asarray(rng.integers(0, 4000, K), jnp.int32))
    vals81 = jnp.asarray(rng.normal(size=(K, 81)).astype(np.float32))
    seg_j = jax.jit(lambda i, v: segsum.sorted_segment_add(
        jnp.zeros((1 << 17, 81), jnp.float32), i, v))
    timeit("micro segadd (40960x81)", seg_j, idx, vals81)
    keys_r = jnp.asarray(rng.integers(-(2**31), 2**31 - 1, K), jnp.int32)
    sort_j = jax.jit(lambda k: jnp.argsort(k))
    timeit("micro argsort (40960)", sort_j, keys_r)
    scat_j = jax.jit(lambda i, v: jnp.zeros((1 << 17, 81), jnp.float32)
                     .at[i].add(v, mode="drop", indices_are_sorted=True))
    timeit("micro rawscatter81", scat_j, idx, vals81)


if __name__ == "__main__":
    main()
