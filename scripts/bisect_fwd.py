"""FORWARD bisect of the fused steady step: start from a skeleton
where every major stage is a shape-correct no-op, then re-enable
stages one at a time (cumulative).  Unlike backward ablation, the
workload below each measurement is fixed (no trajectory-shift bias),
so the increments attribute cleanly and sum to ~BASE."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bisect_tpu import make_problem, B  # noqa: E402
from bisect_ab import run  # noqa: E402

from voxelslam_tpu.imu import propagation as prop  # noqa: E402
from voxelslam_tpu.imu import preintegration as pre  # noqa: E402
from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.lba import optimizer as opt  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.odom import esikf  # noqa: E402
from voxelslam_tpu.ops import downsample  # noqa: E402


def make_noops():
    """name -> (module, attr, noop_fn) for every major stage."""

    def no_propagate(x, imus, noise, dt_ext, scale_gravity, t_end):
        M = imus.dt.shape[0]
        dt = x.p.dtype
        poses = prop.ImuPoses(
            offt=imus.offt,
            R=jnp.broadcast_to(x.R, (M, 3, 3)),
            p=jnp.broadcast_to(x.p, (M, 3)),
            v=jnp.broadcast_to(x.v, (M, 3)),
            w=jnp.zeros((M, 3), dt), a=jnp.zeros((M, 3), dt),
        )
        return x._replace(t=jnp.asarray(t_end, dt)), poses

    def no_integrate(bg0, ba0, dt, gyr, acc, valid, nm, nw, scale):
        return pre.identity((), bg0.dtype)._replace(bg0=bg0, ba0=ba0)

    def no_deskew(pts, offsets, mask, poses, x_end, ext_R, ext_t):
        return pts

    def no_downsample(pts, mask, size, n_out):
        m = mask[:n_out]
        return downsample.Downsampled(pts[:n_out], m, jnp.sum(m), None)

    def no_esikf(x_prop, vmap, pts_b, var_b, mask, params, num_iter=4,
                 meas_floor=0.0005, degen_thresh=14.0, num_match=2):
        return esikf.EsikfResult(
            x_prop, jnp.asarray(False), jnp.sum(mask),
            jnp.zeros((), pts_b.dtype))

    def no_push(vmap, pts, var, R, p, valid, col, jour, params):
        return vmap, jnp.int32(0), jnp.zeros(
            (params.capacity,), bool
        ), jnp.full((pts.shape[0],), params.capacity, jnp.int32)

    def no_recut(vmap, R, p, touch, params, size):
        return vmap, jnp.int32(0), jnp.sum(vmap.win_n, axis=1)

    def no_reroute(vmap, pts, mask, slot_pt, R, p, col_of_w, jour,
                   params, max_reroute, pending):
        C = params.capacity
        return vmap, slot_pt, jnp.zeros((C,), bool), jnp.int32(0)

    def no_margi(vmap, R, p, col, params, size=None, clear_col=False):
        return vmap

    def no_clear(vmap, col):
        return vmap

    def no_harvest(vmap, scratch, params, max_voxels, col_perm=None):
        z = jnp.zeros
        V = max_voxels
        W = vmap.win.shape[1] if col_perm is None else col_perm.shape[0]
        return lf.LidarFactors(
            valid=z((V,), bool), win_P=z((V, W, 6)), win_v=z((V, W, 3)),
            win_n=z((V, W)), fix_P=z((V, 6)), fix_v=z((V, 3)),
            fix_n=z((V,)), center=z((V, 3)), coe=z((V,)),
            slot=jnp.full((V,), -1, jnp.int32),
        )

    def no_li_ba(xs, factors, pres, imu_coef=1e-4, max_iter=3,
                 with_gravity=False, u_init=0.01, g_norm_prior=None,
                 g_prior_weight=1000.0, mesh=None):
        W = xs.p.shape[0]
        n = W * 15
        return opt.BAResult(
            xs, jnp.zeros((n, n), xs.p.dtype), jnp.zeros(()),
            jnp.zeros(()), jnp.asarray(True),
        )

    return [
        ("li_ba", (opt, "li_ba", no_li_ba)),
        ("harvest", (lf, "harvest", no_harvest)),
        ("margi", (voxelmap, "marginalize_column", no_margi)),
        ("clear_col", (voxelmap, "clear_window_col", no_clear)),
        ("reroute", (voxelmap, "reroute_subdivided", no_reroute)),
        ("recut", (voxelmap, "recut_touched", no_recut)),
        ("push_scan", (voxelmap, "push_scan", no_push)),
        ("esikf", (esikf, "update", no_esikf)),
        ("downsample", (downsample, "voxel_average", no_downsample)),
        ("deskew", (prop, "deskew", no_deskew)),
        ("preint", (pre, "integrate", no_integrate)),
        ("propagate", (prop, "propagate", no_propagate)),
    ]


def main():
    print("device:", jax.devices()[0], f"batch={B}", flush=True)
    ppl, imu_noise, carry, flats = make_problem()
    noops = make_noops()
    saved = {(m, a): getattr(m, a) for _, (m, a, _) in noops}

    # apply ALL noops -> skeleton
    for _, (m, a, fn) in noops:
        setattr(m, a, fn)
    jax.clear_caches()
    try:
        prev = run("SKELETON (all stages off)", ppl, imu_noise, carry,
                   flats)
        # re-enable one stage at a time, innermost-dependency first
        for name, (m, a, _) in reversed(noops):
            setattr(m, a, saved[(m, a)])
            jax.clear_caches()
            cur = run(f"+{name}", ppl, imu_noise, carry, flats)
            print(f"    delta({name}) = {cur - prev:+.2f} ms/scan",
                  flush=True)
            prev = cur
    finally:
        for (m, a), fn in saved.items():
            setattr(m, a, fn)
        jax.clear_caches()


if __name__ == "__main__":
    main()
