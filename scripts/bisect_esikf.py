"""Pinpoint the ESIKF's ~4 ms/scan inside the fused step: ablate its
sub-computations (association, variance model, Kalman core) one at a
time on the CURRENT code.  Also re-measures the tail stages the
timed-out forward bisect missed (reroute/margi/harvest/li_ba)."""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bisect_tpu import make_problem  # noqa: E402
from bisect_ab import run  # noqa: E402

from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.odom import esikf  # noqa: E402


def main():
    print("device:", jax.devices()[0], flush=True)
    ppl, imu_noise, carry, flats = make_problem()
    saved = {}

    def ablate(name, fns=(), ppl2=None):
        for mod, attr, fn in fns:
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        jax.clear_caches()
        try:
            run(name, ppl2 or ppl, imu_noise, carry, flats)
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, fn)
            saved.clear()
            jax.clear_caches()

    run("BASE", ppl, imu_noise, carry, flats)

    def no_esikf(x_prop, vmap, pts_b, var_b, mask, params, num_iter=4,
                 meas_floor=0.0005, degen_thresh=14.0, num_match=2):
        return esikf.EsikfResult(
            x_prop, jnp.asarray(False), jnp.sum(mask),
            jnp.zeros((), pts_b.dtype))

    ablate("esikf off", [(esikf, "update", no_esikf)])

    real_match = voxelmap.match

    def dummy_match(vmap, pts_w, var_w, valid, params):
        K = pts_w.shape[0]
        n = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], pts_w.dtype), (K, 3)
        )
        return voxelmap.MatchResult(
            valid, n, pts_w[:, 2] * 0.0, jnp.ones((K,), pts_w.dtype),
            jnp.zeros((K,), jnp.int32), pts_w,
        )

    ablate("esikf: dummy association", [(voxelmap, "match", dummy_match)])

    ablate("esikf 2it/1match",
           ppl2=ppl._replace(num_esikf_iter=2, num_esikf_match=1))
    ablate("esikf 4it/1match",
           ppl2=ppl._replace(num_esikf_iter=4, num_esikf_match=1))

    # tail stages at the current base
    ablate("no li_ba", ppl2=ppl._replace(ba_max_iter=0))
    ablate("li_ba 1 iter", ppl2=ppl._replace(ba_max_iter=1))

    def no_margi(vmap, R, p, col, params, size=None, clear_col=False):
        return vmap

    ablate("no margi(+clear)", [(voxelmap, "marginalize_column", no_margi)])

    def no_reroute(vmap, pts, mask, slot_pt, R, p, col_of_w, jour,
                   params, max_reroute, pending):
        C = params.capacity
        return vmap, slot_pt, jnp.zeros((C,), bool), jnp.int32(0)

    ablate("no reroute", [(voxelmap, "reroute_subdivided", no_reroute)])

    def no_harvest(vmap, scratch, params, max_voxels, col_perm=None):
        z = jnp.zeros
        V = max_voxels
        W = vmap.win.shape[1]
        return lf.LidarFactors(
            valid=z((V,), bool), win_P=z((V, W, 6)), win_v=z((V, W, 3)),
            win_n=z((V, W)), fix_P=z((V, 6)), fix_v=z((V, 3)),
            fix_n=z((V,)), center=z((V, 3)), coe=z((V,)),
            slot=jnp.full((V,), -1, jnp.int32),
        )

    ablate("no harvest", [(lf, "harvest", no_harvest)])


if __name__ == "__main__":
    main()
