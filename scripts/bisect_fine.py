"""Fine-grained intra-stage ablations of the fused steady step —
pinpoints WHERE inside li_ba / harvest / recut / push the milliseconds
live (the stage-level bisect_tpu.py only prices whole stages).

Same methodology: monkeypatch a sub-computation to a shape-correct
no-op, recompile the SAME fused batched program, subtract.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bisect_tpu import make_problem, run, B  # noqa: E402

from voxelslam_tpu.core import hashing  # noqa: E402
from voxelslam_tpu.imu import propagation as prop  # noqa: E402
from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.lba import optimizer as opt  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.odom import esikf  # noqa: E402


def main():
    print("device:", jax.devices()[0], f"batch={B}", flush=True)
    ppl, imu_noise, carry, flats = make_problem()

    run("BASE", ppl, imu_noise, carry, flats)
    saved = {}

    def ablate(name, fns):
        for mod, attr, fn in fns:
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        jax.clear_caches()
        try:
            run(name, ppl, imu_noise, carry, flats)
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, fn)
            saved.clear()
            jax.clear_caches()

    # ---- li_ba internals ----
    def no_solve(H, g, u, n_fix):
        return jnp.zeros_like(g), jnp.ones((), H.dtype)

    ablate("li_ba: no damped solve", [(opt, "_solve_damped", no_solve)])

    def no_hess(factors, cache, R, p):
        W_ = R.shape[0]
        dt = R.dtype
        return (jnp.zeros((), dt), jnp.zeros((W_, 6), dt),
                jnp.zeros((W_, W_, 6, 6), dt))

    ablate("li_ba: no evaluate_hess", [(lf, "evaluate_hess", no_hess)])

    def no_resid(factors, R, p):
        V = factors.valid.shape[0]
        dt = R.dtype
        cache = lf.FactorCache(
            lmbd=jnp.zeros((V, 3), dt),
            U=jnp.broadcast_to(jnp.eye(3, dtype=dt), (V, 3, 3)),
            vbar=jnp.zeros((V, 3), dt), NN=jnp.ones((V,), dt),
        )
        return jnp.zeros((), dt), cache

    ablate("li_ba: no evaluate_residual",
           [(lf, "evaluate_residual", no_resid)])

    def no_imu_sys(xs, pres, with_gravity):
        n = xs.p.shape[0] * 15 + (3 if with_gravity else 0)
        dt = xs.p.dtype
        return jnp.zeros((n, n), dt), jnp.zeros((n,), dt), jnp.zeros((), dt)

    def no_imu_res(xs, pres):
        return jnp.zeros((), xs.p.dtype)

    ablate("li_ba: no imu factors",
           [(opt, "_imu_system", no_imu_sys),
            (opt, "_imu_residual", no_imu_res)])

    # ---- harvest internals ----
    real_harvest = lf.harvest

    def mk_harvest(skip_nonzero=False, skip_gather=False):
        def h(vmap, scratch, params, max_voxels, col_perm=None):
            from voxelslam_tpu.map.voxelmap import (
                CL_N, CL_P, CL_V, MT_EIG, MT_VALID, ScanScratch,
            )
            add_n = (scratch.add_n
                     if isinstance(scratch, ScanScratch) else scratch)
            lam = vmap.meta[:, MT_EIG]
            ratio_ok = lam[:, 0] / jnp.maximum(lam[:, 1], 1e-12) <= 0.12
            cond = ((vmap.keys[:, 3] >= 0) & (vmap.state == 0)
                    & (vmap.meta[:, MT_VALID] > 0.5) & (add_n > 0)
                    & ratio_ok)
            C = vmap.keys.shape[0]
            if skip_nonzero:
                idx = jnp.arange(max_voxels, dtype=jnp.int32)
            else:
                (idx,) = jnp.nonzero(cond, size=max_voxels, fill_value=C)
            ok = idx < C
            s = jnp.clip(idx, 0, C - 1)
            dtype = vmap.win.dtype
            level = jnp.clip(vmap.keys[s, 3], 0)
            sizes = jnp.asarray(
                [params.level_size(l)
                 for l in range(params.max_layer + 1)], dtype)
            center = ((vmap.keys[s, :3].astype(dtype) + 0.5)
                      * sizes[level][:, None])
            W_ = vmap.win.shape[1]
            if skip_gather:
                wrow = jnp.zeros((max_voxels, W_, 10), dtype)
                frow = jnp.zeros((max_voxels, 10), dtype)
            else:
                wrow = vmap.win[s]
                frow = vmap.fix[s]
            if col_perm is not None:
                wrow = wrow[:, col_perm]
            wn = wrow[:, :, CL_N]
            has = (wn > 0) & ok[:, None]
            return lf.LidarFactors(
                valid=ok,
                win_P=jnp.where(has[:, :, None], wrow[:, :, CL_P], 0.0),
                win_v=jnp.where(has[:, :, None], wrow[:, :, CL_V], 0.0),
                win_n=jnp.where(has, wn, 0.0),
                fix_P=jnp.where(ok[:, None], frow[:, CL_P], 0.0),
                fix_v=jnp.where(ok[:, None], frow[:, CL_V], 0.0),
                fix_n=jnp.where(ok, frow[:, CL_N], 0.0),
                center=center, coe=ok.astype(dtype),
                slot=jnp.where(ok, idx, -1),
            )
        return h

    ablate("harvest: no nonzero", [(lf, "harvest", mk_harvest(True, False))])
    ablate("harvest: no win/fix gather",
           [(lf, "harvest", mk_harvest(False, True))])
    ablate("harvest: neither", [(lf, "harvest", mk_harvest(True, True))])

    # ---- recut internals ----
    def no_plane_params(P, v, n, cov9, w, V):
        shp = P.shape[:-1]
        return (V[..., :, 0], v,
                jnp.zeros(shp + (6, 6), P.dtype), w[..., 2])

    ablate("recut: no plane_params",
           [(voxelmap, "_plane_params", no_plane_params)])

    # ---- assign (multi-level hash probe) ----
    def assign_fake(vmap, pts_w, valid, params):
        coord = hashing.voxel_coord(pts_w, params.voxel_size)
        lvl = jnp.zeros(pts_w.shape[:-1], jnp.int32)
        slot = hashing.slot_of(coord, lvl, params.capacity)
        return coord, lvl, jnp.where(valid, slot, -1)

    ablate("assign: hash only (no probe)",
           [(voxelmap, "assign", assign_fake)])

    # ---- esikf entirely off ----
    def no_esikf(x_prop, vmap, pts_b, var_b, mask, params, num_iter=4,
                 meas_floor=0.0005, degen_thresh=14.0, num_match=2):
        return esikf.EsikfResult(
            x_prop, jnp.asarray(False), jnp.sum(mask),
            jnp.zeros((), pts_b.dtype))

    ablate("esikf: off", [(esikf, "update", no_esikf)])

    # ---- propagate (lax.scan over IMU intervals) ----
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

    ablate("propagate: off", [(prop, "propagate", no_propagate)])


if __name__ == "__main__":
    main()
