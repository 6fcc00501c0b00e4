"""Targeted A/B of individual round-3 perf edits against the fused
steady-step program, with a longer timing window (n=8 batches) than
bisect_tpu.py to beat the tunneled device's run-to-run jitter."""

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

from voxelslam_tpu.core import cluster, so3  # noqa: E402
from voxelslam_tpu.imu import propagation as prop  # noqa: E402
from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.odom import pipeline as pl  # noqa: E402


def run(name, ppl, imu_noise, carry, flats, n=8):
    eye3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)
    t0 = time.time()
    c1, outs = pl.steady_step_batch(carry, flats, ppl, imu_noise,
                                    eye3, z3, jnp.float32(1.0))
    jax.block_until_ready(c1.x.p)
    compile_s = time.time() - t0
    # warm once more to settle
    c, _ = pl.steady_step_batch(c1, flats, ppl, imu_noise, eye3, z3,
                                jnp.float32(1.0))
    jax.block_until_ready(c.x.p)
    t0 = time.time()
    for _ in range(n):
        c, outs = pl.steady_step_batch(c, flats, ppl, imu_noise,
                                       eye3, z3, jnp.float32(1.0))
    jax.block_until_ready(c.x.p)
    per_scan = (time.time() - t0) / (n * B) * 1000
    print(f"{name:34s} {per_scan:7.2f} ms/scan (compile {compile_s:.0f}s)",
          flush=True)
    return per_scan


def clear_dus(vmap, col):
    """Rejected variant kept for reference: full-lane zero via
    dynamic_update_slice (measured ~1 ms slower than the multiply)."""
    C, W, L = vmap.win.shape
    z = jnp.zeros((C, 1, L), vmap.win.dtype)
    win = jax.lax.dynamic_update_slice(
        vmap.win, z, (jnp.int32(0), col.astype(jnp.int32), jnp.int32(0))
    )
    return vmap._replace(win=win)


def old_evaluate_hess(factors, cache, R, p):
    """Round-2 evaluate_hess (materializes (V, W, 6, 6) diag blocks)."""
    dtype = factors.win_P.dtype
    W = R.shape[0]
    V = factors.valid.shape[0]
    u = cache.U[:, :, 0]
    lam = cache.lmbd
    NN = cache.NN
    vbar = cache.vbar
    coe = factors.coe * factors.valid
    umumT = jnp.zeros((V, 3, 3), dtype)
    for m in (1, 2):
        um = cache.U[:, :, m]
        gap = lam[:, 0] - lam[:, m]
        coef = 2.0 / jnp.where(jnp.abs(gap) > 1e-9, gap, -1e-9)
        umumT = umumT + coef[:, None, None] * (
            um[:, :, None] * um[:, None, :]
        )
    Pi = cluster.unpack_sym(factors.win_P)
    vi = factors.win_v
    ni = factors.win_n
    has = ni > 0
    t = p[None, :, :] - factors.center[:, None, :]
    RiTu = jnp.einsum("wji,vj->vwi", R, u)
    viRiTu = jnp.cross(vi, RiTu)
    PiRiTu = jnp.einsum("vwij,vwj->vwi", Pi, RiTu)
    ti_v = t - vbar[:, None, :]
    uTtv = jnp.einsum("vi,vwi->vw", u, ti_v)
    combo1 = so3.hat(PiRiTu) + so3.hat(vi) * uTtv[..., None, None]
    combo2 = jnp.einsum("wij,vwj->vwi", R, vi) + ni[..., None] * ti_v
    RiTu_hat = so3.hat(RiTu)
    RP = jnp.einsum("wij,vwjk->vwik", R, Pi)
    left = (
        (RP + ti_v[..., :, None] * vi[..., None, :]) @ RiTu_hat
        - jnp.einsum("wij,vwjk->vwik", R, combo1)
    )
    right = combo2[..., :, None] * u[:, None, None, :] + jnp.einsum(
        "vwi,vi->vw", combo2, u
    )[..., None, None] * jnp.eye(3, dtype=dtype)
    Auk = jnp.concatenate([left, right], axis=-1) / NN[:, None, None, None]
    Auk = jnp.where(has[..., None, None], Auk, 0.0)
    jjt = jnp.einsum("vwia,vi->vwa", Auk, u)
    grad = jnp.einsum("v,vwa->wa", coe, jjt)
    H = jnp.einsum("v,vwia,vij,vujb->wuab", coe, Auk, umumT, Auk)
    inv_nn = 1.0 / NN
    inv_nn2 = inv_nn * inv_nn
    rot_corr = (
        2.0 * inv_nn[:, None, None, None]
        * ((combo1 - RiTu_hat @ Pi) @ RiTu_hat)
        - 2.0 * inv_nn2[:, None, None, None]
        * (viRiTu[..., :, None] * viRiTu[..., None, :])
        - 0.5 * so3.hat(jjt[..., 0:3])
    )
    HRt = (
        2.0 * inv_nn[:, None, None]
        * (1.0 - ni * inv_nn[:, None])[..., None]
    )[..., None] * (viRiTu[..., :, None] * u[:, None, None, :])
    tt_corr = (
        2.0 * inv_nn[:, None] * (ni - ni * ni * inv_nn[:, None])
    )[..., None, None] * (u[:, None, :, None] * u[:, None, None, :])
    diag = jnp.zeros((V, W, 6, 6), dtype)
    diag = diag.at[..., 0:3, 0:3].set(rot_corr)
    diag = diag.at[..., 0:3, 3:6].set(HRt)
    diag = diag.at[..., 3:6, 0:3].set(jnp.swapaxes(HRt, -1, -2))
    diag = diag.at[..., 3:6, 3:6].set(tt_corr)
    diag = jnp.where(has[..., None, None], diag, 0.0)
    H = H + jnp.einsum(
        "v,vwab,wu->wuab", coe, diag, jnp.eye(W, dtype=dtype)
    )
    m_rr = jnp.einsum("v,vwi,vuj->wuij", -2.0 * coe * inv_nn2, viRiTu, viRiTu)
    m_rt = jnp.einsum(
        "v,vwi,vu,vj->wuij", -2.0 * coe * inv_nn2, viRiTu, ni, u
    )
    m_tt = jnp.einsum(
        "v,vw,vu,vi,vj->wuij", -2.0 * coe * inv_nn2, ni, ni, u, u
    )
    off = jnp.zeros((W, W, 6, 6), dtype)
    off = off.at[..., 0:3, 0:3].set(m_rr)
    off = off.at[..., 0:3, 3:6].set(m_rt)
    off = off.at[..., 3:6, 0:3].set(jnp.swapaxes(m_rt, 0, 1).transpose(0, 1, 3, 2))
    off = off.at[..., 3:6, 3:6].set(m_tt)
    eyeW = jnp.eye(W, dtype=dtype)
    off = off * (1.0 - eyeW)[:, :, None, None]
    H = H + off
    resid = jnp.sum(coe * lam[:, 0])
    return resid, grad, H


def main():
    print("device:", jax.devices()[0], f"batch={B}", flush=True)
    ppl, imu_noise, carry, flats = make_problem()
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

    run("BASE (r3 edits)", ppl, imu_noise, carry, flats)
    ablate("clear: dyn-update-slice", [(voxelmap, "clear_window_col",
                                        clear_dus)])
    prop.UNROLL = 1
    ablate("imu scans unroll=1", [])
    prop.UNROLL = 8
    ablate("old evaluate_hess", [(lf, "evaluate_hess", old_evaluate_hess)])
    run("BASE again", ppl, imu_noise, carry, flats)


if __name__ == "__main__":
    main()
