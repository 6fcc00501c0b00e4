"""Odometry + local-mapping pipeline: the per-scan hot path.

TPU-native counterpart of `thd_odometry_localmapping`
(voxelslam.cpp:1456-1738).  The whole per-scan computation —

  IMU propagate + deskew → voxel downsample → iterated ESIKF update →
  window push → map scatter → plane refit → BA factor harvest →
  LiDAR-inertial LM → marginalize oldest scan → window slide

— is ONE jitted device program (`steady_step`); the host only feeds
padded scan batches and drains pose outputs.  A second jitted program
(`fill_step`) grows the window during startup, and `init_refine` is
the dynamic initialization: gravity-refining BA over the first window
plus world gravity alignment (motion_init, voxelslam.cpp:563-713).

Degeneracy detection and the session-reset escalation
(voxelslam.cpp:1618-1634) are surfaced to the host through the step
outputs; the host-side runner (pipeline driver) decides resets.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3, state
from ..core.state import DIM, NavState
from ..imu import preintegration as pre
from ..imu import propagation as prop
from ..lba import lidar_factor as lf
from ..lba import optimizer as opt
from ..map import voxelmap
from ..map.voxelmap import MapParams, VoxelMap
from ..ops import downsample
from . import esikf, noise


class PipelineParams(NamedTuple):
    """Static (hashable) pipeline configuration."""

    map_params: MapParams
    win_size: int = 10
    n_raw: int = 8192  # padded raw points per scan
    n_ds: int = 2048  # padded downsampled points
    n_imu: int = 32  # padded IMU intervals per scan
    max_ba_voxels: int = 2048
    down_size: float = 0.1
    min_ds_points: int = 500  # fallback-to-finer-leaf bound (voxelslam.cpp:1577)
    dept_err: float = 0.02
    beam_err: float = 0.05
    imu_coef: float = 1e-4
    scatter_passes: int = 2
    num_esikf_iter: int = 4
    num_esikf_match: int = 2  # map-association rounds within the ESIKF
    #   (≤2 rematches like the reference, voxelslam.cpp:892-899)
    degen_thresh: float = 14.0
    ba_max_iter: int = 3
    # steady-state subdivision-rebuild deferral: rebuild when pending
    # subdivisions exceed subdiv_burst, or any are older than
    # subdiv_defer scans (legacy valve; the inline re-route below
    # normally drains subdivisions without host rebuilds)
    subdiv_defer: int = 8
    subdiv_burst: int = 16
    # fill-phase ESIKF prior deweight (the reference's kdtree-phase
    # /1000, voxelslam.cpp:1056).  1000 makes the filter nearly
    # unregularized during fill: ulp-level perturbations (e.g. f32
    # chunk-boundary effects in the segment sums) measurably shift the
    # fill trajectory and can land init in a bad basin on dense scans
    fill_prior_deweight: float = 1000.0
    # inline subdivision re-route: resident window points moved to
    # child voxels per steady scan (bounded; backlog retries next scan)
    # 512 lets subdivision-burst backlogs outlive their window column:
    # not-yet-rerouted points are dropped from fixed history at
    # marginalization (parents are skipped there), which cost ATE
    # 0.007->0.019 on the bench room
    max_reroute: int = 1024
    # plane-refit compaction bound per steady scan: voxels skipped by
    # the bound stay growth-flagged (last_num unchanged) and retry on
    # their next touch.  BEFORE the refit growth gate, 1024 starved
    # refits at ds=2048 (ATE 0.007->0.019 on the bench room); WITH the
    # gate (refit_growth >= 5 filters the touched set first) 1024 is
    # ATE-neutral there (round-2 bench: 0.0066) and saves ~15% step
    # time.  Default stays n_ds for safety in unmeasured worlds.
    refit_size: int = 2048
    # down_sampling_pvec parity flag (voxel_map.hpp:24-65): average
    # per-point covariances jointly with the centroid instead of
    # recomputing the noise model at the representative point.
    # Measured ATE-neutral on the synthetic rooms (see
    # tests/test_map.py::test_pvec_downsample_*); costs a body_var at
    # n_raw instead of n_ds.
    pvec_downsample: bool = False
    # strided subsample instead of the device voxel average: when the
    # HOST already pre-reduced the raw scan to ~one representative per
    # down_size cell (SlamFrontend._reduce_raw does exactly that for
    # scans over n_raw), the device voxel_average re-groups
    # already-unique cells and its 8192-point sort costs ~4 ms/scan in
    # the fused step (forward-bisect, round 3).  The strided pick of
    # n_ds valid points is a uniform spatial subsample of the same
    # cell set — measured ATE-neutral on the bench room — and is
    # sort-free.  Scans that DON'T exceed n_raw skip host reduction,
    # so only enable when the stream is dense (bench/production).
    fast_subsample: bool = False


class WindowState(NamedTuple):
    pts: jnp.ndarray  # (W, N, 3) body-frame downsampled points
    var: jnp.ndarray  # (W, N, 3, 3) world covariances (as pushed)
    mask: jnp.ndarray  # (W, N)
    xs: NavState  # stacked window states (leading dim W)
    pres: pre.Preint  # stacked (W-1) preintegration factors
    slot: jnp.ndarray  # (W, N) int32 map slot each point routed to at
    #   push time (C = invalid) — consumed by the inline subdivision
    #   re-route (voxelmap.reroute_subdivided)


class Carry(NamedTuple):
    x: NavState
    vmap: VoxelMap
    win: WindowState
    win_count: jnp.ndarray  # () int32
    jour: jnp.ndarray  # () travel distance stamp
    last_pos: jnp.ndarray  # (3,)
    init_flat: jnp.ndarray  # (W, FLAT) raw fill-phase scan inputs,
    #   stashed for the dynamic-init re-deskew loop (the reference
    #   keeps time-sorted raw scans for the same purpose,
    #   voxelslam.cpp:1263-1276)
    col0: jnp.ndarray  # () int32 physical map-window column of the
    #   OLDEST window slot: the per-voxel cluster columns of the map
    #   are a ring buffer (the reference's mp[] ring indices,
    #   voxelslam.cpp:1689-1693) — logical slot w lives in physical
    #   column (col0 + w) % W.  Full-rebuild paths write columns in
    #   logical order and reset col0 = 0.
    rr_touch: jnp.ndarray  # (C,) bool — child voxels created by last
    #   scan's subdivision re-route, folded into the next recut's
    #   touched set so fresh children get planes one scan later
    rr_pending: jnp.ndarray  # () int32 — nonzero iff subdivided voxels
    #   may still hold un-rerouted window points (fresh recut
    #   subdivisions + reroute backlog): gates the reroute pass's
    #   expensive branch (lax.cond), which is skipped on the
    #   overwhelmingly common no-subdivision steady scan


class ScanInputs(NamedTuple):
    pts: jnp.ndarray  # (n_raw, 3) LiDAR-frame raw points
    offsets: jnp.ndarray  # (n_raw,) per-point time offsets (s)
    mask: jnp.ndarray  # (n_raw,)
    imu: prop.ImuBatch  # padded IMU intervals
    dt_ext: jnp.ndarray  # () end extrapolation
    t_end: jnp.ndarray  # ()


class StepOutputs(NamedTuple):
    x: NavState  # posterior scan-end state
    degenerate: jnp.ndarray
    match_count: jnp.ndarray
    n_factors: jnp.ndarray
    ba_resid: jnp.ndarray
    # marginalized ScanPose export to the loop-closure layer
    scan_pose: NavState
    scan_v6: jnp.ndarray  # (6,) odometry edge noise (voxelslam.cpp:1656-1658)
    scan_pts: jnp.ndarray  # (N, 3) int16 marginalized-scan body points,
    #   quantized at 1 cm (host multiplies by 0.01) to slim the
    #   device->host transfer
    scan_mask: jnp.ndarray  # (N,)
    overflow: jnp.ndarray
    n_subdiv: jnp.ndarray  # () voxels subdivided this scan (drained
    #   inline by the re-route pass; exported for telemetry)
    jour: jnp.ndarray  # () travel stamp — host reads it from RESOLVED
    #   outputs so eviction throttling never syncs on the in-flight
    #   batch (a float(carry.jour) after dispatch would serialize the
    #   async pipeline)
    n_occupied: jnp.ndarray  # () int32 hash-table occupancy — same
    #   resolved-outputs discipline for the compaction valve (a
    #   load_factor(carry.vmap.keys) on the host would block on the
    #   in-flight batch)


def make_empty_carry(pp: PipelineParams, noise_cfg: prop.ImuNoise,
                     dtype=jnp.float32) -> Carry:
    W, N = pp.win_size, pp.n_ds
    x = state.identity(dtype)
    xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (W,) + a.shape).copy(), x)
    pres = pre.identity((W - 1,), dtype)
    C = pp.map_params.capacity
    win = WindowState(
        pts=jnp.zeros((W, N, 3), dtype),
        var=jnp.zeros((W, N, 3, 3), dtype),
        mask=jnp.zeros((W, N), bool),
        xs=xs,
        pres=pres,
        slot=jnp.full((W, N), C, jnp.int32),
    )
    return Carry(
        x=x,
        vmap=voxelmap.empty(pp.map_params, W, dtype),
        win=win,
        win_count=jnp.zeros((), jnp.int32),
        jour=jnp.zeros((), dtype),
        last_pos=jnp.zeros((3,), dtype),
        init_flat=jnp.zeros((W, flat_len(pp)), dtype),
        col0=jnp.zeros((), jnp.int32),
        rr_touch=jnp.zeros((C,), bool),
        rr_pending=jnp.zeros((), jnp.int32),
    )


# ------------------------------------------------------------ shared pieces

def _front_end(carry: Carry, inp: ScanInputs, pp: PipelineParams,
               imu_noise: prop.ImuNoise, ext_R, ext_t, scale_gravity,
               prior_deweight=1.0):
    """Propagate → deskew → downsample → ESIKF → world-var inflation.
    Returns (x_post, pts_b, var_b, var_w, ds_mask, esikf result, preint).
    """
    x_prop, poses = prop.propagate(
        carry.x, inp.imu, imu_noise, inp.dt_ext, scale_gravity, inp.t_end
    )
    desk = prop.deskew(inp.pts, inp.offsets, inp.mask, poses, x_prop,
                       ext_R, ext_t)

    if pp.fast_subsample:
        # strided pick of n_ds valid deskewed points (see the
        # PipelineParams note; host pre-reduction already enforced the
        # down_size cell spacing).  Valid raw points are a prefix
        # (ScanInputs.mask = arange < n_valid), so the stride indexes
        # real points; duplicates can only appear when n_valid < n_ds,
        # where the identity prefix is used instead.
        n_valid = jnp.sum(inp.mask).astype(jnp.int32)
        ar = jnp.arange(pp.n_ds, dtype=jnp.int32)
        idx = jnp.where(
            n_valid >= pp.n_ds, (ar * n_valid) // pp.n_ds, ar
        )
        ds = downsample.Downsampled(
            pts=desk[idx], mask=ar < jnp.minimum(n_valid, pp.n_ds),
            n_voxels=jnp.minimum(n_valid, pp.n_ds), aux=None,
        )
        var_l = noise.body_var(ds.pts, pp.dept_err, pp.beam_err)
    elif pp.pvec_downsample:
        # down_sampling_pvec parity path: per-RAW-point noise model,
        # then joint (point, var) voxel average (voxel_map.hpp:24-65)
        var_raw = noise.body_var(desk, pp.dept_err, pp.beam_err)

        def dsp(size):
            return downsample.voxel_average_pvec(
                desk, var_raw, inp.mask, size, pp.n_ds
            )

        ds, var_l = dsp(pp.down_size)
        n_found = jnp.sum(ds.mask)
        ds, var_l = jax.lax.cond(
            n_found < pp.min_ds_points,
            lambda _: dsp(pp.down_size / 2),
            lambda _: (ds, var_l),
            None,
        )
    else:
        ds = downsample.voxel_average(desk, inp.mask, pp.down_size,
                                      pp.n_ds)
        # adaptive fallback: halve the leaf if too few points
        # (1577-1581)
        n_found = jnp.sum(ds.mask)

        def finer(_):
            return downsample.voxel_average(
                desk, inp.mask, pp.down_size / 2, pp.n_ds
            )

        ds = jax.lax.cond(
            n_found < pp.min_ds_points, finer, lambda _: ds, None
        )
        var_l = noise.body_var(ds.pts, pp.dept_err, pp.beam_err)
    pts_b, var_b = noise.to_body_frame(ds.pts, var_l, ext_R, ext_t)

    x_prior = x_prop._replace(cov=x_prop.cov * prior_deweight)
    res = esikf.update(
        x_prior, carry.vmap, pts_b, var_b, ds.mask, pp.map_params,
        num_iter=pp.num_esikf_iter, degen_thresh=pp.degen_thresh,
        num_match=pp.num_esikf_match,
    )
    x_post = res.x

    var_w = noise.world_var(pts_b, var_b, x_post)

    # preintegration for the (prev scan, this scan) factor, using the
    # previous scan's posterior biases (voxelslam.cpp:1604-1605)
    nm = jnp.zeros((6, 6), pts_b.dtype)
    nm = nm.at[0:3, 0:3].set(jnp.diag(imu_noise.cov_gyr))
    nm = nm.at[3:6, 3:6].set(jnp.diag(imu_noise.cov_acc))
    nw = jnp.zeros((6, 6), pts_b.dtype)
    nw = nw.at[0:3, 0:3].set(jnp.diag(imu_noise.cov_bias_gyr))
    nw = nw.at[3:6, 3:6].set(jnp.diag(imu_noise.cov_bias_acc))
    preint = pre.integrate(
        carry.x.bg, carry.x.ba, inp.imu.dt, inp.imu.gyr, inp.imu.acc,
        inp.imu.valid, nm, nw, scale_gravity,
    )
    return x_post, pts_b, var_b, var_w, ds.mask, res, preint


def _scatter_recut(vmap: VoxelMap, win: WindowState, jour, pp: PipelineParams):
    """FULL window rebuild + plane refit, `scatter_passes` times so
    fresh subdivisions re-route within the same call (multi_recut,
    voxelslam.cpp:1398-1453).  Used by initialization iterations, the
    post-loop map swap and the steady-state subdivision fallback; the
    per-scan hot path uses `_push_recut`."""
    vmap, scratch, overflow, slots = voxelmap.scatter(
        vmap, win.pts, win.var, win.xs.R, win.xs.p, win.mask, jour,
        pp.map_params,
    )
    vmap, n_subdiv = voxelmap.recut(vmap, scratch, pp.map_params)

    # further passes re-route points through fresh subdivisions; in
    # steady state subdivisions are rare, so they run under lax.cond
    def one_pass(args):
        vmap, scratch, overflow, slots = args
        vmap, scratch, ovf, slots = voxelmap.scatter(
            vmap, win.pts, win.var, win.xs.R, win.xs.p, win.mask, jour,
            pp.map_params,
        )
        vmap, _ = voxelmap.recut(vmap, scratch, pp.map_params)
        return vmap, scratch, overflow + ovf, slots

    for _ in range(pp.scatter_passes - 1):
        vmap, scratch, overflow, slots = jax.lax.cond(
            n_subdiv > 0, one_pass, lambda a: a,
            (vmap, scratch, overflow, slots),
        )
    return vmap, scratch, overflow, slots


def _push_recut(vmap: VoxelMap, win: WindowState, col0, rr_touch,
                rr_pending, jour, pp: PipelineParams):
    """Steady-state map update: incremental push of ONE scan, plane
    refit of the pushed scan's voxels (+ last scan's re-route
    children), then the inline subdivision re-route.

    Subdivided voxels need their resident window clusters re-routed to
    fresh children (the reference's subdivide() redistribution,
    voxel_map.hpp:1150-1194).  The re-route's expensive branch runs
    only when `rr_pending + n_subdiv > 0` (`voxelmap.
    reroute_subdivided` keeps the cond operands small, so the
    common no-subdivision scan pays ~nothing).

    Returns (vmap', win', add_n, overflow, n_subdiv, rr_touch',
    rr_pending')."""
    W = pp.win_size
    wl = W - 1  # logical slot of the fresh scan
    col = (col0 + wl) % W  # its physical ring column
    pts = win.pts[wl]
    var = win.var[wl]
    mask = win.mask[wl]
    R = win.xs.R[wl]
    p = win.xs.p[wl]
    vmap, overflow, touched, slot_new = voxelmap.push_scan(
        vmap, pts, var, R, p, mask, col, jour, pp.map_params
    )
    win = win._replace(
        slot=jax.lax.dynamic_update_index_in_dim(win.slot, slot_new, wl, 0)
    )
    # poses permuted to PHYSICAL column order: physical column c holds
    # logical slot (c - col0) % W
    perm = (jnp.arange(W, dtype=jnp.int32) - col0) % W
    vmap, n_subdiv, add_n = voxelmap.recut_touched(
        vmap, win.xs.R[perm], win.xs.p[perm], touched | rr_touch,
        pp.map_params,
        size=min(pp.refit_size, pp.n_ds, pp.map_params.max_active),
    )
    # inline re-route of points whose voxel just subdivided
    col_of_w = (col0 + jnp.arange(W, dtype=jnp.int32)) % W
    vmap, slot_pt, child_touch, n_left = voxelmap.reroute_subdivided(
        vmap, win.pts, win.mask, win.slot, win.xs.R, win.xs.p,
        col_of_w, jour, pp.map_params, pp.max_reroute,
        pending=rr_pending + n_subdiv,
    )
    win = win._replace(slot=slot_pt)
    return (vmap, win, add_n, overflow, n_subdiv, child_touch,
            n_left.astype(jnp.int32))


@partial(jax.jit, static_argnames=("pp",))
def rebuild_map(carry: Carry, pp: PipelineParams) -> Carry:
    """Full window rebuild + plane refit as its own (host-dispatched)
    device program — the fallback re-route path (init transition,
    legacy valve; steady subdivisions drain inline in _push_recut).
    Rebuilds write the map's window columns in logical order, so the
    ring pointer resets."""
    vmap, _, _, slots = _scatter_recut(carry.vmap, carry.win, carry.jour, pp)
    return carry._replace(
        vmap=vmap, col0=jnp.zeros((), jnp.int32),
        win=carry.win._replace(slot=slots),
        rr_touch=jnp.zeros_like(carry.rr_touch),
        rr_pending=jnp.zeros((), jnp.int32),
    )


def _push_window(win: WindowState, idx, pts_b, var_w, mask, x_post, preint):
    """Write scan data into window slot `idx` (dynamic)."""
    win = win._replace(
        pts=jax.lax.dynamic_update_index_in_dim(win.pts, pts_b, idx, 0),
        var=jax.lax.dynamic_update_index_in_dim(win.var, var_w, idx, 0),
        mask=jax.lax.dynamic_update_index_in_dim(win.mask, mask, idx, 0),
        xs=jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_index_in_dim(buf, v, idx, 0),
            win.xs, x_post,
        ),
        pres=jax.tree.map(
            lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                buf, v, jnp.maximum(idx - 1, 0), 0
            ),
            win.pres, preint,
        ),
    )
    return win


def _slide_window(win: WindowState) -> WindowState:
    """Drop the oldest scan (mgsize=1 slide, voxelslam.cpp:1689-1712):
    roll every buffer left by one; the last slot is re-filled by the
    next push."""
    roll = lambda a: jnp.roll(a, -1, axis=0)
    win = win._replace(
        pts=roll(win.pts),
        var=roll(win.var),
        mask=win.mask.at[:-1].set(win.mask[1:]).at[-1].set(False),
        xs=jax.tree.map(roll, win.xs),
        pres=jax.tree.map(roll, win.pres),
        slot=roll(win.slot),
    )
    return win


# ------------------------------------------------------------------- steps

@partial(jax.jit, static_argnames=("pp",))
def fill_step(carry: Carry, inp: ScanInputs, pp: PipelineParams,
              imu_noise: prop.ImuNoise, ext_R, ext_t, scale_gravity):
    """Startup scan: front-end + push + map update, no BA/margi/slide
    (initialization accumulation, voxelslam.cpp:1230-1288)."""
    # deweighted prior during startup (the reference's kdtree-phase
    # ESIKF divides the prior information by 1000, voxelslam.cpp:1056)
    x_post, pts_b, var_b, var_w, mask, res, preint = _front_end(
        carry, inp, pp, imu_noise, ext_R, ext_t, scale_gravity,
        prior_deweight=pp.fill_prior_deweight,
    )
    # Reset the posterior covariance to the fresh odometry prior EVERY
    # fill scan: the deweighted update leaves ~dw×P in the directions
    # LiDAR cannot observe, so carrying it compounds dw^n over the
    # fill (measured: 1000^10 → pose cov ~1e30, world_var/cov_add
    # ~1e21, plane covariances meaningless, and f32 conditioning so
    # bad that ulp-level reorderings measurably moved the trajectory).
    # Each fill scan still runs measurement-driven (the deweight
    # applies to the constant fresh prior), matching the reference's
    # intent without the explosion.
    x_post = x_post._replace(cov=state.identity(pts_b.dtype).cov)
    # world covariances re-derived under the reset state cov so the
    # map's moment noise (cov_add -> plane covariance) stays
    # well-conditioned from the first fill scan
    var_w = noise.world_var(pts_b, var_b, x_post)
    win = _push_window(carry.win, carry.win_count, pts_b, var_w, mask,
                       x_post, preint)
    # full window rebuild every fill scan (the map structure is still
    # forming; this path runs win_size times per session, not hot)
    vmap, scratch, ovf, slots = _scatter_recut(carry.vmap, win, carry.jour, pp)
    win = win._replace(slot=slots)
    carry = carry._replace(
        x=x_post, vmap=vmap, win=win, win_count=carry.win_count + 1
    )
    nocov = jnp.zeros((1, 1), x_post.p.dtype)
    out = StepOutputs(
        x=x_post._replace(cov=nocov), degenerate=res.degenerate,
        match_count=res.match_count,
        n_factors=jnp.zeros((), jnp.int32), ba_resid=jnp.zeros(()),
        scan_pose=x_post._replace(cov=nocov), scan_v6=jnp.zeros((6,)),
        scan_pts=jnp.zeros(pts_b.shape, jnp.int16),
        scan_mask=jnp.zeros_like(mask),
        overflow=ovf, n_subdiv=jnp.zeros((), jnp.int32),
        jour=carry.jour,
        n_occupied=jnp.sum(vmap.keys[:, 3] >= 0),
    )
    return carry, out


@partial(jax.jit, static_argnames=("pp",))
def steady_step(carry: Carry, inp: ScanInputs, pp: PipelineParams,
                imu_noise: prop.ImuNoise, ext_R, ext_t, scale_gravity):
    """Full per-scan hot path (steady state, window full).

    Gravity refreshes are NOT a flag here: a `with_gravity` static on
    the steady program would re-run gravity BA for a whole batch and
    carry a second compile variant — the one-shot `gravity_refresh`
    program below matches the reference's episodic g_update
    (voxelslam.cpp:1138-1156) instead."""
    W = pp.win_size
    x_post, pts_b, var_b, var_w, mask, res, preint = _front_end(
        carry, inp, pp, imu_noise, ext_R, ext_t, scale_gravity
    )
    win = _push_window(carry.win, jnp.int32(W - 1), pts_b, var_w, mask,
                       x_post, preint)
    vmap, win, add_n, ovf, n_sub, rr_touch, rr_pending = _push_recut(
        carry.vmap, win, carry.col0, carry.rr_touch, carry.rr_pending,
        carry.jour, pp
    )

    # ---- local BA over the window ----
    perm_l2p = (carry.col0 + jnp.arange(W, dtype=jnp.int32)) % W
    factors = lf.harvest(
        vmap, add_n, pp.map_params, pp.max_ba_voxels, col_perm=perm_l2p
    )
    ba = opt.li_ba(
        win.xs, factors, win.pres, imu_coef=pp.imu_coef,
        max_iter=pp.ba_max_iter,
    )
    win = win._replace(xs=ba.xs)

    # ---- export ScanPose of the marginalized scan + its edge noise ----
    x0 = state.index(win.xs, 0)
    v6 = ba.hess[0:6, DIM : DIM + 6].diagonal()
    v6 = 1.0 / jnp.maximum(jnp.abs(v6), 1e-12)
    scan_pts0 = win.pts[0]
    scan_mask0 = win.mask[0]

    # ---- marginalize oldest scan into fixed history ----
    # fold the RESIDENT oldest-column clusters (their Bf_var entered
    # cov_add at push time), exactly the reference's per-voxel margi.
    # Compaction bound covers the scan's original rows + stale
    # subdivided parents + rerouted child rows across both extra
    # levels (~3 rows/point worst case) — undersizing silently drops
    # live child clusters from fixed history after subdivision bursts.
    # clear_col=True retires the ring column via the same compacted
    # row set (replaces the full-win-table clear_window_col pass).
    vmap = voxelmap.marginalize_column(
        vmap, x0.R, x0.p, carry.col0, pp.map_params,
        size=min(3 * pp.n_ds, pp.map_params.max_active),
        clear_col=True,
    )

    # ---- slide (window arrays roll; map columns advance the ring) ----
    win = _slide_window(win)
    col0 = (carry.col0 + 1) % W

    # x_curr adopts the BA-refined latest pose (voxelslam.cpp:1663-1664)
    x_last = state.index(win.xs, W - 2)  # last valid after slide
    x_new = x_post._replace(R=x_last.R, p=x_last.p, g=x_last.g)

    # travel bookkeeping (voxelslam.cpp:1672-1681)
    spat = jnp.linalg.norm(x_new.p - carry.last_pos)
    move = spat > 0.5
    jour = jnp.where(move, carry.jour + spat, carry.jour)
    last_pos = jnp.where(move, x_new.p, carry.last_pos)

    carry = carry._replace(
        x=x_new, vmap=vmap, win=win, jour=jour, last_pos=last_pos,
        col0=col0, rr_touch=rr_touch, rr_pending=rr_pending,
    )
    # output slimming for the tunneled host link: keyframe points
    # quantized to 1 cm int16 (body-frame range << 327 m), state covs
    # dropped (no host consumer) — roughly halves the per-batch
    # device->host transfer
    nocov = jnp.zeros((1, 1), x_new.p.dtype)
    pts_q = jnp.clip(
        jnp.round(scan_pts0 * 100.0), -32767.0, 32767.0
    ).astype(jnp.int16)
    out = StepOutputs(
        x=x_new._replace(cov=nocov), degenerate=res.degenerate,
        match_count=res.match_count,
        n_factors=jnp.sum(factors.valid), ba_resid=ba.resid1,
        scan_pose=x0._replace(cov=nocov), scan_v6=v6, scan_pts=pts_q,
        scan_mask=scan_mask0,
        overflow=ovf, n_subdiv=n_sub, jour=jour,
        n_occupied=jnp.sum(vmap.keys[:, 3] >= 0),
    )
    return carry, out


# -------------------------------------------------------- initialization

def _redeskew_window(win: WindowState, init_flat, pp: PipelineParams,
                     imu_noise, ext_R, ext_t, scale_gravity):
    """Re-deskew every stashed raw fill scan from the REFINED window
    states and biases (Initialization::motion_blur,
    voxelslam.cpp:488-561): within-scan poses are integrated BACKWARD
    from the refined scan-end state — anchored at the best current
    estimate of pose, velocity AND biases, exactly the reference's
    backward-from-scan-end pass (critical on violent starts, where the
    previous scan's state is a poor forward anchor); the window point/
    variance buffers and preintegration factors are rebuilt."""
    W = pp.win_size

    def one(win, w):
        inp = unpack_scan_flat(init_flat[w], pp)
        x_prev = jax.tree.map(
            lambda a: a[jnp.maximum(w - 1, 0)], win.xs
        )
        x_w = jax.tree.map(lambda a: a[w], win.xs)
        poses = prop.propagate_backward(
            x_w, inp.imu, inp.dt_ext, scale_gravity
        )
        desk = prop.deskew(inp.pts, inp.offsets, inp.mask, poses, x_w,
                           ext_R, ext_t)
        ds = downsample.voxel_average(desk, inp.mask, pp.down_size, pp.n_ds)
        var_l = noise.body_var(ds.pts, pp.dept_err, pp.beam_err)
        pts_b, var_b = noise.to_body_frame(ds.pts, var_l, ext_R, ext_t)
        var_w = noise.world_var(pts_b, var_b, x_w)
        # rebuild the preintegration factor with the refined biases
        # (voxelslam.cpp:643-647)
        nm = jnp.zeros((6, 6), pts_b.dtype)
        nm = nm.at[0:3, 0:3].set(jnp.diag(imu_noise.cov_gyr))
        nm = nm.at[3:6, 3:6].set(jnp.diag(imu_noise.cov_acc))
        nw = jnp.zeros((6, 6), pts_b.dtype)
        nw = nw.at[0:3, 0:3].set(jnp.diag(imu_noise.cov_bias_gyr))
        nw = nw.at[3:6, 3:6].set(jnp.diag(imu_noise.cov_bias_acc))
        preint = pre.integrate(
            x_prev.bg, x_prev.ba, inp.imu.dt, inp.imu.gyr, inp.imu.acc,
            inp.imu.valid, nm, nw, scale_gravity,
        )
        win = win._replace(
            pts=jax.lax.dynamic_update_index_in_dim(win.pts, pts_b, w, 0),
            var=jax.lax.dynamic_update_index_in_dim(win.var, var_w, w, 0),
            mask=jax.lax.dynamic_update_index_in_dim(win.mask, ds.mask, w, 0),
            pres=jax.tree.map(
                lambda buf, v: jax.lax.dynamic_update_index_in_dim(
                    buf, v, jnp.maximum(w - 1, 0), 0
                ),
                win.pres, preint,
            ),
        )
        return win, None

    win, _ = jax.lax.scan(one, win, jnp.arange(W, dtype=jnp.int32))
    return win


@partial(jax.jit, static_argnames=("pp", "n_iter"))
def init_refine(carry: Carry, pp: PipelineParams,
                imu_noise: prop.ImuNoise, ext_R, ext_t, scale_gravity,
                n_iter: int = 3):
    """Dynamic initialization over the filled window: iterate
    (re-deskew from refined states → rebuild map → harvest →
    gravity-refining BA) then align the world frame with gravity
    (motion_init + align_gravity, voxelslam.cpp:461-486, 563-713).

    Returns (carry', g_norm, min_normal_span) — the host checks
    9.6 < ‖g‖ < 10.0 and the plane-span degeneracy bound
    (voxelslam.cpp:651-677) and resets the session on failure.
    """
    win = carry.win

    g_norm0 = jnp.linalg.norm(win.xs.g[0])

    def one_iter(it, win):
        # re-deskew from the latest state estimates (skip on the first
        # pass — the fill-phase deskew already used them)
        win = jax.lax.cond(
            it > 0,
            lambda w: _redeskew_window(
                w, carry.init_flat, pp, imu_noise, ext_R, ext_t,
                scale_gravity,
            ),
            lambda w: w,
            win,
        )
        vmap = voxelmap.empty(pp.map_params, pp.win_size)
        vmap, scratch, _, _ = _scatter_recut(vmap, win, jnp.zeros(()), pp)
        factors = lf.harvest(vmap, scratch, pp.map_params, pp.max_ba_voxels)
        ba = opt.li_ba(
            win.xs, factors, win.pres, imu_coef=pp.imu_coef,
            max_iter=3, with_gravity=True, g_norm_prior=g_norm0,
        )
        return win._replace(xs=ba.xs)

    win = jax.lax.fori_loop(0, n_iter, one_iter, win)

    # ---- align gravity with -z, anchored at p0 ----
    xs = win.xs
    g = xs.g[0]
    g_norm = jnp.linalg.norm(g)
    a = g / jnp.maximum(g_norm, 1e-12)
    b = jnp.array([0.0, 0.0, -1.0], g.dtype)
    axis = jnp.cross(a, b)
    s = jnp.linalg.norm(axis)
    ang = jnp.arctan2(s, jnp.dot(a, b))
    rotvec = jnp.where(
        s > 1e-8, axis / jnp.maximum(s, 1e-12) * ang, jnp.zeros(3, g.dtype)
    )
    G = so3.exp(rotvec)
    p0 = xs.p[0]
    xs = xs._replace(
        R=jnp.einsum("ij,wjk->wik", G, xs.R),
        p=jnp.einsum("ij,wj->wi", G, xs.p - p0) + p0,
        v=jnp.einsum("ij,wj->wi", G, xs.v),
        g=jnp.broadcast_to(G @ g, xs.g.shape),
    )
    win = win._replace(xs=xs)

    # rebuild the map once more under the aligned states
    vmap = voxelmap.empty(pp.map_params, pp.win_size)
    vmap, scratch, _, slots = _scatter_recut(vmap, win, jnp.zeros(()), pp)
    win = win._replace(slot=slots)

    # plane-span degeneracy metric: min eig of Σ n nᵀ over plane voxels
    nn = jnp.einsum(
        "c,ci,cj->ij", vmap.plane_valid.astype(xs.p.dtype),
        vmap.plane_n, vmap.plane_n,
    )
    from ..ops import eigh3 as _e3

    span = _e3.eigvals3(nn)[0]

    # Reset the state covariance to the fresh odometry prior: every
    # fill-phase update ran with a x1000-deweighted prior whose
    # posterior cov compounds (x1000 per scan) — carrying it into
    # steady state makes the ESIKF prior free and the first update
    # dumps pose error into the (lidar-unobservable) bias dims.
    x = carry.x._replace(
        R=xs.R[-1], p=xs.p[-1], v=xs.v[-1], bg=xs.bg[-1], ba=xs.ba[-1],
        g=xs.g[-1], cov=state.identity(xs.p.dtype).cov,
    )

    # the reference runs the window BA + marginalize + slide in the
    # same iteration motion_init succeeds (voxelslam.cpp:1637-1712);
    # without it the first steady push would double-fill column W-1
    x0 = state.index(win.xs, 0)
    vmap = voxelmap.marginalize_column(
        vmap, x0.R, x0.p, jnp.int32(0), pp.map_params
    )
    vmap = voxelmap.slide_window_cols(vmap)
    win = _slide_window(win)

    carry = carry._replace(x=x, vmap=vmap, win=win)
    return carry, g_norm, span


# ------------------------------------------------------- loop correction

@partial(jax.jit, static_argnames=("pp",))
def apply_loop_correction(
    carry: Carry,
    dx_R: jnp.ndarray,  # (3, 3) rigid correction from the PGO
    dx_p: jnp.ndarray,  # (3,)
    kf_pts: jnp.ndarray,  # (K, P, 3) recent keyframe clouds (local)
    kf_mask: jnp.ndarray,  # (K, P)
    kf_R: jnp.ndarray,  # (K, 3, 3) keyframe base poses (post-PGO)
    kf_p: jnp.ndarray,  # (K, 3)
    pp: PipelineParams,
):
    """Post-PGO map swap (reference loop_update, voxelslam.cpp:1101-1186):
    transform the window states and current state by the rigid
    correction dx (incl. velocity), rebuild the voxel map from the
    recent keyframes as fixed history, and rescatter the window."""
    dtype = carry.x.p.dtype

    def corr(x: NavState) -> NavState:
        return x._replace(
            R=dx_R @ x.R,
            p=jnp.einsum("ij,...j->...i", dx_R, x.p) + dx_p,
            v=jnp.einsum("ij,...j->...i", dx_R, x.v),
            g=jnp.einsum("ij,...j->...i", dx_R, x.g),
        )

    def corr_batch(xs: NavState) -> NavState:
        return xs._replace(
            R=jnp.einsum("ij,wjk->wik", dx_R, xs.R),
            p=jnp.einsum("ij,wj->wi", dx_R, xs.p) + dx_p,
            v=jnp.einsum("ij,wj->wi", dx_R, xs.v),
            g=jnp.einsum("ij,wj->wi", dx_R, xs.g),
        )

    x = corr(carry.x)
    win = carry.win._replace(xs=corr_batch(carry.win.xs))

    # fresh map; keyframe clouds enter as fixed history
    vmap = voxelmap.empty(pp.map_params, pp.win_size, dtype)
    K, P, _ = kf_pts.shape
    var_nom = jnp.broadcast_to(jnp.eye(3, dtype=dtype) * 1e-4, (P, 3, 3))
    for k in range(K):
        vmap = voxelmap.marginalize(
            vmap, kf_pts[k], var_nom, kf_R[k], kf_p[k], kf_mask[k],
            pp.map_params,
        )
    # refit planes over fixed-only voxels
    vmap = _recut_fixed(vmap, None, pp)

    # rescatter the corrected window (logical column order)
    vmap, scratch, _, slots = _scatter_recut(vmap, win, carry.jour, pp)
    win = win._replace(slot=slots)
    return carry._replace(
        x=x, vmap=vmap, win=win, col0=jnp.zeros((), jnp.int32),
        rr_touch=jnp.zeros_like(carry.rr_touch),
        rr_pending=jnp.zeros((), jnp.int32),
    )


def _recut_fixed(vmap: VoxelMap, scratch, pp: PipelineParams) -> VoxelMap:
    """Plane refit over fixed-only voxels (recut requires window
    points by default; loaded keyframe maps have none)."""
    from ..core import cluster as _cl
    from ..ops import eigh3 as _e3

    params = pp.map_params
    occupied = vmap.keys[:, 3] >= 0
    level = jnp.clip(vmap.keys[:, 3], 0)
    leaf = occupied & (vmap.state == 0)
    c = _cl.Cluster(vmap.fix_P, vmap.fix_v, vmap.fix_n)
    S = _cl.cov(c)
    w, V = _e3.eigh3(S)
    dtype = vmap.fix_P.dtype
    min_point = jnp.asarray(params.min_point, dtype)[level]
    thre = jnp.asarray(params.plane_thre_inv, dtype)[level]
    lam0 = w[..., 0]
    lam2 = jnp.maximum(w[..., 2], 1e-12)
    is_plane = (lam0 < params.min_eigen_value) & (lam0 / lam2 < thre)
    active = leaf & (vmap.fix_n > min_point)
    plane_ok = active & is_plane
    u0, center, pvar, radius = voxelmap._plane_params(
        vmap.fix_P, vmap.fix_v, vmap.fix_n, vmap.cov_add, w, V
    )
    sel = plane_ok[:, None]
    C = vmap.meta.shape[0]
    from ..map.voxelmap import MT_EIG, MT_PC, MT_PN, MT_RAD, MT_VALID, MT_VAR

    meta = vmap.meta
    meta = meta.at[:, MT_PN].set(jnp.where(sel, u0, meta[:, MT_PN]))
    meta = meta.at[:, MT_PC].set(jnp.where(sel, center, meta[:, MT_PC]))
    meta = meta.at[:, MT_VAR].set(
        jnp.where(sel, pvar.reshape(C, 36), meta[:, MT_VAR])
    )
    meta = meta.at[:, MT_RAD].set(
        jnp.where(plane_ok, radius, meta[:, MT_RAD])
    )
    meta = meta.at[:, MT_EIG].set(
        jnp.where(active[:, None], w, meta[:, MT_EIG])
    )
    meta = meta.at[:, MT_VALID].set(
        jnp.where(active, is_plane, meta[:, MT_VALID] > 0.5).astype(
            meta.dtype
        )
    )
    return vmap._replace(meta=meta)


@partial(jax.jit, static_argnames=("pp",))
def insert_fixed_keyframe(
    carry: Carry,
    pts: jnp.ndarray,  # (P, 3) keyframe cloud, local frame
    mask: jnp.ndarray,  # (P,)
    R0: jnp.ndarray,
    p0: jnp.ndarray,
    pp: PipelineParams,
):
    """Mid-term association: fold one historical keyframe into the map
    as fixed history + refit its planes (keyframe_loading,
    voxelslam.cpp:1189-1228)."""
    dtype = pts.dtype
    P = pts.shape[0]
    var = jnp.broadcast_to(jnp.eye(3, dtype=dtype) * 1e-4, (P, 3, 3))
    vmap = voxelmap.marginalize(
        carry.vmap, pts, var, R0, p0, mask, pp.map_params
    )
    vmap = _recut_fixed(vmap, None, pp)
    return carry._replace(vmap=vmap)


# ----------------------------------------------------- flat input packing

def flat_len(pp: PipelineParams) -> int:
    """Length of the single f32 host->device transfer per scan."""
    return pp.n_raw * 4 + pp.n_imu * 8 + 4


def pack_scan_flat(pts, offsets, n_valid, imu_dt, imu_gyr, imu_acc,
                   imu_offt, n_imu_valid, dt_ext, t_end,
                   pp: PipelineParams):
    """Host-side: pack one scan into a single f32 vector (numpy) —
    one RPC to the device instead of ~10 small transfers."""
    import numpy as np

    out = np.zeros(flat_len(pp), np.float32)
    o = 0
    nr, ni = pp.n_raw, pp.n_imu
    out[o : o + nr * 3] = np.asarray(pts, np.float32).reshape(-1)
    o += nr * 3
    out[o : o + nr] = np.asarray(offsets, np.float32)
    o += nr
    out[o : o + ni] = np.asarray(imu_dt, np.float32)
    o += ni
    out[o : o + ni * 3] = np.asarray(imu_gyr, np.float32).reshape(-1)
    o += ni * 3
    out[o : o + ni * 3] = np.asarray(imu_acc, np.float32).reshape(-1)
    o += ni * 3
    out[o : o + ni] = np.asarray(imu_offt, np.float32)
    o += ni
    out[o] = float(n_valid)
    out[o + 1] = float(n_imu_valid)
    out[o + 2] = float(dt_ext)
    out[o + 3] = float(t_end)
    return out


def unpack_scan_flat(flat: jnp.ndarray, pp: PipelineParams) -> ScanInputs:
    """Device-side unpack (runs inside the jitted step)."""
    nr, ni = pp.n_raw, pp.n_imu
    o = 0
    pts = flat[o : o + nr * 3].reshape(nr, 3)
    o += nr * 3
    offsets = flat[o : o + nr]
    o += nr
    dt = flat[o : o + ni]
    o += ni
    gyr = flat[o : o + ni * 3].reshape(ni, 3)
    o += ni * 3
    acc = flat[o : o + ni * 3].reshape(ni, 3)
    o += ni * 3
    offt = flat[o : o + ni]
    o += ni
    n_valid = flat[o].astype(jnp.int32)
    n_imu = flat[o + 1].astype(jnp.int32)
    dt_ext = flat[o + 2]
    t_end = flat[o + 3]
    ar = jnp.arange(nr, dtype=jnp.int32)
    ai = jnp.arange(ni, dtype=jnp.int32)
    imu_valid = ai < n_imu
    return ScanInputs(
        pts=pts,
        offsets=offsets,
        mask=ar < n_valid,
        imu=prop.ImuBatch(
            dt=dt, gyr=gyr, acc=acc,
            offt=jnp.where(imu_valid, offt, jnp.inf),
            valid=imu_valid,
        ),
        dt_ext=dt_ext,
        t_end=t_end,
    )


@partial(jax.jit, static_argnames=("pp",))
def fill_step_flat(carry, flat, pp, imu_noise, ext_R, ext_t, scale_gravity):
    idx = jnp.clip(carry.win_count, 0, pp.win_size - 1)
    carry = carry._replace(
        init_flat=jax.lax.dynamic_update_index_in_dim(
            carry.init_flat, flat, idx, 0
        )
    )
    return fill_step(carry, unpack_scan_flat(flat, pp), pp, imu_noise,
                     ext_R, ext_t, scale_gravity)


@partial(jax.jit, static_argnames=("pp",))
def steady_step_flat(carry, flat, pp, imu_noise, ext_R, ext_t,
                     scale_gravity):
    return steady_step(carry, unpack_scan_flat(flat, pp), pp, imu_noise,
                       ext_R, ext_t, scale_gravity)


@partial(jax.jit, static_argnames=("pp",))
def steady_step_batch(carry, flats, pp, imu_noise, ext_R, ext_t,
                      scale_gravity):
    """Process B scans in ONE device program (lax.scan over the steady
    step).  Amortizes per-call dispatch/transfer overhead — the TPU
    analogue of the reference's pipeline-thread latency hiding; adds
    B-1 scans of output latency.  flats: (B, FLAT)."""

    def body(c, flat):
        c, out = steady_step(
            c, unpack_scan_flat(flat, pp), pp, imu_noise, ext_R, ext_t,
            scale_gravity
        )
        return c, out

    carry, outs = jax.lax.scan(body, carry, flats)
    return carry, outs


@partial(jax.jit, static_argnames=("pp",))
def gravity_refresh(carry: Carry, pp: PipelineParams,
                    imu_noise: prop.ImuNoise) -> Carry:
    """One-shot gravity-refining window BA between scans — the
    reference's episodic g_update after a cross-session merge
    (voxelslam.cpp:1138-1156): re-run the window BA once with the
    shared-gravity variant over the currently valid window states
    (slots 0..W-2 after the slide; slot W-1 refills on the next push)
    and adopt the refined states + gravity.  Costs ONE extra compiled
    program on the rare merge event instead of a batch-wide
    `with_gravity` recompile running 16 gravity BAs."""
    W = pp.win_size
    Wv = W - 1  # valid logical slots after the slide
    perm = (carry.col0 + jnp.arange(Wv, dtype=jnp.int32)) % W
    add_n = jnp.sum(carry.vmap.win[:, :, voxelmap.CL_N], axis=1)
    factors = lf.harvest(
        carry.vmap, add_n, pp.map_params, pp.max_ba_voxels, col_perm=perm
    )
    xs_v = jax.tree.map(lambda a: a[:Wv], carry.win.xs)
    pres_v = jax.tree.map(lambda a: a[: Wv - 1], carry.win.pres)
    ba = opt.li_ba(
        xs_v, factors, pres_v, imu_coef=pp.imu_coef,
        max_iter=pp.ba_max_iter, with_gravity=True,
    )
    xs = jax.tree.map(
        lambda full, v: jax.lax.dynamic_update_slice_in_dim(full, v, 0, 0),
        carry.win.xs, ba.xs,
    )
    x_last = state.index(ba.xs, Wv - 1)
    x = carry.x._replace(
        R=x_last.R, p=x_last.p, g=x_last.g,
    )
    return carry._replace(x=x, win=carry.win._replace(xs=xs))
