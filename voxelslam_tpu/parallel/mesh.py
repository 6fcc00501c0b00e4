"""Multi-chip sharding for the scan pipeline.

The reference's parallelism is CPU fork-join pools + 3 pipeline
threads (SURVEY.md §2.14); its TPU-native equivalent on one chip is
simply batched XLA ops.  For scale-out past one chip, the natural
SPMD decomposition of the scan step is *data parallelism over
points*: raw/window point arrays shard along their point dimension
over a 1-D `Mesh`, the voxel map replicates, and the two global
reductions — the ESIKF normal equations (6×6) and the BA Hessian
(W·15)² — become `psum`s over ICI inserted by XLA from the sharding
annotations.

`shard_step` wraps any jitted scan-step callable with in/out
shardings; `dryrun` (used by __graft_entry__.dryrun_multichip) builds
a tiny pipeline on an n-device mesh and executes one step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), ("data",))


def scan_input_shardings(mesh: Mesh):
    """Shardings for pipeline.ScanInputs: points sharded, rest replicated."""
    from ..odom import pipeline as pl
    from ..imu.propagation import ImuBatch

    rep = NamedSharding(mesh, P())
    pts = NamedSharding(mesh, P("data"))
    return pl.ScanInputs(
        pts=NamedSharding(mesh, P("data", None)),
        offsets=pts,
        mask=pts,
        imu=ImuBatch(rep, rep, rep, rep, rep),
        dt_ext=rep,
        t_end=rep,
    )


def carry_shardings(mesh: Mesh):
    """Carry: window point arrays shard along the point dim; the map
    and states replicate."""
    from ..odom import pipeline as pl

    rep = NamedSharding(mesh, P())

    def rep_tree(tree):
        return jax.tree.map(lambda _: rep, tree)

    def build(carry):
        win = carry.win._replace(
            pts=NamedSharding(mesh, P(None, "data", None)),
            var=NamedSharding(mesh, P(None, "data", None, None)),
            mask=NamedSharding(mesh, P(None, "data")),
            xs=rep_tree(carry.win.xs),
            pres=rep_tree(carry.win.pres),
            slot=NamedSharding(mesh, P(None, "data")),
        )
        return carry._replace(
            x=rep_tree(carry.x),
            vmap=rep_tree(carry.vmap),
            win=win,
            win_count=rep,
            jour=rep,
            last_pos=rep,
            init_flat=rep,
            col0=rep,
            rr_touch=rep,
            rr_pending=rep,
        )

    return build


def _problem(n_devices: int, production: bool = True):
    """A steady-step problem for the dryrun.  `production=True` uses
    the bench shapes (n_ds 2048, C 2^15, W 10, V 2048 — VERDICT #7);
    False keeps the tiny round-1 problem for quick smoke tests."""
    from ..imu import propagation as prop
    from ..map.voxelmap import MapParams
    from ..odom import pipeline as pl

    if production:
        pp = pl.PipelineParams(
            map_params=MapParams(capacity=1 << 15, max_probe=16,
                                 voxel_size=1.0),
            win_size=10,
            n_raw=8192,
            n_ds=2048,
            n_imu=32,
            max_ba_voxels=2048,
            scatter_passes=1,
            ba_max_iter=2,
        )
    else:
        pp = pl.PipelineParams(
            map_params=MapParams(capacity=1 << 10, max_probe=8,
                                 voxel_size=1.0),
            win_size=3,
            n_raw=32 * n_devices,
            n_ds=16 * n_devices,
            n_imu=8,
            max_ba_voxels=64,
            scatter_passes=1,
            num_esikf_iter=2,
            ba_max_iter=1,
        )
    imu_noise = prop.noise_from_cfg(0.01, 0.1, 1e-4, 1e-4)
    carry = pl.make_empty_carry(pp, imu_noise)
    carry = carry._replace(win_count=jnp.int32(pp.win_size))

    rng = np.random.default_rng(0)
    K = pp.n_raw
    if production:
        # room-surface points: non-degenerate planes at scale
        walls = []
        for axis, lim in ((0, 6.0), (1, 4.5), (2, 2.0)):
            for sgn in (-1, 1):
                q = rng.uniform(-6, 6, (K // 6 + 1, 3))
                q[:, axis] = sgn * lim
                walls.append(q)
        pts = np.concatenate(walls)[:K].astype(np.float32)
    else:
        pts = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    inp = pl.ScanInputs(
        pts=jnp.asarray(pts),
        offsets=jnp.asarray(np.linspace(0, 0.1, K), jnp.float32),
        mask=jnp.ones((K,), bool),
        imu=prop.ImuBatch(
            dt=jnp.full((pp.n_imu,), 0.1 / pp.n_imu, jnp.float32),
            gyr=jnp.zeros((pp.n_imu, 3), jnp.float32),
            acc=jnp.tile(jnp.asarray([0.0, 0.0, 9.8], jnp.float32), (pp.n_imu, 1)),
            offt=jnp.asarray(np.linspace(0, 0.1, pp.n_imu), jnp.float32),
            valid=jnp.ones((pp.n_imu,), bool),
        ),
        dt_ext=jnp.zeros((), jnp.float32),
        t_end=jnp.asarray(0.1, jnp.float32),
    )
    return pp, imu_noise, carry, inp


def _flats(pp, inp, batch: int):
    """(B, FLAT) packed scan batch from the dryrun problem's point
    set: each scan re-observes the same room shifted by a small rigid
    offset (a slowly translating sensor), so the batched program
    exercises ESIKF tracking, BA, marginalization and the ring slide
    across all B iterations of its lax.scan."""
    from ..odom import pipeline as pl

    base = np.asarray(inp.pts, np.float32)
    offsets = np.asarray(inp.offsets, np.float32)
    ni = pp.n_imu
    dt = np.full((ni,), 0.1 / ni, np.float32)
    gyr = np.zeros((ni, 3), np.float32)
    acc = np.tile(np.array([0.0, 0.0, 9.8], np.float32), (ni, 1))
    offt = np.linspace(0, 0.1, ni).astype(np.float32)
    rng = np.random.default_rng(1)
    flats = []
    for b in range(batch):
        shift = np.array([0.02 * b, 0.01 * b, 0.0], np.float32)
        pts = base + shift
        pts = pts + rng.normal(0, 0.002, pts.shape).astype(np.float32)
        flats.append(
            pl.pack_scan_flat(
                pts, offsets, len(pts), dt, gyr, acc, offt, ni,
                0.0, 0.1 * (b + 1), pp,
            )
        )
    return np.stack(flats)


def dryrun(n_devices: int, check_vs_single: bool = True,
           production: bool = True) -> None:
    """Jit the PRODUCTION BATCHED steady program (`steady_step_batch`,
    the program the bench actually runs at scan_batch=16) over an
    n-device mesh with real shardings at production shapes (n_ds 2048,
    C 2^15, W 10), run one 16-scan batch, and (by default) assert the
    sharded result matches a single-device run of the same program;
    then assert the voxel-sharded window BA (`opt.li_ba(mesh=...)` —
    the production BA entry point) matches the unsharded solve on the
    same harvested factors.

    Correctness dryrun for the fork-join/psum inventory of SURVEY
    §2.14 (reference fork-join pools, voxel_map.hpp:306-335): the
    point-dim sharding turns the ESIKF normal equations and the BA
    Hessian assembly into XLA psums over the mesh; equality with the
    single-device run validates those collectives end to end —
    specifically for the lax.scan-batched program class that silently
    corrupted on TPU in round 2 (CLAUDE.md) while the per-scan program
    was fine.
    """
    from ..odom import pipeline as pl

    pp, imu_noise, carry, inp = _problem(n_devices, production)
    ext_R = jnp.eye(3, dtype=jnp.float32)
    ext_t = jnp.zeros(3, jnp.float32)

    B = 16 if production else 4
    flats = jnp.asarray(_flats(pp, inp, B))

    def step_batch(carry, flats):
        return pl.steady_step_batch(
            carry, flats, pp, imu_noise, ext_R, ext_t,
            jnp.asarray(1.0, jnp.float32),
        )

    mesh = make_mesh(n_devices)
    rep = NamedSharding(mesh, P())
    carry_shard = carry_shardings(mesh)(carry)
    with mesh:
        carry_s = jax.device_put(carry, carry_shard)
        flats_s = jax.device_put(flats, rep)
        fn = jax.jit(step_batch, in_shardings=(carry_shard, rep))
        new_carry, outs = fn(carry_s, flats_s)
        jax.block_until_ready(new_carry.x.p)
    assert np.isfinite(np.asarray(outs.x.p)).all()
    print(f"dryrun: steady_step_batch batch{B} sharded over "
          f"{n_devices} devices ok")

    if not check_vs_single:
        return
    # Single-device reference run of the same batched program.
    dev0 = jax.devices()[0]
    carry_1 = jax.device_put(carry, dev0)
    flats_1 = jax.device_put(flats, dev0)
    new_carry_1, outs_1 = jax.jit(step_batch)(carry_1, flats_1)
    # Tolerances: the sharded psums reduce in a different order than
    # the single-device sums, and the f32 difference COMPOUNDS through
    # the B=16 chained scans of the batch (measured ~4e-4 m at scan
    # 16; a single scan matches at 1e-5).  2e-3 absolute still fails
    # loudly on the round-2 corruption class this certifies against
    # (match_count 0, meter-scale positions).
    np.testing.assert_allclose(
        np.asarray(outs.x.p), np.asarray(outs_1.x.p), atol=2e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(outs.x.R), np.asarray(outs_1.x.R), atol=2e-3, rtol=0
    )
    mc, mc1 = np.asarray(outs.match_count), np.asarray(outs_1.match_count)
    assert (np.abs(mc - mc1) <= np.maximum(0.02 * mc1, 4)).all(), (
        f"match counts diverged: {mc} vs {mc1}"
    )
    np.testing.assert_allclose(
        np.asarray(new_carry.x.p), np.asarray(new_carry_1.x.p),
        atol=2e-3, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(new_carry.win.xs.p), np.asarray(new_carry_1.win.xs.p),
        atol=2e-3, rtol=0,
    )

    # second reduction: BA Hessian assembly sharded over VOXELS
    from ..lba import lidar_factor as lf

    add_n = jnp.sum(new_carry_1.vmap.win_n, axis=1)
    factors = lf.harvest(
        new_carry_1.vmap, add_n, pp.map_params, pp.max_ba_voxels
    )
    R = new_carry_1.win.xs.R
    pw = new_carry_1.win.xs.p
    _, cache = lf.evaluate_residual(factors, R, pw)
    r1, g1, h1 = lf.evaluate_hess(factors, cache, R, pw)
    r8, g8, h8 = sharded_lidar_hessian(factors, R, pw, mesh)
    np.testing.assert_allclose(float(r8), float(r1), rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h8), np.asarray(h1), rtol=1e-3, atol=1e-4
    )

    # PRODUCTION BA path: li_ba with the mesh (voxel-sharded factor
    # evaluation + ICI psum inside the LM loop) must match the
    # unsharded solve
    from ..lba import optimizer as opt

    xs = new_carry_1.win.xs
    pres = new_carry_1.win.pres
    rep = NamedSharding(mesh, P())
    with mesh:
        factors_s = jax.device_put(
            factors,
            jax.tree.map(
                lambda _: NamedSharding(mesh, P("data")), factors
            ),
        )
        xs_s = jax.device_put(xs, jax.tree.map(lambda _: rep, xs))
        pres_s = jax.device_put(pres, jax.tree.map(lambda _: rep, pres))
        ba_s = opt.li_ba(xs_s, factors_s, pres_s, max_iter=1, mesh=mesh)
        jax.block_until_ready(ba_s.xs.p)
    ba_1 = opt.li_ba(xs, factors, pres, max_iter=1)
    np.testing.assert_allclose(
        np.asarray(ba_s.xs.p), np.asarray(ba_1.xs.p),
        atol=2e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ba_s.hess), np.asarray(ba_1.hess),
        atol=1e-2, rtol=1e-3,
    )


def sharded_lidar_hessian(factors, R, p, mesh: Mesh):
    """BA Hessian assembly sharded over VOXELS: each device evaluates
    the eigen-factor gradient/Hessian of its factor shard and the
    (W·6)² Hessian reduces with a psum over ICI — the SPMD form of the
    reference's fork-join Hessian pools (voxel_map.hpp:306-335,
    465-523), and the declared scale-out design of this module's
    docstring.

    factors: lba.lidar_factor.LidarFactors with leading dim V divisible
    by the mesh size; R (W,3,3), p (W,3) replicated.
    Returns (resid, grad (W,6), hess (W,W,6,6)) equal to the
    single-device evaluation.
    """
    from ..lba import lidar_factor as lf

    # distribute operands onto the mesh (callers typically hold them
    # on one device)
    fact_specs = jax.tree.map(lambda _: P("data"), factors)
    factors = jax.device_put(
        factors, jax.tree.map(lambda s: NamedSharding(mesh, s), fact_specs)
    )
    R = jax.device_put(R, NamedSharding(mesh, P()))
    p = jax.device_put(p, NamedSharding(mesh, P()))
    assemble, _ = lf.sharded_eval(mesh)
    return assemble(factors, R, p)
