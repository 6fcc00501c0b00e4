"""Bisect the fused steady-step cost on the TPU by compiling stage-
ablated variants of the SAME fused program (micro-benchmarks of
stages as separate programs carry multi-ms dispatch overhead on the
tunneled device and mislead).

Each variant monkeypatches one stage to a no-op, compiles
steady_step_batch (B scans per program, as the bench runs), executes
warm, and reports ms/scan.  The difference vs base is that stage's
true fused cost.
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
from voxelslam_tpu.lba import lidar_factor as lf  # noqa: E402
from voxelslam_tpu.lba import optimizer as opt  # noqa: E402
from voxelslam_tpu.map import voxelmap  # noqa: E402
from voxelslam_tpu.map.voxelmap import MapParams  # noqa: E402
from voxelslam_tpu.odom import esikf, pipeline as pl  # noqa: E402
from voxelslam_tpu.ops import downsample  # noqa: E402

B = 8
# shapes overridable from argv:
#   bisect_tpu.py [n_ds] [max_ba_voxels] [log2_cap] [n_raw]
W = 10
N_DS = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
MAX_BA = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
CAP = 1 << (int(sys.argv[3]) if len(sys.argv) > 3 else 16)
N_RAW = int(sys.argv[4]) if len(sys.argv) > 4 else 8192


def make_problem():
    import os

    mp_ = MapParams(capacity=CAP, max_probe=16, voxel_size=1.0)
    ppl = pl.PipelineParams(
        map_params=mp_, win_size=W, n_raw=N_RAW, n_ds=N_DS, n_imu=64,
        max_ba_voxels=MAX_BA, ba_max_iter=2,
        fast_subsample=bool(int(os.environ.get("VS_FAST", "0"))),
    )
    rng = np.random.default_rng(0)
    imu_noise = prop.noise_from_cfg(0.01, 0.1, 1e-4, 1e-4)
    carry = pl.make_empty_carry(ppl, imu_noise)
    carry = carry._replace(win_count=jnp.int32(W))

    # realistic-ish inputs: room-surface points
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
        pts = room_pts(N_RAW)
        offs = np.linspace(0, 0.1, N_RAW)
        dt = np.full(64, 0.1 / 20, np.float32)
        gyr = np.tile(np.asarray([0.0, 0.0, 0.05]), (64, 1))
        acc = np.tile(np.asarray([0.0, 0.0, 9.8]), (64, 1))
        offt = np.linspace(0, 0.1, 64)
        flats.append(pl.pack_scan_flat(
            pts, offs, N_RAW, dt, gyr, acc, offt, 20, 0.0,
            0.1 * (b + 1), ppl,
        ))
    flats = jnp.asarray(np.stack(flats))
    return ppl, imu_noise, carry, flats


def run(name, ppl, imu_noise, carry, flats):
    eye3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    t0 = time.time()
    c1, outs = pl.steady_step_batch(carry, flats, ppl, imu_noise,
                                    eye3, z3, jnp.float32(1.0))
    jax.block_until_ready(c1.x.p)
    compile_s = time.time() - t0
    t0 = time.time()
    n = 3
    c = c1
    for _ in range(n):
        c, outs = pl.steady_step_batch(c, flats, ppl, imu_noise,
                                       eye3, z3, jnp.float32(1.0))
    jax.block_until_ready(c.x.p)
    per_scan = (time.time() - t0) / (n * B) * 1000
    print(f"{name:28s} {per_scan:7.2f} ms/scan   (compile {compile_s:.0f}s)",
          flush=True)
    return per_scan


def main():
    print("device:", jax.devices()[0], f"batch={B}", flush=True)
    ppl, imu_noise, carry, flats = make_problem()

    base = run("BASE", ppl, imu_noise, carry, flats)

    # ---- ablations (monkeypatched no-ops; recompiled fresh) ----
    import voxelslam_tpu.odom.pipeline as plmod

    saved = {}

    def ablate(name, **patches):
        for mod, attr, fn in patches.get("fns", []):
            saved[(mod, attr)] = getattr(mod, attr)
            setattr(mod, attr, fn)
        ppl2 = patches.get("ppl", ppl)
        if patches.get("fns"):
            # monkeypatched stages don't invalidate jit's in-memory
            # trace cache — force a retrace or the ablation silently
            # reruns the base program
            jax.clear_caches()
        try:
            run(name, ppl2, imu_noise, carry, flats)
        finally:
            for (mod, attr), fn in saved.items():
                setattr(mod, attr, fn)
            saved.clear()
            if patches.get("fns"):
                jax.clear_caches()

    # BA off
    ablate("no li_ba", ppl=ppl._replace(ba_max_iter=0))
    # single LM iter
    ablate("li_ba 1 iter", ppl=ppl._replace(ba_max_iter=1))
    # ESIKF 2 iters / 1 match
    ablate("esikf 2it/1match",
           ppl=ppl._replace(num_esikf_iter=2, num_esikf_match=1))

    def no_margi(vmap, R, p, col, params, size=None, clear_col=False):
        return vmap
    ablate("no marginalize_column",
           fns=[(voxelmap, "marginalize_column", no_margi)])

    def no_clear(vmap, col):
        return vmap
    ablate("no clear_window_col",
           fns=[(voxelmap, "clear_window_col", no_clear)])

    def no_recut(vmap, R, p, touch, params, size):
        return vmap, jnp.int32(0), jnp.sum(vmap.win_n, axis=1)
    ablate("no recut_touched",
           fns=[(voxelmap, "recut_touched", no_recut)])

    def no_push(vmap, pts, var, R, p, valid, col, jour, params):
        return vmap, jnp.int32(0), jnp.zeros(
            (params.capacity,), bool
        ), jnp.full((pts.shape[0],), params.capacity, jnp.int32)
    ablate("no push_scan", fns=[(voxelmap, "push_scan", no_push)])

    def no_reroute(vmap, pts, mask, slot_pt, R, p, col_of_w, jour,
                   params, max_reroute, pending):
        C = params.capacity
        return vmap, slot_pt, jnp.zeros((C,), bool), jnp.int32(0)
    ablate("no reroute", fns=[(voxelmap, "reroute_subdivided", no_reroute)])

    from voxelslam_tpu.ops import segsum as _segsum
    from voxelslam_tpu.map import hashmap as _hm

    _real_segsum = _segsum.sorted_segment_add

    def no_cov_segsum(out, idx, vals, drop_beyond=None):
        # cov_add contributions are the only 45-wide segment adds
        if vals.ndim == 2 and vals.shape[-1] == 45:
            return out
        return _real_segsum(out, idx, vals, drop_beyond)
    ablate("no cov_add accum",
           fns=[(_segsum, "sorted_segment_add", no_cov_segsum)])

    _real_insert = _hm.insert_points

    def no_insert(keys, coord, level, valid, max_probe, max_unique,
                  known_slot=None):
        # pretend every query resolved via assign (steady state: ~all do)
        s = known_slot if known_slot is not None else jnp.full(
            coord.shape[0], -1, jnp.int32)
        return keys, s, jnp.int32(0), jnp.int32(0)
    ablate("no insert_points",
           fns=[(_hm, "insert_points", no_insert)])

    def no_harvest(vmap, scratch, params, max_voxels, col_perm=None):
        z = jnp.zeros
        V = max_voxels
        Wl = W
        return lf.LidarFactors(
            valid=z((V,), bool), win_P=z((V, Wl, 6)), win_v=z((V, Wl, 3)),
            win_n=z((V, Wl)), fix_P=z((V, 6)), fix_v=z((V, 3)),
            fix_n=z((V,)), center=z((V, 3)), coe=z((V,)),
            slot=jnp.full((V,), -1, jnp.int32),
        )
    ablate("no harvest", fns=[(lf, "harvest", no_harvest)])

    def no_downsample(pts, mask, size, n_out):
        m = mask[:n_out]
        return downsample.Downsampled(pts[:n_out], m, jnp.sum(m), None)
    ablate("no downsample",
           fns=[(downsample, "voxel_average", no_downsample)])

    def no_deskew(pts, offsets, mask, poses, x_end, ext_R, ext_t):
        return pts
    ablate("no deskew", fns=[(prop, "deskew", no_deskew)])


if __name__ == "__main__":
    main()
