"""Decompose the per-keyframe device program's cost on the TPU.

The full-system bench attributes ~9 ms/scan (~90 ms per keyframe at a
1-in-10 keyframe rate) to the keyframe program's device time
(stage kf_resolve).  This times three in-process variants of the same
program so the deltas are trustworthy (cross-process tunnel timing
varies ~2x, CLAUDE.md):

  exact   — downsample + extract + search (exact top_k) + db append
  noicp   — same but stage-1 pair selection via lax.approx_max_k
            (the production default; the exact (Q, D=2^17) row sort
            was the most expensive op of the program)
  gated   — + vmapped ICP verify with the placeholder-lane gate
            (invalid candidates start converged; zero iterations when
            the search returns nothing above threshold — the common
            steady-state case)
  --full adds: dsonly (downsample only), extract (+BTC extract),
  hashds (hash-probe downsample variant), ungated (ICP without the
  placeholder gate — every lane grinds to max_iter)

All reps use same-session frame ids within skip_near_num so the
search returns NO candidates — exactly the steady-state case the
full-system bench spends ~95% of its keyframes in.

Usage: python scripts/ab_kfprog.py [reps]
"""

import pickle
import sys
import time
from functools import partial


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    sys.path.insert(0, "/root/repo")

    from voxelslam_tpu.core.config import LoopCfg
    from voxelslam_tpu.loop import btc, database, icp
    from voxelslam_tpu.ops import downsample

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    # ---- production params (mirrors slam.py VoxelSLAM + bench ring cfg)
    lc = LoopCfg(icp_eigval=3.0, curr_halt=2)
    p = btc.BtcParams()._replace(n_proj=4)
    sp_base = database.SearchParams(
        icp_threshold=lc.jud_default * 0.3,
        skip_near_num=lc.skip_near_num,
        candidate_num=lc.candidate_num,
        max_pairs_per_query=lc.max_pairs_per_query,
        max_cand_pairs=lc.max_cand_pairs,
    )
    # "exact" mode pins the stage-1 pair selection to the full sort so
    # the approx_max_k win is measured in-process
    sp = sp_base._replace(approx_topk_recall=lc.approx_topk_recall)
    sp_exact = sp_base._replace(approx_topk_recall=1.0)
    db_capacity, kf_capacity = 1 << 17, 2048
    n_icp = sp.candidate_num
    P = 16384
    kf_ds = 0.1  # voxel_size 1.0 / 10

    # ---- a realistic keyframe cloud: 10 merged ring-world scans
    d = pickle.load(open("/tmp/bench_ring_n520.pkl", "rb"))
    base = 100
    R0, p0 = d.gt_R[base], d.gt_p[base]
    pts = []
    for i in range(base, base + 10):
        pw = d.scans[i].points @ d.gt_R[i].T + d.gt_p[i]
        pts.append((pw - p0) @ R0)
    pts = np.concatenate(pts)
    raw = pts[np.linspace(0, len(pts) - 1, P).astype(int)].astype(np.float32)
    msk = np.ones(P, bool)
    log(f"keyframe cloud: {len(pts)} pts merged -> {P}")

    @partial(jax.jit, static_argnames=("mode",), donate_argnums=(0,))
    def prog(db, raw_pts, raw_mask, count, frame_id, session_id, *, mode):
        dsf = (downsample.voxel_average_hash if mode == "hashds"
               else downsample.voxel_average_sort)
        ds = dsf(raw_pts, raw_mask, kf_ds, P)
        if mode == "dsonly":
            # downsample alone (plus a cheap consumer so nothing folds)
            return db, ds.pts, ds.mask, None, None
        planes, desc = btc.extract(ds.pts, ds.mask, p)
        if mode == "extract":
            return db, planes.center, planes.valid, None, None
        cands = database.search_state(
            db, kf_capacity, desc, planes, frame_id,
            sp_exact if mode == "exact" else sp,
            query_session=session_id,
        )
        new_db = database.add_state(
            db, desc, planes, count, frame_id, session_id
        )
        if mode in ("noicp", "exact"):
            return new_db, ds.pts, ds.mask, cands, None

        def one(ci):
            f = jnp.clip(cands.frame[ci], 0)
            return icp.icp_plane(
                planes.center, planes.normal, planes.valid,
                db.kf_plane_c[f], db.kf_plane_n[f], db.kf_plane_v[f],
                cands.R[ci], cands.t[ci], icp_eigval=float(lc.icp_eigval),
                min_match_frac=float(lc.icp_min_match_frac),
                valid=(cands.frame[ci] >= 0) if mode == "gated" else None,
            )

        rs = jax.vmap(one)(jnp.arange(n_icp))
        return new_db, ds.pts, ds.mask, cands, rs

    T = p.max_triangles

    def run(mode):
        db = database.empty_state(p, db_capacity, kf_capacity)
        # warm (compile) outside the timed region
        outs = prog(db, raw, msk, np.int32(0), np.int32(0), np.int32(0),
                    mode=mode)
        db = outs[0]
        jax.device_get(outs[2] if outs[3] is None else outs[3].frame)
        t0 = time.time()
        for i in range(1, reps + 1):
            outs = prog(db, raw, msk, np.int32(i * T), np.int32(i),
                        np.int32(0), mode=mode)
            db = outs[0]
        # db chains the reps; fetch the last outputs like the manager
        if outs[3] is None:
            got = jax.device_get(outs[1:3])
            nval = -1
        else:
            got = jax.device_get(outs[1:4] if outs[4] is None
                                 else outs[1:])
            nval = int((np.asarray(got[2].frame) >= 0).sum())
        dt = (time.time() - t0) / reps * 1000.0
        log(f"[{mode:8s}] {dt:7.2f} ms/keyframe  (valid cands last rep:"
            f" {nval})")
        return dt

    import jax as _j
    log(f"device: {_j.devices()[0].platform} {_j.devices()[0].device_kind}")
    results = {}
    modes = ("exact", "noicp", "gated")
    if "--full" in sys.argv:
        modes = ("dsonly", "extract", "hashds") + modes + ("ungated",)
    # two alternating passes to expose tunnel drift
    for rnd in range(2):
        for mode in modes:
            results.setdefault(mode, []).append(run(mode))
    for mode, ts in results.items():
        log(f"{mode}: " + ", ".join(f"{t:.1f}" for t in ts)
            + f" -> mean {sum(ts)/len(ts):.2f} ms/keyframe")


if __name__ == "__main__":
    main()
