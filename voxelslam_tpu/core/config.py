"""Configuration system.

Mirrors the reference's ROS-param groups General/Odometry/LocalBA/
Loop/GBA (read in VoxelSLAM/src/voxelslam.cpp:762-833, 1812-1823,
2487-2492) as frozen dataclasses, plus a `Shapes` group that fixes the
static padded sizes every jitted program compiles against (points per
scan, IMU samples per scan, hash capacity, ...) — the TPU equivalent
of the reference's dynamically sized containers.

YAML files in the reference layout load directly (`load_yaml`), so the
six per-sensor configs (config/{avia,avia_fly,mid360,velodyne,ouster,
hesai}.yaml) carry over unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Tuple


@dataclass(frozen=True)
class GeneralCfg:
    lid_topic: str = "/livox/lidar"
    imu_topic: str = "/livox/imu"
    save_path: str = ""
    previous_map: str = ""
    bagname: str = "session0"
    lidar_type: int = 0  # LIVOX=0 VELODYNE OUSTER HESAI ROBOSENSE TARTANAIR
    blind: float = 0.5  # min range cull (meters, squared at use site)
    point_filter_num: int = 3  # keep every Nth point
    extrinsic_tran: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    extrinsic_rota: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)
    is_save_map: int = 0
    # spill marginalized scan/keyframe clouds to this directory,
    # bounding host RSS on long runs (the reference streams per-scan
    # PCDs out and frees, voxelslam.cpp:163-174); "" keeps everything
    # in RAM
    spill_dir: str = ""


@dataclass(frozen=True)
class OdometryCfg:
    cov_gyr: float = 0.1
    cov_acc: float = 1.0
    rdw_gyr: float = 1e-4
    rdw_acc: float = 1e-4
    down_size: float = 0.1  # odometry downsample leaf (m)
    dept_err: float = 0.02  # per-point range noise (m)
    beam_err: float = 0.05  # per-point bearing noise (deg)
    voxel_size: float = 1.0  # root voxel size (m)
    min_eigen_value: float = 0.0025  # plane λ0 gate
    degrade_bound: int = 10  # consecutive-degenerate-scan reset bound
    point_notime: int = 0  # 1: points carry no per-point time
    init_span_bound: float = 15.0  # init plane-normal-span degeneracy
    #   bound (voxelslam.cpp:651-658); count-scaled, lower for sparse rigs
    evict_dist: float = 700.0  # drop voxels this much travel behind
    #   (voxelslam.cpp:1509); eviction is checked every evict_dist/8 m
    pvec_downsample: int = 0  # 1: down_sampling_pvec parity (average
    #   per-point covariances jointly with the centroid,
    #   voxel_map.hpp:24-65) instead of recomputing noise at the
    #   representative point


@dataclass(frozen=True)
class LocalBACfg:
    win_size: int = 10
    max_layer: int = 2
    cov_gyr: float = 0.01
    cov_acc: float = 1.0
    rdw_gyr: float = 1e-4
    rdw_acc: float = 1e-4
    min_ba_point: int = 20
    plane_eigen_value_thre: Tuple[float, ...] = (4.0, 4.0, 4.0, 4.0)
    imu_coef: float = 1e-4
    thread_num: int = 5  # reference CPU thread pool; unused on TPU
    max_iter: int = 3  # LM iterations per window BA (fixed-count on
    #                    device; the reference early-stops instead)


@dataclass(frozen=True)
class LoopCfg:
    jud_default: float = 0.5
    icp_eigval: float = 10.0
    # min fraction of query plane cells that must be ICP fine-stage
    # inliers — rejects aliased matches (e.g. corridor-end vs
    # corridor-end) that are well-conditioned but only fit the
    # shared constellation
    icp_min_match_frac: float = 0.35
    # number of pairwise-consistent cross-session links required to
    # commit a merge (1 = reference single-link behavior; 2 = robust
    # to perceptual aliasing between similar-looking places)
    relocal_witnesses: int = 2
    # witness-mode fallback: a held first link that is never
    # contradicted commits with inflated noise after this many
    # subsequent keyframes (0 = hold forever).  Without it, a world
    # with exactly one genuine cross view (e.g. a featureless
    # corridor between rooms) strands true merges.
    witness_timeout_kfs: int = 8
    ratio_drift: float = 0.05
    curr_halt: int = 10
    prev_halt: int = 10
    acsize: int = 2
    mgsize: int = 2
    is_high_fly: int = 0
    # descriptor-search capacity knobs (padded/static on device).
    # Operating points chosen from synthetic recall sweeps (CLAUDE.md):
    # 16 pairs/query + 128 pairs/candidate keep recall flat through a
    # multi-revisit ring at ~2x the search cost of the old 8/64 caps.
    skip_near_num: int = 30
    candidate_num: int = 20  # candidate frames verified per query
    max_pairs_per_query: int = 16  # top side-distance matches kept
    max_cand_pairs: int = 128  # matched pairs evaluated per candidate
    # recall target of the stage-1 approximate top-k pair selection
    # (1.0 = exact sort; see database.SearchParams.approx_topk_recall)
    approx_topk_recall: float = 0.95
    # keyframe device programs allowed in flight before the oldest is
    # FORCE-resolved with its own device_get.  With co-resolve (the
    # outputs ride the frontend's batch device_get once a later batch
    # resolves — LoopManager.co_query) the force path is a fallback
    # only: at b16/pipe_depth 2 a keyframe becomes co-resolvable
    # ~kf_co_lag+2 batch iterations (~32-48 scans ≈ 4-5 keyframes at
    # win_size 10) after dispatch, so the cap must exceed that or the
    # fallback RPC (~30-50 ms tunnel round-trip each) fires anyway.
    # Loop events still FOLD as soon as outputs land on the host
    # (resolve_ready in _drain), so raising the cap does not delay
    # corrections beyond the co-resolve point itself.
    kf_inflight: int = 8
    # co-resolve barrier offset: 1 = ride the first batch dispatched
    # AFTER the keyframe program (program guaranteed finished, zero
    # added wait); 0 = ride the barrier batch itself (the get also
    # waits for the keyframe program's ~20-30 ms execution — device
    # time a later resolve would absorb anyway; events one batch
    # fresher).
    kf_co_lag: int = 1


@dataclass(frozen=True)
class GBACfg:
    voxel_size: float = 2.0
    min_eigen_value: float = 0.1
    eigen_value_array: Tuple[float, ...] = (4.0, 4.0, 4.0, 4.0)
    total_max_iter: int = 6
    # submap-level BA capacity: submaps beyond this are merged by
    # striding ADJACENT submaps together (no middle-of-trajectory
    # loss like plain linspace subsampling)
    max_submaps: int = 32
    submap_points: int = 32768


@dataclass(frozen=True)
class Shapes:
    """Static padded sizes for jitted programs (TPU-only group)."""

    max_raw_points: int = 32768  # raw points per scan after decimation
    max_points: int = 4096  # downsampled points per scan (ESIKF/map)
    max_imu: int = 64  # IMU samples per scan interval
    hash_capacity: int = 1 << 17  # voxel map slots (power of two)
    max_probe: int = 16  # open-addressing probe bound
    max_ba_voxels: int = 4096  # plane voxels harvested per local BA
    map_max_points: int = 100  # fixed-point cap per voxel (reference
    #                            voxel_map.hpp:86 max_points)
    min_point: Tuple[int, ...] = (5, 5, 5, 5)  # per-layer min N
    #                            (reference voxelslam.cpp:812)
    scan_batch: int = 1  # scans per device program (throughput mode:
    #   amortizes dispatch/transfer; adds batch-1 scans of latency)
    refit_size: int = 0  # per-scan plane-refit compaction bound
    #   (0 = max_points); smaller pads trade refit latency for step
    #   time — skipped voxels stay growth-flagged and retry on touch
    fast_subsample: int = 0  # 1: strided device subsample instead of
    #   the sort-based voxel average — only when the host pre-reduces
    #   dense scans to down_size cells (see pipeline.PipelineParams)
    pipe_depth: int = 1  # in-flight async steady batches (FIFO);
    #   2 hides the device's residual batch time behind host packing
    #   at the cost of one extra batch of output latency
    free_startup_programs: int = 0  # 1: drop the FILL/init program
    #   executables after the STEADY transition (host RSS rent);
    #   a session reset then RECOMPILES them — persistent-cache
    #   reload locally, potentially 100+ s on the axon remote
    #   compile server.  Enable only when resets are tolerable.


@dataclass(frozen=True)
class Config:
    general: GeneralCfg = field(default_factory=GeneralCfg)
    odometry: OdometryCfg = field(default_factory=OdometryCfg)
    local_ba: LocalBACfg = field(default_factory=LocalBACfg)
    loop: LoopCfg = field(default_factory=LoopCfg)
    gba: GBACfg = field(default_factory=GBACfg)
    shapes: Shapes = field(default_factory=Shapes)

    @property
    def plane_thre_inv(self) -> Tuple[float, ...]:
        """Reference inverts the thresholds at load (voxelslam.cpp:825):
        plane gate is λ0/λ2 < 1/thre."""
        return tuple(1.0 / t for t in self.local_ba.plane_eigen_value_thre)


_GROUP_MAP = {
    "General": ("general", GeneralCfg),
    "Odometry": ("odometry", OdometryCfg),
    "LocalBA": ("local_ba", LocalBACfg),
    "Loop": ("loop", LoopCfg),
    "GBA": ("gba", GBACfg),
    "Shapes": ("shapes", Shapes),
}

_KEY_RENAMES = {"isHighFly": "is_high_fly"}


def load_yaml(path: str, base: Config | None = None) -> Config:
    """Load a reference-layout YAML config over (optional) base config."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = base or Config()
    updates = {}
    for group_name, content in raw.items():
        if group_name not in _GROUP_MAP or not isinstance(content, dict):
            continue
        attr, cls = _GROUP_MAP[group_name]
        current = getattr(cfg, attr)
        fields = {f.name for f in dataclasses.fields(cls)}
        kv = {}
        for k, val in content.items():
            k = _KEY_RENAMES.get(k, k)
            if k in fields:
                if isinstance(val, list):
                    val = tuple(val)
                kv[k] = val
        updates[attr] = dataclasses.replace(current, **kv)
    return dataclasses.replace(cfg, **updates)
