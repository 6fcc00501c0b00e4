"""Host-side SLAM front-end orchestrator.

The thin driver around the jitted device programs of
odom/pipeline.py — counterpart of the reference's odometry thread
state machine (voxelslam.cpp:1456-1738) plus the IMU static-init gate
(ekf_imu.hpp:167-214):

  IMU_INIT  — accumulate ≥ min_init_num IMU samples, set gravity
  FILL      — grow the sliding window scan by scan (no BA)
  REFINE    — dynamic initialization: gravity BA + world alignment;
              sanity checks 9.6 < ‖g‖ < 10 and plane-span degeneracy
              (voxelslam.cpp:651-677) — failure resets the session
  STEADY    — full odometry + local BA every scan

The host never touches point math: it pads inputs, tracks timestamps,
applies the reset policy (degrade_cnt > degrade_bound ⇒ new session,
voxelslam.cpp:1618-1634), and drains outputs (trajectory, ScanPoses
for the loop-closure layer).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import Config
from .imu import propagation as prop
from .map.voxelmap import MapParams
from .odom import pipeline as pl


@jax.jit
def _remap_slots(dstmap: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """Apply an eviction's old->new slot map to stored slot records."""
    return dstmap[slot]


@jax.jit
def _remap_touch(dstmap: jnp.ndarray, touch: jnp.ndarray) -> jnp.ndarray:
    """Move a (C,) touched mask through an eviction's slot map."""
    C = touch.shape[0]
    return jnp.zeros_like(touch).at[dstmap[:C]].set(touch, mode="drop")


@dataclass
class ScanRecord:
    """One processed scan's outputs, host-side."""

    t: float
    R: np.ndarray
    p: np.ndarray
    degenerate: bool
    match_count: int
    session: int
    # marginalized ScanPose (set once the window slides past it)
    scan_pose: Optional[dict] = None


@dataclass
class SlamFrontend:
    cfg: Config
    dtype: object = jnp.float32

    def __post_init__(self):
        c = self.cfg
        sh = c.shapes
        self.pp = pl.PipelineParams(
            map_params=MapParams(
                capacity=sh.hash_capacity,
                max_probe=sh.max_probe,
                voxel_size=c.odometry.voxel_size,
                max_layer=c.local_ba.max_layer,
                min_point=tuple(sh.min_point),
                min_eigen_value=c.odometry.min_eigen_value,
                plane_thre_inv=c.plane_thre_inv,
                max_points=sh.map_max_points,
                evict_dist=c.odometry.evict_dist,
            ),
            win_size=c.local_ba.win_size,
            n_raw=sh.max_raw_points,
            n_ds=sh.max_points,
            n_imu=sh.max_imu,
            max_ba_voxels=sh.max_ba_voxels,
            down_size=c.odometry.down_size,
            dept_err=c.odometry.dept_err,
            beam_err=c.odometry.beam_err,
            imu_coef=c.local_ba.imu_coef,
            ba_max_iter=c.local_ba.max_iter,
            refit_size=sh.refit_size or sh.max_points,
            pvec_downsample=bool(c.odometry.pvec_downsample),
            fast_subsample=bool(getattr(sh, "fast_subsample", 0)),
        )
        self.imu_noise = prop.noise_from_cfg(
            c.odometry.cov_gyr, c.odometry.cov_acc,
            c.odometry.rdw_gyr, c.odometry.rdw_acc, self.dtype,
        )
        eR = np.asarray(c.general.extrinsic_rota, np.float32).reshape(3, 3)
        et = np.asarray(c.general.extrinsic_tran, np.float32)
        self.ext_R = jnp.asarray(eR, self.dtype)
        self.ext_t = jnp.asarray(et, self.dtype)

        self.carry = pl.make_empty_carry(self.pp, self.imu_noise, self.dtype)
        self.phase = "IMU_INIT"
        self.scale_gravity = jnp.asarray(1.0, self.dtype)
        self._imu_acc_sum = np.zeros(3)
        self._imu_gyr_sum = np.zeros(3)
        self._imu_count = 0
        self.min_init_num = 30
        self.init_span_bound = c.odometry.init_span_bound  # plane-span bound
        #                              (voxelslam.cpp:651-658)
        self._evict_jour = 0.0
        self.t_prev_end: Optional[float] = None
        self.degrade_cnt = 0
        self.session = 0
        self.records: List[ScanRecord] = []
        self.scan_poses: List[dict] = []  # exports for loop closure
        self._t0: Optional[float] = None  # session time origin
        from .utils.telemetry import Telemetry
        self.telemetry = Telemetry()
        self.g_update = False  # one-shot gravity refresh in the next
        #                        window BA (g_update=2 protocol)
        # FIFO of in-flight async steady batches: (seq, outs, t_ends)
        self._pending = []
        self.dispatch_seq = 0  # monotonically increasing dispatch id
        # optional co-resolver (duck-typed: co_query(seq)/co_deliver):
        # extra device outputs that ride this frontend's batch
        # device_get in the SAME tunnel RPC (see LoopManager co_query)
        self.co_resolver = None
        self.pipe_depth = max(1, getattr(sh, "pipe_depth", 1))
        self._fill_count = 0
        self.scan_batch = max(int(getattr(c.shapes, "scan_batch", 1)), 1)
        self._batch_buf = []  # flats awaiting a full device batch
        self._pressure = False  # hash overflow seen -> compact
        self._last_jour = 0.0  # travel stamp from RESOLVED outputs
        self._last_load = 0.0  # hash load factor from RESOLVED outputs
        self._reduce_cell = 0  # sticky raw-reduce cell index
        self._reduce_tick = 0

    # ------------------------------------------------------------- inputs

    def _reduce_raw(self, pts: np.ndarray, offsets: np.ndarray):
        """Host pre-reduction when a scan exceeds the raw padding:
        keep one representative per grid cell (nearest cell center,
        carrying its OWN timestamp so device deskew stays exact),
        coarsening the cell until the scan fits `n_raw` — replaces
        silent truncation.  Equivalent to the reference's
        down_sampling_close applied before deskew; the device still
        runs the post-deskew voxel average at `down_size`."""
        n_raw = self.pp.n_raw
        if len(pts) <= n_raw:
            return pts, offsets
        base = self.pp.down_size
        from . import native
        cells = (base * 0.5, base, base * 2.0, base * 4.0)
        # sticky starting cell: consecutive scans see the same scene
        # density, so start where the last scan succeeded instead of
        # re-discovering it with full overflow passes (~1.7 ms each);
        # retry one finer every 32 scans so a sparser scene recovers
        start = self._reduce_cell
        if len(pts) > 2.5 * n_raw:
            start = max(start, 1)  # the half cell cannot fit
        self._reduce_tick += 1
        if start > 0 and self._reduce_tick % 32 == 0:
            start -= 1
        r = native.voxel_reduce_auto(pts, offsets, cells, start, n_raw)
        if r is not None:
            self._reduce_cell = r[2]
            return r[0], r[1]
        # numpy fallback: first point per cell
        cell = base
        p = np.asarray(pts)
        for _ in range(4):
            ids = np.floor(p / cell).astype(np.int64)
            key = (
                (ids[:, 0] & 0x1FFFFF) << 42
                | (ids[:, 1] & 0x1FFFFF) << 21
                | (ids[:, 2] & 0x1FFFFF)
            )
            _, first = np.unique(key, return_index=True)
            if len(first) <= n_raw:
                return p[first], np.asarray(offsets)[first]
            cell *= 2.0
        return p[:n_raw], np.asarray(offsets)[:n_raw]

    # ------------------------------------------------------------ process

    def _pack_flat(self, pts, offsets, t_begin, t_end,
                   imu_t, imu_gyr, imu_acc) -> np.ndarray:
        n_raw = self.pp.n_raw
        pts, offsets = self._reduce_raw(pts, offsets)
        K = min(len(pts), n_raw)
        P = np.zeros((n_raw, 3), np.float32)
        O = np.zeros((n_raw,), np.float32)
        P[:K] = pts[:K]
        O[:K] = offsets[:K]
        t_prev = self.t_prev_end if self.t_prev_end is not None else t_begin
        dt, gyr, acc, offt, valid, dt_ext = prop.pack_imu_intervals(
            imu_t, imu_gyr, imu_acc, t_prev, t_begin, t_end, self.pp.n_imu
        )
        n_imu = int(valid.sum())
        t_rel = t_end - (self._t0 if self._t0 is not None else t_begin)
        return pl.pack_scan_flat(
            P, O, K, dt, gyr, acc, offt, n_imu, dt_ext, t_rel, self.pp
        )

    def _resolve_pending(self) -> Optional[ScanRecord]:
        """Drain the OLDEST dispatched (async) steady batch: pull
        outputs to the host, record, apply reset policies.  Up to
        `pipe_depth` batches stay in flight (FIFO) so host packing and
        device execution overlap fully — at depth 1 the host still
        pays the device's residual batch time as a resolve wait
        (~80 ms/batch measured on the tunneled device)."""
        if not self._pending:
            return None
        seq, outs, t_ends = self._pending.pop(0)
        extras = (
            self.co_resolver.co_query(seq)
            if self.co_resolver is not None else None
        )
        with self.telemetry.stage("resolve"):
            if extras:
                outs, host_extras = jax.device_get((outs, extras))
                self.co_resolver.co_deliver(host_extras)
            else:
                outs = jax.device_get(outs)
        rec = None
        B = len(t_ends)
        for b in range(B):
            out = jax.tree.map(lambda a: a[b], outs)
            rec = self._record(out, t_ends[b])
            self.telemetry.count("scans")
            # subdivisions drain inline in the step (reroute pass);
            # count them for observability only
            ns = int(getattr(out, "n_subdiv", 0))
            if ns:
                self.telemetry.count("subdivisions", ns)
            # hash-pressure accounting: dropped insertions mean the
            # table is saturating — trigger the compaction valve
            # (reference pressure valve: distance eviction + pool trim,
            # voxelslam.cpp:1503-1536)
            self._last_jour = float(out.jour)
            self._last_load = (
                float(out.n_occupied) / self.pp.map_params.capacity
            )
            ovf = int(out.overflow)
            if ovf > 0:
                self.telemetry.count("hash_overflow", ovf)
                self._pressure = True
            if bool(out.degenerate):
                self.telemetry.count("degenerate_scans")
                self.degrade_cnt += 1
            elif self.degrade_cnt > 0:
                self.degrade_cnt -= 1
            self.scan_poses.append(
                dict(
                    # session-relative device time -> absolute
                    t=float(out.scan_pose.t) + (self._t0 or 0.0),
                    R=np.asarray(out.scan_pose.R),
                    p=np.asarray(out.scan_pose.p),
                    v=np.asarray(out.scan_pose.v),
                    bg=np.asarray(out.scan_pose.bg),
                    ba=np.asarray(out.scan_pose.ba),
                    g=np.asarray(out.scan_pose.g),
                    v6=np.asarray(out.scan_v6),
                    pts=np.asarray(out.scan_pts, np.float32) * 0.01,
                    mask=np.asarray(out.scan_mask),
                    session=self.session,
                )
            )
            if self.degrade_cnt > self.cfg.odometry.degrade_bound:
                self._reset(
                    "degeneracy bound exceeded",
                    handoff=self.scan_poses[-1] if self.scan_poses
                    else None,
                )
                break
        return rec

    def flush(self) -> Optional[ScanRecord]:
        """Drain the pipeline: resolve any in-flight dispatch AND
        process scans still buffered for an incomplete batch (end of
        stream / finish — without this, up to scan_batch-1 tail scans
        would be silently dropped)."""
        rec = None
        while self._pending:
            rec = self._resolve_pending() or rec
        if self._batch_buf and self.phase == "STEADY":
            leftovers = self._batch_buf
            self._batch_buf = []
            step1 = self._flush_program()
            for flat, t_end in leftovers:
                self._maybe_gravity_refresh()
                self.carry, out = step1(
                    self.carry, jnp.asarray(flat), self.imu_noise,
                    self.ext_R, self.ext_t, self.scale_gravity,
                )
                self.dispatch_seq += 1
                self._pending.append(
                    (self.dispatch_seq,
                     jax.tree.map(lambda a: a[None], out), [t_end])
                )
                rec = self._resolve_pending() or rec
        return rec

    def _flush_program(self):
        """The single-scan steady step as an AOT-compiled executable.

        flush() is the ONLY user of the batch-1 program; compiling it
        lazily inside flush put a full device compile (~90 s observed
        on the tunneled TPU, the cache server permitting) at the END
        of every stream whose length is not a multiple of scan_batch.
        `warm_programs()` builds it at the FILL→STEADY transition
        instead, where warmup already pays compile time."""
        if self.scan_batch == 1:
            # batch-1 configs use the jit path every scan anyway
            def step1(carry, flat, *a):
                return pl.steady_step_flat(carry, flat, self.pp, *a)
            return step1
        if getattr(self, "_flush_exec", None) is None:
            flat0 = jnp.zeros((pl.flat_len(self.pp),), self.dtype)
            self._flush_exec = pl.steady_step_flat.lower(
                self.carry, flat0, self.pp, self.imu_noise,
                self.ext_R, self.ext_t, self.scale_gravity,
            ).compile()
        return self._flush_exec

    def warm_programs(self):
        """Compile off-hot-path programs before they are first needed."""
        if self.phase == "STEADY" and self.scan_batch > 1:
            self._flush_program()
        self._evict_exec()
        # the eviction's slot-remap helpers are separate tiny jits —
        # compile them here too, or the FIRST eviction pays a mid-
        # stream remote compile (the moody axon compile server makes
        # even trivial programs cost seconds; evict max 2.2 s observed)
        C1 = self.carry.vmap.keys.shape[0] + 1
        dst = jnp.zeros((C1,), jnp.int32)
        _remap_slots(dst, self.carry.win.slot)
        _remap_touch(dst, self.carry.rr_touch)
        # Startup-program retirement (opt-in): the FILL/init programs
        # run once per session; their executables + lowering artifacts
        # pay host RSS rent for the whole run (r4 attribution: ~3 GB
        # across the fill/flush/evict/keyframe program set).  Freeing
        # them here means a SESSION RESET must recompile fill/init —
        # a persistent-cache reload locally, but the axon remote
        # compile server's cache is moody (CLAUDE.md: 104-800 s
        # warmups observed), so this stays off unless the deployment
        # tolerates a reset stall (the bench ring has no resets).
        if getattr(self.cfg.shapes, "free_startup_programs", 0):
            import voxelslam_tpu.odom.pipeline as _pl

            for fn in (_pl.fill_step_flat, _pl.fill_step,
                       _pl.init_refine):
                try:
                    fn.clear_cache()
                except Exception:
                    pass
            self.telemetry.count("startup_programs_freed")
        # the compile burst just peaked several GB of temporary host
        # allocations (fill/init/flush/evict programs); return the
        # freed arenas to the OS so steady-state RSS reflects the
        # working set, not the compile peak
        from .utils.telemetry import trim_host_heap

        trim_host_heap()

    def _evict_exec(self):
        """The eviction+compaction program as an AOT executable.

        Its first jit call otherwise compiles mid-stream at the first
        evict_dist/8 travel mark (measured 14.7 s on the tunneled TPU
        when the shape set differs from a cached one — BENCH r4 ring
        frontend segment 1 ran at 7 scans/s because of exactly this).
        `dist` and `jour` are traced, so one executable serves the
        periodic evict AND the pressure valve's shrinking horizon."""
        if getattr(self, "_evict_aot", None) is None:
            from .map import voxelmap as _vm

            zero = jnp.asarray(0.0, self.dtype)
            self._evict_aot = _vm.evict_compiled.lower(
                self.carry.vmap, zero, self.pp.map_params, zero
            ).compile()
        return self._evict_aot

    def _maybe_gravity_refresh(self):
        """One-shot gravity-refining window BA (g_update protocol,
        voxelslam.cpp:1138-1156) — a single extra device program on
        the rare cross-session merge, not a batch-wide recompile."""
        if self.g_update:
            self.g_update = False
            with self.telemetry.stage("g_refresh"):
                self.carry = pl.gravity_refresh(
                    self.carry, self.pp, self.imu_noise
                )

    def process_scan(self, pts: np.ndarray, offsets: np.ndarray,
                     t_begin: float, t_end: float,
                     imu_t: np.ndarray, imu_gyr: np.ndarray,
                     imu_acc: np.ndarray) -> Optional[ScanRecord]:
        """Feed one scan + the IMU stream (absolute times, host side).

        STEADY-phase results are pipelined: the returned record is the
        PREVIOUS scan's (device executes the current one while the
        host prepares the next); call `flush()` to drain."""
        # In STEADY the in-flight batch is drained only AFTER the next
        # batch is packed and dispatched — resolving here would make
        # the host block for the whole device batch, then pack
        # serially (measured: single biggest throughput loss).
        rec_prev = None
        if self.phase != "STEADY":
            while self._pending:
                rec_prev = self._resolve_pending() or rec_prev
        if self._t0 is None:
            self._t0 = t_begin

        if self.phase == "IMU_INIT":
            sel = (imu_t >= t_begin - 0.5) & (imu_t <= t_end)
            self._imu_acc_sum += imu_acc[sel].sum(axis=0)
            self._imu_gyr_sum += imu_gyr[sel].sum(axis=0)
            self._imu_count += int(sel.sum())
            self.t_prev_end = t_end
            if self._imu_count > self.min_init_num:
                mean_acc = self._imu_acc_sum / self._imu_count
                is_livox = "livox" in self.cfg.general.imu_topic
                g0, scale = prop.static_init_gravity(
                    jnp.asarray(mean_acc, self.dtype), is_livox
                )
                self.scale_gravity = scale
                self.carry = self.carry._replace(
                    x=self.carry.x._replace(g=g0)
                )
                self.phase = "FILL"
            return rec_prev

        if self.t_prev_end is not None and t_begin < self.t_prev_end - 0.01:
            # LiDAR time regression (ekf_imu.hpp:45-49): unrecoverable
            # stream fault -> restart the session instead of exit(0)
            self._reset(
                f"LiDAR time regression {t_begin:.3f} < {self.t_prev_end:.3f}"
            )
            return rec_prev
        with self.telemetry.stage("pack"):
            flat = self._pack_flat(pts, offsets, t_begin, t_end,
                                   imu_t, imu_gyr, imu_acc)
        self.t_prev_end = t_end

        if self.phase == "FILL":
            with self.telemetry.stage("fill_step"):
                self.carry, out = pl.fill_step_flat(
                    self.carry, jnp.asarray(flat), self.pp, self.imu_noise,
                    self.ext_R, self.ext_t, self.scale_gravity,
                )
            self._fill_count += 1
            if self._fill_count >= self.pp.win_size:
                self.carry, g_norm, span = pl.init_refine(
                    self.carry, self.pp, self.imu_noise,
                    self.ext_R, self.ext_t, self.scale_gravity,
                )
                g_norm = float(g_norm)
                if not (9.6 < g_norm < 10.0):
                    self._reset(
                        f"init gravity norm {g_norm:.3f} out of range",
                        new_session=False,
                    )
                    return rec_prev
                # plane-normal-span degeneracy (voxelslam.cpp:651-658)
                if float(span) < self.init_span_bound:
                    self._reset(
                        f"init plane span {float(span):.1f} degenerate",
                        new_session=False,
                    )
                    return rec_prev
                self.phase = "STEADY"
                # warm the deferred-rebuild program now (compile off
                # the hot path); also guarantees a consistent map in
                # case init left fresh subdivisions unrouted
                with self.telemetry.stage("rebuild"):
                    self.carry = pl.rebuild_map(self.carry, self.pp)
                with self.telemetry.stage("warm_flush"):
                    self.warm_programs()
            return self._record(jax.device_get(out), t_end)

        # STEADY: batch scans into one device program, dispatch async
        self._batch_buf.append((flat, t_end))
        if len(self._batch_buf) < self.scan_batch:
            return rec_prev
        flats = np.stack([f for f, _ in self._batch_buf])
        t_ends = [t for _, t in self._batch_buf]
        self._batch_buf = []
        self._maybe_gravity_refresh()
        with self.telemetry.stage("dispatch"):
            if self.scan_batch == 1:
                self.carry, out = pl.steady_step_flat(
                    self.carry, jnp.asarray(flats[0]), self.pp,
                    self.imu_noise, self.ext_R, self.ext_t,
                    self.scale_gravity,
                )
                out = jax.tree.map(lambda a: a[None], out)
            else:
                self.carry, out = pl.steady_step_batch(
                    self.carry, jnp.asarray(flats), self.pp,
                    self.imu_noise, self.ext_R, self.ext_t,
                    self.scale_gravity,
                )
        # enqueue, then drain down to pipe_depth in-flight batches:
        # the oldest batch has had pipe_depth batch-times of device
        # execution behind it, so the wait is ~zero; a session reset
        # fired while draining clears the queue (dead-session batches)
        # and the loop condition re-checks it
        self.dispatch_seq += 1
        self._pending.append((self.dispatch_seq, out, t_ends))
        while len(self._pending) > self.pipe_depth:
            rec_prev = self._resolve_pending() or rec_prev

        # distance-based map eviction + table compaction.  The travel
        # stamp comes from the last RESOLVED batch (one batch stale):
        # reading carry.jour here would block on the batch just
        # dispatched and serialize the async pipeline.
        jour_now = self._last_jour
        if jour_now - self._evict_jour > self.pp.map_params.evict_dist / 8.0:
            self._evict_jour = jour_now
            self._evict(jour_now, self.pp.map_params.evict_dist)
        self._maybe_compact(jour_now)
        return rec_prev

    def _evict(self, jour_now: float, dist: float):
        with self.telemetry.stage("evict"):
            vmap, dstmap = self._evict_exec()(
                self.carry.vmap, jnp.asarray(jour_now, self.dtype),
                jnp.asarray(dist, self.dtype),
            )
            # compaction moved slots: remap the window's per-point
            # routing records and the pending re-route touched set
            win = self.carry.win
            self.carry = self.carry._replace(
                vmap=vmap,
                win=win._replace(slot=_remap_slots(dstmap, win.slot)),
                rr_touch=_remap_touch(dstmap, self.carry.rr_touch),
            )
        self.telemetry.count("evictions")

    def _maybe_compact(self, jour_now: float):
        """Pressure valve: when insertions overflowed the probe bound
        or the table load factor climbs past 0.7, evict with a
        progressively shorter distance horizon until load relaxes —
        graceful degradation instead of silently dropped voxels
        (reference: voxelslam.cpp:1503-1536).

        The load check reads the RESOLVED outputs' occupancy
        (StepOutputs.n_occupied, one batch stale) — never
        load_factor(carry) of the batch just dispatched, which would
        block the host on the whole in-flight batch.  Only the valve
        loop itself (rare: actual pressure) syncs, to observe each
        eviction's effect."""
        from .map import voxelmap as _vm

        if not self._pressure and self._last_load <= 0.7:
            return
        dist = self.pp.map_params.evict_dist
        floor = self.pp.map_params.voxel_size * 8.0
        for _ in range(6):
            self._evict(jour_now, dist)
            self.telemetry.count("host_sync_valve")
            load = float(_vm.load_factor(self.carry.vmap.keys))
            self._last_load = load
            if load < 0.6 or dist <= floor:
                break
            dist *= 0.5
        self.telemetry.count("pressure_compactions")
        self._pressure = False

    def insert_keyframe_fixed(self, cloud, mask, R0, p0):
        """Mid-term association: fold one historical keyframe back
        into the map as fixed points (keyframe_loading,
        voxelslam.cpp:1189-1228)."""
        self.carry = pl.insert_fixed_keyframe(
            self.carry, jnp.asarray(cloud, self.dtype),
            jnp.asarray(mask), jnp.asarray(R0, self.dtype),
            jnp.asarray(p0, self.dtype), self.pp,
        )

    def apply_loop_correction(self, event: dict):
        """Swap in the post-PGO map and transform the window by the
        rigid correction (loop_update handshake, voxelslam.cpp:1478).

        Serialized with the async pipeline: any batch dispatched with
        the pre-correction carry is resolved FIRST and its drained
        ScanPoses are transformed by (dx_R, dx_p), so the sequential
        PGO edge bridging the correction event stays consistent (the
        reference serializes this via the loop_update handshake)."""
        mark = len(self.scan_poses)
        while self._pending:
            self._resolve_pending()
        if len(self.scan_poses) > mark:
            dxR = np.asarray(event["dx_R"], np.float32)
            dxp = np.asarray(event["dx_p"], np.float32)
            for sp in self.scan_poses[mark:]:
                sp["R"] = dxR @ sp["R"]
                sp["p"] = dxR @ sp["p"] + dxp
                sp["v"] = dxR @ sp["v"]
                sp["g"] = dxR @ sp["g"]
        kfs = event["kf_clouds"]
        K = len(kfs)
        P = kfs[0][0].shape[0]
        # pad the keyframe count to a fixed 5 (the manager sends the
        # last ≤5): a varying K would compile a fresh correction
        # program per distinct count, mid-stream
        Kp = max(K, 5)
        kf_pts = np.zeros((Kp, P, 3), np.float32)
        kf_mask = np.zeros((Kp, P), bool)
        kf_R = np.tile(np.eye(3, dtype=np.float32), (Kp, 1, 1))
        kf_p = np.zeros((Kp, 3), np.float32)
        for i, k in enumerate(kfs):
            kf_pts[i] = k[0]
            kf_mask[i] = k[1]
            kf_R[i] = k[2]
            kf_p[i] = k[3]
        self.carry = pl.apply_loop_correction(
            self.carry,
            jnp.asarray(event["dx_R"], self.dtype),
            jnp.asarray(event["dx_p"], self.dtype),
            jnp.asarray(kf_pts), jnp.asarray(kf_mask),
            jnp.asarray(kf_R), jnp.asarray(kf_p),
            self.pp,
        )

    def _record(self, out: pl.StepOutputs, t_end: float) -> ScanRecord:
        rec = ScanRecord(
            t=t_end,
            R=np.asarray(out.x.R),
            p=np.asarray(out.x.p),
            degenerate=bool(out.degenerate),
            match_count=int(out.match_count),
            session=self.session,
        )
        self.records.append(rec)
        return rec

    def _reset(self, reason: str, new_session: bool = True,
               handoff: Optional[dict] = None):
        """system_reset (voxelslam.cpp:1290-1317): destroy the map,
        restart a new session spatially offset so sessions never alias
        (restart pose z+30).

        new_session=False: a failed INITIALIZATION attempt (gravity
        norm / plane span gate) — nothing of this attempt was ever
        emitted (no marginalized ScanPoses), so retry init under the
        SAME session id instead of minting one empty session per
        attempt.  The reference likewise loops motion_init without a
        system reset (voxelslam.cpp:1618-1634); sustained degeneracy
        (e.g. a featureless corridor) otherwise inflates the session
        count by one per failed attempt and drowns the pose graph in
        empty fragments.

        handoff (degrade resets): the last resolved ScanPose of the
        dying session.  The new session's world frame is defined as
        the body frame at reset, so the old state transfers exactly:
        v, g rotate by R_oldᵀ; the IMU biases are frame-free.  When a
        reset fires mid-motion (the only way degeneracy resets
        happen), a fresh static init would average MOVING accel into
        gravity and restart v at zero while walking — seeding the
        new session with the carried state skips the blind static
        window entirely (phase goes straight to FILL).  Degeneracy
        corrupts translation along the unconstrained axis; the local
        orientation/velocity/bias estimates remain valid."""
        print(f"[voxelslam-tpu] session reset: {reason}")
        self._pending = []
        self._batch_buf = []
        self._fill_count = 0
        if new_session:
            self.session += 1
        self.degrade_cnt = 0
        self.phase = "IMU_INIT"
        self._imu_acc_sum[:] = 0
        self._imu_gyr_sum[:] = 0
        self._imu_count = 0
        carry = pl.make_empty_carry(self.pp, self.imu_noise, self.dtype)
        x = carry.x._replace(
            p=jnp.asarray([0.0, 0.0, 30.0 * self.session], self.dtype)
        )
        if handoff is not None:
            R_old = np.asarray(handoff["R"])
            x = x._replace(
                v=jnp.asarray(R_old.T @ handoff["v"], self.dtype),
                bg=jnp.asarray(handoff["bg"], self.dtype),
                ba=jnp.asarray(handoff["ba"], self.dtype),
                g=jnp.asarray(R_old.T @ handoff["g"], self.dtype),
            )
            self.phase = "FILL"
        self.carry = carry._replace(x=x)

    # ----------------------------------------------------------- helpers

    def run_synthetic(self, data) -> List[ScanRecord]:
        recs = []
        for sc in data.scans:
            r = self.process_scan(
                sc.points, sc.offsets, sc.t_begin, sc.t_end,
                data.imu_t, data.imu_gyr, data.imu_acc,
            )
            if r is not None:
                recs.append(r)
        r = self.flush()
        if r is not None:
            recs.append(r)
        return recs

    def trajectory(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        self.flush()
        ts = np.array([r.t for r in self.records])
        Rs = np.stack([r.R for r in self.records])
        ps = np.stack([r.p for r in self.records])
        return ts, Rs, ps


class _CoResolveFanout:
    """Aggregate several co-resolve providers (LoopManager, GlobalMapper)
    behind the SlamFrontend's single co_resolver hook: their pending
    device outputs all ride the one batch device_get RPC."""

    def __init__(self, *providers):
        self.providers = providers
        self._queries = None

    def co_query(self, resolved_seq: int):
        self._queries = [p.co_query(resolved_seq) for p in self.providers]
        if not any(q is not None for q in self._queries):
            self._queries = None
            return None
        return self._queries

    def co_deliver(self, host) -> None:
        for p, q, h in zip(self.providers, self._queries, host):
            if q is not None:
                p.co_deliver(h)
        self._queries = None


class VoxelSLAM:
    """Complete system: odometry front-end + loop closure + global
    mapping + session persistence — the counterpart of the reference's
    three-thread process (main, voxelslam.cpp:2599-2624), with the
    loop/global work running as episodic device programs between scans
    instead of concurrent threads.

    Usage:
        slam = VoxelSLAM(cfg)
        for scan in stream: slam.process_scan(...)
        slam.finish()           # final global BA (HBA) + save
    """

    def __init__(self, cfg: Config, dtype=jnp.float32,
                 previous_sessions: Optional[list] = None,
                 previous_edges=None):
        from .glb import hba
        from .loop import btc as _btc, database as _db, manager as _mgr

        self.cfg = cfg
        self.frontend = SlamFrontend(cfg, dtype)
        btc_params = (
            _btc.highfly_params() if cfg.loop.is_high_fly else _btc.BtcParams()
        )
        # TPU-native default: more projection planes cost little batched
        # and measurably improve descriptor recall
        btc_params = btc_params._replace(n_proj=max(btc_params.n_proj, 4))
        self.loop = _mgr.LoopManager(
            btc_params,
            _db.SearchParams(
                icp_threshold=cfg.loop.jud_default * 0.3,
                skip_near_num=cfg.loop.skip_near_num,
                candidate_num=cfg.loop.candidate_num,
                max_pairs_per_query=cfg.loop.max_pairs_per_query,
                max_cand_pairs=cfg.loop.max_cand_pairs,
                approx_topk_recall=cfg.loop.approx_topk_recall,
            ),
            win_size=cfg.local_ba.win_size,
            kf_downsample=cfg.odometry.voxel_size / 10.0,
            icp_eigval=cfg.loop.icp_eigval,
            icp_min_match_frac=cfg.loop.icp_min_match_frac,
            ratio_drift=cfg.loop.ratio_drift,
            curr_halt=cfg.loop.curr_halt,
            prev_halt=cfg.loop.prev_halt,
            relocal_witnesses=cfg.loop.relocal_witnesses,
            kf_inflight=cfg.loop.kf_inflight,
            witness_timeout_kfs=cfg.loop.witness_timeout_kfs,
            spill_dir=cfg.general.spill_dir or None,
        )
        # one telemetry table for the whole system (loop sub-stages
        # land next to the frontend's)
        self.loop.telemetry = self.frontend.telemetry
        # keyframe-program and HBA-window outputs ride the frontend's
        # batch device_get (one tunnel RPC) instead of paying their own
        # ~30-50 ms round-trip each (see LoopManager co_query; the
        # prefetch-THREAD alternative was tried and reverted, commit
        # 5149a32 — the tunnel transport serializes a second thread's
        # device_get against the steady resolve stream)
        self.loop.fe_seq = lambda: self.frontend.dispatch_seq
        self.loop.co_resolve_lag = cfg.loop.kf_co_lag
        self.gmap = hba.GlobalMapper(hba.default_params(
            gba_voxel=cfg.gba.voxel_size,
            gba_min_eigen=cfg.gba.min_eigen_value,
            odo_voxel=cfg.odometry.voxel_size,
            odo_min_eigen=cfg.odometry.min_eigen_value,
        ))
        self.gmap.fe_seq = self.loop.fe_seq
        self.frontend.co_resolver = _CoResolveFanout(self.loop, self.gmap)
        self._drained = 0
        self._last_session = 0
        self._loop_warmed = False
        self.loop_events: List[dict] = []
        self._session_names: List[str] = []  # names of LOADED sessions
        self._edge_absent: List[str] = []  # edge.txt lines to preserve
        if previous_sessions:
            self._load_previous(previous_sessions, previous_edges)

    def session_name(self, si: int) -> str:
        """Stable session name: loaded sessions keep their saved names,
        live sessions get `{bagname}_s{index}` (the reference keys
        edge.txt and session dirs by bag name, voxelslam.cpp:201-275)."""
        if si < len(self._session_names):
            return self._session_names[si]
        return f"{self.cfg.general.bagname}_s{si}"

    def _load_previous(self, sessions: list, edges=None):
        """Multi-session relocalization: rebuild keyframes + BTC
        database from saved sessions (previous_map_read,
        voxelslam.cpp:307-448).

        `sessions`: list of scan-pose lists, or (name, scan_poses)
        tuples — names key the shared edge.txt.  `edges`: a path to
        edge.txt or a pre-loaded edge list (serialization.load_edges);
        installed edges pre-merge the loaded sessions so a resumed run
        starts with the prior cross-session links instead of
        re-discovering them."""
        names = []
        self.loop.replay_mode = True
        try:
            for ent in sessions:
                if isinstance(ent, tuple):
                    name, sps = ent
                else:
                    name, sps = f"prev_{len(names)}", ent
                names.append(name)
                for sp in sps:
                    if "pts" not in sp:
                        continue
                    self.loop.push_scan_pose(sp)
                # resolve in-flight keyframe programs so the replay's
                # descriptors land before the next session queries them
                self.loop.flush_pending()
                self.loop.new_session()
        finally:
            self.loop.replay_mode = False
        self._session_names = names
        if edges is not None:
            if isinstance(edges, str):
                from .io import serialization

                loaded, self._edge_absent = serialization.load_edges(
                    edges, names, bagname=self.cfg.general.bagname
                )
            else:
                loaded = edges
            n = self.loop.install_prior_edges(loaded)
            if n:
                print(f"[voxelslam-tpu] installed {n} prior loop edges")
        # previous sessions never trigger corrections on themselves
        self.loop_events.clear()
        # align bookkeeping: frontend session 0 maps to the new
        # loop-manager session
        self._last_session = 0

    def process_scan(self, *args, **kw):
        with self.frontend.telemetry.stage("fe_step"):
            rec = self.frontend.process_scan(*args, **kw)
        if not self._loop_warmed and self.frontend.phase == "STEADY":
            # compile the per-keyframe loop program at the FILL→STEADY
            # transition, next to the frontend's own warm_programs —
            # its first compile otherwise lands mid-stream (~15 s)
            self._loop_warmed = True
            with self.frontend.telemetry.stage("warm_loop"):
                self.loop.warmup()
                self._warm_event_programs()
            from .utils.telemetry import trim_host_heap

            trim_host_heap()
        # mid-term association: reload one nearby historical keyframe
        if rec is not None and self.frontend.phase == "STEADY":
            k = self.loop.nearest_loadable(rec.p)
            if k is not None:
                with self.frontend.telemetry.stage("midterm"):
                    kc, km = k.get_cloud()
                    self.frontend.insert_keyframe_fixed(
                        kc, km, k.R0, k.p0
                    )
                self.frontend.telemetry.count("midterm_loads")
        self._drain()
        return rec

    def _warm_event_programs(self):
        """Compile the loop-EVENT device programs (post-PGO map swap,
        mid-term fixed-keyframe insertion) at the STEADY transition.
        Both otherwise compile at the FIRST loop event / revisit —
        mid-stream, where a moody remote compile can stall the run for
        minutes (measured: a first-instance full-system run lost 134 s
        of its timed window to exactly these compiles while a second
        instance in the same process ran clean).  Both programs are
        functional (carry in → carry out), so warming executes them on
        the live carry and DISCARDS the result."""
        fe = self.frontend
        P = self.loop.kf_max_points
        eye = jnp.eye(3, dtype=fe.dtype)
        zpts = jnp.zeros((5, P, 3), jnp.float32)
        zmask = jnp.zeros((5, P), bool)
        zR = jnp.broadcast_to(eye, (5, 3, 3))
        zp = jnp.zeros((5, 3), jnp.float32)
        pl.apply_loop_correction(
            fe.carry, eye, jnp.zeros(3, fe.dtype), zpts, zmask, zR, zp,
            fe.pp,
        )
        pl.insert_fixed_keyframe(
            fe.carry, jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P,), bool), eye, jnp.zeros(3, fe.dtype), fe.pp,
        )

    def _handle_loop_event(self, event: Optional[dict]):
        if event is None:
            return
        self.loop_events.append(event)
        # Poses RESOLVED before the event but not yet drained to the
        # loop layer sit in the frontend queue in the pre-correction
        # frame — missed by both the loop layer's writeback (not in
        # sessions yet) and apply_loop_correction's mark (appended
        # before it).  Left alone they enter the pose graph ~60 m off
        # with garbage boundary odometry measurements locked in
        # (measured: a 10-pose spike at the first cross-session
        # connect).  Transform the queue before draining continues.
        dxR = np.asarray(event["dx_R"], np.float32)
        dxp = np.asarray(event["dx_p"], np.float32)
        for sp in self.frontend.scan_poses[self._drained:]:
            sp["R"] = dxR @ sp["R"]
            sp["p"] = dxR @ sp["p"] + dxp
            sp["v"] = dxR @ sp["v"]
            sp["g"] = dxR @ sp["g"]
        self.frontend.apply_loop_correction(event)
        if self.loop.g_update_pending:
            self.frontend.g_update = True
            self.loop.g_update_pending = False

    def _drain(self, final: bool = False):
        # session reset propagation (reset_flag, voxelslam.cpp:1856-1887)
        if self.frontend.session != self._last_session:
            self._last_session = self.frontend.session
            self.loop.new_session()
            self._drained = len(self.frontend.scan_poses)
        # fold keyframes whose outputs already rode a batch resolve —
        # free, and their loop corrections land as fresh as possible
        with self.frontend.telemetry.stage("loop"):
            ready = self.loop.resolve_ready()
        self._handle_loop_event(ready)
        # drain marginalized ScanPoses to the loop layer
        while self._drained < len(self.frontend.scan_poses):
            sp = self.frontend.scan_poses[self._drained]
            self._drained += 1
            with self.frontend.telemetry.stage("loop"):
                event = self.loop.push_scan_pose(sp)
            self._handle_loop_event(event)
        if final:  # resolve the in-flight keyframe program
            with self.frontend.telemetry.stage("loop"):
                self._handle_loop_event(self.loop.flush_pending())
        # continuous bottom-up global mapping: at most one keyframe
        # window per drain (the reference's thd_globalmapping runs
        # throughout the session, voxelslam.cpp:2485-2595, so finish
        # only drains leftovers)
        with self.frontend.telemetry.stage("gba_window"):
            # fold a co-resolved window first (host-side already, free)
            n = self.gmap.resolve_ready()
            n += self.gmap.bottom_up_incremental(self.loop.keyframes)
            if final:  # resolve the window dispatched just above
                n += self.gmap._resolve_pending()
            if n:
                self.frontend.telemetry.count("gba_windows", n)

    def run_synthetic(self, data):
        recs = []
        for sc in data.scans:
            r = self.process_scan(
                sc.points, sc.offsets, sc.t_begin, sc.t_end,
                data.imu_t, data.imu_gyr, data.imu_acc,
            )
            if r is not None:
                recs.append(r)
        self.frontend.flush()
        self._drain(final=True)
        return recs

    def run_live(self, feed, lidar_type=None, decode_kw=None,
                 min_imu: int = 5, holdback: float = 0.0):
        """Streaming input loop — the live-ROS callback shape without
        ROS (sync_packages + the odometry thread's consume loop,
        voxelslam.hpp:105-161, voxelslam.cpp:52-161).

        `feed` is any iterable of (kind, payload) messages in ARRIVAL
        order (out-of-order within the sync window is fine):
          ("imu",  (t, gyr3, acc3))         raw IMU sample
          ("scan", DecodedScan)             pre-decoded scan
          ("scan_raw", (data, t_begin))     structured array; decoded
                                            via io.drivers.decode with
                                            `lidar_type` + `decode_kw`
        A live driver calls this with a generator bridging its socket;
        scans are released to the pipeline as soon as their IMU span
        is covered (plus `holdback` seconds for out-of-order
        transports).  Returns the ScanRecords produced; the stream can
        be resumed by calling run_live again with more messages, and
        must be closed with drain_live() at end of stream."""
        from .io import drivers

        sync = getattr(self, "_live_sync", None)
        if sync is None:
            sync = self._live_sync = drivers.ScanSync(
                min_imu=min_imu, holdback=holdback
            )
        recs = []
        for kind, payload in feed:
            if kind == "imu":
                t, gyr, acc = payload
                sync.push_imu(t, gyr, acc)
            elif kind == "scan":
                sync.push_scan(payload)
            elif kind == "scan_raw":
                data, t_begin = payload
                sync.push_scan(drivers.decode(
                    lidar_type, data, t_begin, **(decode_kw or {})
                ))
            else:
                raise ValueError(f"unknown live message kind {kind!r}")
            while True:
                out = sync.pop()
                if out is None:
                    break
                sc, imu_t, imu_gyr, imu_acc = out
                r = self.process_scan(
                    sc.pts, sc.offsets, sc.t_begin, sc.t_end,
                    imu_t, imu_gyr, imu_acc,
                )
                if r is not None:
                    recs.append(r)
        return recs

    def drain_live(self):
        """End of live stream: release scans still held by the
        holdback margin, then flush the pipeline and the loop layer."""
        recs = []
        sync = getattr(self, "_live_sync", None)
        while sync is not None:
            out = sync.pop(final=True)
            if out is None:
                break
            sc, imu_t, imu_gyr, imu_acc = out
            r = self.process_scan(
                sc.pts, sc.offsets, sc.t_begin, sc.t_end,
                imu_t, imu_gyr, imu_acc,
            )
            if r is not None:
                recs.append(r)
        self.frontend.flush()
        self._drain(final=True)
        return recs

    def finish(self, save_dir: Optional[str] = None):
        self.frontend.flush()
        self._drain(final=True)
        return self._finish_impl(save_dir)

    def _finish_impl(self, save_dir: Optional[str] = None):
        """Final global mapping (the reference's `finish` protocol,
        README.md:56-62): bottom-up HBA over keyframes, top-down pose
        graph with all edge sets, optional session save."""
        from .loop import posegraph

        kfs = self.loop.keyframes
        if len(kfs) >= 2:
            # bottom-up ran continuously during the session; finish
            # only drains the leftover windows (O(1) in trajectory)
            self.gmap.bottom_up_drain(kfs)
            # TWO-STAGE finish (measured on the drifted ring,
            # scripts/diag_gba.py): submap clouds merged from
            # UNCORRECTED poses bake the then-unclosed drift into
            # their internal geometry, and the submap-level BA then
            # aligns warped shapes — its edges DEGRADED the one-shot
            # solve (gba1-only 0.0071 m vs gba1+stale-gba2 0.0093).
            # Stage 1: solve with sequential + loop + keyframe-window
            # hessian edges and write back, so keyframe poses are
            # loop-consistent; Stage 2: REBUILD submap clouds from
            # those corrected poses (submap_level(keyframes=...)),
            # run the submap BA, and solve once more with all edges
            # (topDownProcess order, voxelslam.cpp:2231-2317 — the
            # reference's submaps are likewise built from already
            # ISAM2-corrected poses when mid-run solves fired).
            if self.gmap.edges:
                g1, off1 = self.loop._graph_arrays(
                    extra_edges=self.gmap.edges
                )
                R1, p1, _, _ = posegraph.optimize(
                    g1, n_iters=16, cg_iters=256
                )
                self.loop.write_back(np.asarray(R1), np.asarray(p1),
                                     off1)
            edges2 = self.gmap.submap_level(
                keyframes=kfs,
                max_submaps=self.cfg.gba.max_submaps,
                submap_points=self.cfg.gba.submap_points,
            )
            self.gmap.edges.extend(edges2)
            if self.gmap.edges:
                # top-down: sequential + loop + hessian edges, all
                # assembled in one vectorized pass
                g, offsets = self.loop._graph_arrays(
                    extra_edges=self.gmap.edges
                )
                # one-time final solve: give PCG enough iterations for
                # corrections to propagate the full chain length (a
                # correction travels ~1 hop per CG iteration under
                # block-Jacobi; 8x50 leaves long chains half-bent)
                R, p, chi2, chi2_0 = posegraph.optimize(
                    g, n_iters=16, cg_iters=256
                )
                self.loop.write_back(
                    np.asarray(R), np.asarray(p), offsets
                )
                # GBA-effect observability (round-5 VERDICT #5): how
                # much the finish solve actually moved, and whether
                # the GBA edges carry comparable information to the
                # sequential chain (drowned-out edges show up as a
                # huge weight ratio here)
                import sys as _sys

                ne = len(self.gmap.edges)
                w_seq = np.concatenate(
                    [c.w[1 : c.n].reshape(-1) for c in self.loop._chains
                     if c.n >= 2]
                ) if any(c.n >= 2 for c in self.loop._chains) else np.ones(1)
                w_gba = np.concatenate(
                    [1.0 / np.maximum(np.abs(np.asarray(e["v6"])), 1e-12)
                     for e in self.gmap.edges]
                ) if ne else np.ones(1)
                self.finish_stats = dict(
                    chi2_before=float(chi2_0), chi2_after=float(chi2),
                    n_gba_edges=ne,
                    med_w_seq=float(np.median(w_seq)),
                    med_w_gba=float(np.median(w_gba)),
                )
                print(
                    f"[finish] PGO chi2 {float(chi2_0):.3e} -> "
                    f"{float(chi2):.3e}; gba_edges={ne} "
                    f"median info seq={self.finish_stats['med_w_seq']:.3e}"
                    f" gba={self.finish_stats['med_w_gba']:.3e}",
                    file=_sys.stderr,
                )

        if save_dir is not None:
            import os as _os

            from .io import serialization

            _os.makedirs(save_dir, exist_ok=True)
            names = [
                self.session_name(si)
                for si in range(len(self.loop.sessions))
            ]
            for name, sess in zip(names, self.loop.sessions):
                if sess:
                    serialization.save_session(
                        f"{save_dir}/{name}", sess
                    )
            # shared inter-session loop edges (pgo_edges_io,
            # voxelslam.cpp:201-275): read-modify-write so links
            # between sessions NOT part of this run are preserved
            edge_path = _os.path.join(save_dir, "edge.txt")
            _, absent = serialization.load_edges(
                edge_path, names, bagname=self.cfg.general.bagname
            )
            absent = list(self._edge_absent) + [
                ln for ln in absent if ln not in self._edge_absent
            ]
            cross = [
                dict(
                    name1=names[e.s1], name2=names[e.s2],
                    id1=e.scan1, id2=e.scan2, R=e.R, t=e.t, v6=e.v6,
                )
                for e in self.loop.loop_edges if e.s1 != e.s2
            ]
            if cross or absent:
                serialization.save_edges(edge_path, cross, absent)

    def trajectory(self):
        """Final trajectory from the loop-layer scan poses (PGO-
        corrected), falling back to front-end records."""
        out = []
        for sess in self.loop.sessions:
            out.extend(sess)
        if not out:
            return self.frontend.trajectory()
        ts = np.array([s["t"] for s in out])
        Rs = np.stack([s["R"] for s in out])
        ps = np.stack([s["p"] for s in out])
        return ts, Rs, ps
