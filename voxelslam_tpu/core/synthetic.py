"""Synthetic LiDAR-inertial world generator (host-side, numpy).

The reference validates end-to-end by rosbag replay (SURVEY.md §4); we
need a self-contained oracle instead: an analytic trajectory through a
world of bounded planes, with exact IMU measurements derived from the
trajectory's derivatives and LiDAR points ray-cast at their true
per-point acquisition times (so deskew, gravity alignment, bias
estimation and BA all have a known ground truth).

Everything here is numpy on the host — it only produces test fixtures
and benchmark inputs, never device code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List

import numpy as np


@dataclass
class PlaneWorld:
    """Bounded rectangles: center (M,3), normal (M,3) unit, two in-plane
    half-extent vectors u,v (M,3) (not unit; lengths = half sizes)."""

    center: np.ndarray
    normal: np.ndarray
    u: np.ndarray
    v: np.ndarray


def make_room(size=(12.0, 9.0, 4.0), n_boxes: int = 6, seed: int = 0,
              n_poles: int = 0) -> PlaneWorld:
    """A closed room with random boxes (plane diversity for
    point-to-plane odometry) and optional thin pole features (compact
    vertical structures — the occupancy-corner anchors BTC loop
    descriptors key on)."""
    rng = np.random.default_rng(seed)
    sx, sy, sz = [s / 2 for s in size]
    C, N, U, V = [], [], [], []

    def rect(c, n, u, v):
        C.append(c); N.append(np.asarray(n, float)); U.append(np.asarray(u, float)); V.append(np.asarray(v, float))

    # floor/ceiling/walls (normals point inward)
    rect([0, 0, -sz], [0, 0, 1], [sx, 0, 0], [0, sy, 0])
    rect([0, 0, sz], [0, 0, -1], [sx, 0, 0], [0, sy, 0])
    rect([-sx, 0, 0], [1, 0, 0], [0, sy, 0], [0, 0, sz])
    rect([sx, 0, 0], [-1, 0, 0], [0, sy, 0], [0, 0, sz])
    rect([0, -sy, 0], [0, 1, 0], [sx, 0, 0], [0, 0, sz])
    rect([0, sy, 0], [0, -1, 0], [sx, 0, 0], [0, 0, sz])

    for _ in range(n_boxes):
        # keep a clearance zone around the origin — the simulated
        # trajectories live there, and a box at the sensor blinds it
        c = rng.uniform([-sx + 2, -sy + 2, -sz + 0.5], [sx - 2, sy - 2, 0])
        for _retry in range(20):
            if np.linalg.norm(c[:2]) > 3.0:
                break
            c = rng.uniform([-sx + 2, -sy + 2, -sz + 0.5], [sx - 2, sy - 2, 0])
        h = rng.uniform(0.3, 1.2, 3)
        for axis in range(3):
            for sgn in (-1, 1):
                n = np.zeros(3); n[axis] = sgn
                cc = c + n * h[axis]
                ax1, ax2 = (axis + 1) % 3, (axis + 2) % 3
                u = np.zeros(3); u[ax1] = h[ax1]
                v = np.zeros(3); v[ax2] = h[ax2]
                rect(cc, n, u, v)

    for _ in range(n_poles):
        c = rng.uniform([-sx + 1, -sy + 1, 0.0], [sx - 1, sy - 1, 0.0])
        for _retry in range(20):
            if np.linalg.norm(c[:2]) > 3.0:
                break
            c = rng.uniform([-sx + 1, -sy + 1, 0.0], [sx - 1, sy - 1, 0.0])
        h = np.asarray([0.04, 0.04, rng.uniform(0.8, sz * 0.9)])
        c[2] = -sz + h[2]  # pole stands on the floor
        for axis in range(3):
            for sgn in (-1, 1):
                n = np.zeros(3); n[axis] = sgn
                cc = c + n * h[axis]
                ax1, ax2 = (axis + 1) % 3, (axis + 2) % 3
                u = np.zeros(3); u[ax1] = h[ax1]
                v = np.zeros(3); v[ax2] = h[ax2]
                rect(cc, n, u, v)

    return PlaneWorld(np.array(C), np.array(N), np.array(U), np.array(V))


def make_ring(radius: float = 12.5, corridor: float = 9.0,
              height: float = 4.5, n_boxes: int = 24, n_poles: int = 40,
              seed: int = 0) -> PlaneWorld:
    """A ring corridor: outer room + a central block occluding the far
    side, circuit centered at (0, radius) so the ORIGIN lies on the
    ring.  Because each viewpoint only sees its local corridor
    section, odometry drift accumulates over a lap and can only be
    recovered by loop closure — the canonical drift-then-close
    scenario.  Clutter is rejection-sampled into the corridor, clear
    of the circular path."""
    rng = np.random.default_rng(seed)
    cy = radius  # ring center y
    half = radius + corridor / 2.0  # outer half-extent around center
    sz = height / 2.0
    C, N, U, V = [], [], [], []

    def rect(c, n, u, v):
        C.append(np.asarray(c, float)); N.append(np.asarray(n, float))
        U.append(np.asarray(u, float)); V.append(np.asarray(v, float))

    def box(c, h):
        for axis in range(3):
            for sgn in (-1, 1):
                n = np.zeros(3); n[axis] = sgn
                cc = np.asarray(c, float) + n * h[axis]
                ax1, ax2 = (axis + 1) % 3, (axis + 2) % 3
                u = np.zeros(3); u[ax1] = h[ax1]
                v = np.zeros(3); v[ax2] = h[ax2]
                rect(cc, n, u, v)

    # outer shell (normals inward), centered at (0, cy)
    rect([0, cy, -sz], [0, 0, 1], [half, 0, 0], [0, half, 0])
    rect([0, cy, sz], [0, 0, -1], [half, 0, 0], [0, half, 0])
    rect([-half, cy, 0], [1, 0, 0], [0, half, 0], [0, 0, sz])
    rect([half, cy, 0], [-1, 0, 0], [0, half, 0], [0, 0, sz])
    rect([0, cy - half, 0], [0, 1, 0], [half, 0, 0], [0, 0, sz])
    rect([0, cy + half, 0], [0, -1, 0], [half, 0, 0], [0, 0, sz])

    # central occluding block (its faces are the corridor inner walls)
    inner = radius - corridor / 2.0
    box([0, cy, 0], np.array([inner, inner, sz]))

    def in_corridor(p, margin):
        r = np.linalg.norm(p - np.array([0.0, cy]))
        return (
            inner + margin < r < half - margin
            and abs(r - radius) > 1.2 + margin  # clear of the path
        )

    for _ in range(n_boxes):
        h = rng.uniform(0.3, 1.0, 3)
        for _retry in range(50):
            p = rng.uniform([-half + 1, cy - half + 1],
                            [half - 1, cy + half - 1])
            if in_corridor(p, max(h[:2])):
                break
        else:
            continue
        box([p[0], p[1], rng.uniform(-sz + h[2], 0)], h)

    for _ in range(n_poles):
        h = np.array([0.04, 0.04, rng.uniform(0.8, sz * 0.9)])
        for _retry in range(50):
            p = rng.uniform([-half + 1, cy - half + 1],
                            [half - 1, cy + half - 1])
            if in_corridor(p, 0.1):
                break
        else:
            continue
        box([p[0], p[1], -sz + h[2]], h)

    return PlaneWorld(np.array(C), np.array(N), np.array(U), np.array(V))


def make_multiroom(seed: int = 0, height: float = 4.5,
                   n_boxes_per_room: int = 6, n_poles_per_room: int = 8
                   ) -> PlaneWorld:
    """Multi-room + corridor complex spanning ~51 x 40 m — the
    HILTI-shaped stress world (VERDICT #3): three cluttered rooms
    joined by two corridors, one of which (A->B, 22 m) is deliberately
    FEATURELESS (two parallel walls + floor + ceiling): inside it the
    point-to-plane problem is rank-deficient along the corridor axis,
    the ESIKF degeneracy detector must trip (min-eig Σnnᵀ,
    voxelslam.cpp:950-957) and the session resets — to be re-merged
    later by cross-session loop closure when the path re-enters a
    known room.

    Layout (door gaps are floor-to-ceiling, 3 m wide):
      room A  x∈[-7,7]   y∈[-6,6]
      corr AB x∈[7,29]   y∈[-1.5,1.5]   (degeneracy stretch)
      room B  x∈[29,43]  y∈[-6,6]
      corr BC x∈[34.5,37.5] y∈[6,20]    (cluttered with poles)
      room C  x∈[28,44]  y∈[20,34]
    """
    rng = np.random.default_rng(seed)
    sz = height / 2.0
    C, N, U, V = [], [], [], []

    def rect(c, n, u, v):
        C.append(np.asarray(c, float)); N.append(np.asarray(n, float))
        U.append(np.asarray(u, float)); V.append(np.asarray(v, float))

    def wall_x(x, y0, y1, nsign, gaps=()):
        """Wall in the y-z plane at `x` over y∈[y0,y1], normal ±x;
        `gaps` = (g0, g1) intervals left open (doors)."""
        segs = [(y0, y1)]
        for g0, g1 in gaps:
            nxt = []
            for a, b in segs:
                if g0 > a:
                    nxt.append((a, min(b, g0)))
                if g1 < b:
                    nxt.append((max(a, g1), b))
            segs = nxt
        for a, b in segs:
            if b - a < 1e-6:
                continue
            rect([x, (a + b) / 2, 0], [nsign, 0, 0],
                 [0, (b - a) / 2, 0], [0, 0, sz])

    def wall_y(y, x0, x1, nsign, gaps=()):
        segs = [(x0, x1)]
        for g0, g1 in gaps:
            nxt = []
            for a, b in segs:
                if g0 > a:
                    nxt.append((a, min(b, g0)))
                if g1 < b:
                    nxt.append((max(a, g1), b))
            segs = nxt
        for a, b in segs:
            if b - a < 1e-6:
                continue
            rect([(a + b) / 2, y, 0], [0, nsign, 0],
                 [(b - a) / 2, 0, 0], [0, 0, sz])

    def floor_ceil(x0, x1, y0, y1):
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        hx, hy = (x1 - x0) / 2, (y1 - y0) / 2
        rect([cx, cy, -sz], [0, 0, 1], [hx, 0, 0], [0, hy, 0])
        rect([cx, cy, sz], [0, 0, -1], [hx, 0, 0], [0, hy, 0])

    def box(c, h):
        for axis in range(3):
            for sgn in (-1, 1):
                n = np.zeros(3); n[axis] = sgn
                cc = np.asarray(c, float) + n * h[axis]
                ax1, ax2 = (axis + 1) % 3, (axis + 2) % 3
                u = np.zeros(3); u[ax1] = h[ax1]
                v = np.zeros(3); v[ax2] = h[ax2]
                rect(cc, n, u, v)

    door = (-1.5, 1.5)
    doorx = (34.5, 37.5)
    # room A
    wall_x(-7, -6, 6, 1)
    wall_x(7, -6, 6, -1, gaps=[door])
    wall_y(-6, -7, 7, 1)
    wall_y(6, -7, 7, -1)
    floor_ceil(-7, 7, -6, 6)
    # corridor A->B (featureless)
    wall_y(-1.5, 7, 29, 1)
    wall_y(1.5, 7, 29, -1)
    floor_ceil(7, 29, -1.5, 1.5)
    # room B
    wall_x(29, -6, 6, 1, gaps=[door])
    wall_x(43, -6, 6, -1)
    wall_y(-6, 29, 43, 1)
    wall_y(6, 29, 43, -1, gaps=[doorx])
    floor_ceil(29, 43, -6, 6)
    # corridor B->C (cluttered)
    wall_x(34.5, 6, 20, 1)
    wall_x(37.5, 6, 20, -1)
    floor_ceil(34.5, 37.5, 6, 20)
    for k in range(4):
        h = np.array([0.05, 0.05, rng.uniform(0.8, sz * 0.9)])
        side = 35.1 if k % 2 == 0 else 36.9
        box([side, 8.0 + 3.0 * k, -sz + h[2]], h)
    # room C
    wall_y(20, 28, 44, 1, gaps=[doorx])
    wall_y(34, 28, 44, -1)
    wall_x(28, 20, 34, 1)
    wall_x(44, 20, 34, -1)
    floor_ceil(28, 44, 20, 34)

    # Structural partitions that make the rooms DISTINGUISHABLE.
    # Rooms A and B were identical 14x12 rectangles: their
    # wall/floor/ceiling plane constellations alias perfectly, so a
    # BTC+ICP match of room B against room A is well-conditioned,
    # converged, and mostly-overlapping — a systematic false
    # relocalization no geometric gate can reject (measured: a
    # cross-session first link placed room B onto room A).  Real
    # buildings' rooms differ; give each room a differently-placed
    # floor-to-ceiling partition stub (off the waypoint route).
    def partition(x0, x1, y, half_th=0.06):
        rect([(x0 + x1) / 2, y + half_th, 0], [0, 1, 0],
             [(x1 - x0) / 2, 0, 0], [0, 0, sz])
        rect([(x0 + x1) / 2, y - half_th, 0], [0, -1, 0],
             [(x1 - x0) / 2, 0, 0], [0, 0, sz])
        rect([x0, y, 0], [-1, 0, 0], [0, half_th, 0], [0, 0, sz])
        rect([x1, y, 0], [1, 0, 0], [0, half_th, 0], [0, 0, sz])

    partition(-6.5, -4.8, 4.6)   # room A: NW corner stub
    partition(40.5, 42.5, -4.8)  # room B: SE corner stub
    partition(29.0, 31.5, 31.5)  # room C: NW stub

    # clutter in the rooms, clear of the path corridor through each
    rooms = [((-7, 7), (-6, 6), (0.0, 0.0)),
             ((29, 43), (-6, 6), (36.0, 0.0)),
             ((28, 44), (20, 34), (36.0, 27.0))]
    for (x0, x1), (y0, y1), (cx, cy) in rooms:
        for _ in range(n_boxes_per_room):
            h = rng.uniform(0.3, 1.1, 3)
            for _retry in range(40):
                p = rng.uniform([x0 + 1.5, y0 + 1.5], [x1 - 1.5, y1 - 1.5])
                if np.linalg.norm(p - [cx, cy]) > 3.2:
                    break
            else:
                continue
            box([p[0], p[1], rng.uniform(-sz + h[2], 0)], h)
        for _ in range(n_poles_per_room):
            h = np.array([0.05, 0.05, rng.uniform(0.8, sz * 0.9)])
            for _retry in range(40):
                p = rng.uniform([x0 + 1.0, y0 + 1.0], [x1 - 1.0, y1 - 1.0])
                if np.linalg.norm(p - [cx, cy]) > 3.2:
                    break
            else:
                continue
            box([p[0], p[1], -sz + h[2]], h)

    return PlaneWorld(np.array(C), np.array(N), np.array(U), np.array(V))


# ---------------------------------------------------------------- trajectory

def _so3_exp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _smootherstep(s):
    """Quintic C² ramp on [0, 1]."""
    s = np.clip(s, 0.0, 1.0)
    return s * s * s * (s * (6.0 * s - 15.0) + 10.0)


@dataclass
class Trajectory:
    """Smoothly ramped sinusoidal trajectory.

    Motion amplitude rises with a C² smootherstep over `ramp` seconds,
    so the IMU-static-initialization window (t ≲ 0) is genuinely quiet
    while later motion is aggressive.  `pos`/`rot` are closed form;
    `vel`/`acc`/`omega_body` come from high-order central differences
    of them (f64, step 1e-5 ⇒ ~1e-10 accuracy — far below any test
    tolerance), so any trajectory shape stays consistent by
    construction."""

    amp: np.ndarray = field(default_factory=lambda: np.array([2.0, 1.5, 0.3]))
    freq: np.ndarray = field(default_factory=lambda: np.array([0.11, 0.17, 0.23]))
    yaw_amp: float = 0.8
    yaw_freq: float = 0.13
    pitch_amp: float = 0.15
    pitch_freq: float = 0.19
    ramp: float = 0.0  # seconds of smooth spin-up (0 = always moving)
    t_start: float = 0.0  # motion is exactly zero before t_start
    # per-axis phase: amp·(sin(wt+φ) − sin(φ)) keeps pos(0)=0 for any
    # phase; freq=[f,f,·] + phase=[0,−π/2,·] traces a circle through
    # the origin (ring-circuit scenarios)
    phase: np.ndarray = field(default_factory=lambda: np.zeros(3))
    # constant yaw rate (rad/s, ramped) on top of the sinusoidal yaw —
    # 2π·freq_x makes the heading follow a circular path's tangent
    yaw_rate: float = 0.0

    def _r(self, t):
        if self.ramp <= 0:
            return 1.0 if self.t_start <= 0 else float(t >= self.t_start)
        return _smootherstep((t - self.t_start) / self.ramp)

    def pos(self, t):
        w = 2 * np.pi * self.freq
        return (
            self.amp
            * (np.sin(w * t + self.phase) - np.sin(self.phase))
            * self._r(t)
        )

    def _angles(self, t):
        wy = 2 * np.pi * self.yaw_freq
        wp = 2 * np.pi * self.pitch_freq
        r = self._r(t)
        yaw = (
            self.yaw_amp * np.sin(wy * t) + self.yaw_rate * (t - self.t_start)
        ) * r
        return yaw, self.pitch_amp * np.sin(wp * t) * r

    def rot(self, t):
        yaw, pitch = self._angles(t)
        Rz = _so3_exp(np.array([0, 0, yaw]))
        Ry = _so3_exp(np.array([0, pitch, 0]))
        return Rz @ Ry

    _H = 1e-5

    def vel(self, t):
        h = self._H
        return (self.pos(t + h) - self.pos(t - h)) / (2 * h)

    def acc(self, t):
        h = self._H
        return (self.pos(t + h) - 2 * self.pos(t) + self.pos(t - h)) / (h * h)

    def omega_body(self, t):
        """ω_body from Rᵀ Ṙ = hat(ω)."""
        h = self._H
        R = self.rot(t)
        dR = (self.rot(t + h) - self.rot(t - h)) / (2 * h)
        Om = R.T @ dR
        return np.array([Om[2, 1], Om[0, 2], Om[1, 0]])


@dataclass
class WaypointTrajectory:
    """C² waypoint path: uniform cubic B-spline over the control
    points (clamped ends), driven at ~constant speed with a
    smootherstep spin-up (quiet IMU-init window), yaw following the
    path tangent plus a small ramped wobble.  Same duck-typed API as
    `Trajectory` (pos/rot/vel/acc/omega_body), derivatives via the
    same high-order finite differences.

    Control points should be spaced roughly evenly (~2-4 m): the
    uniform spline's parametric speed is proportional to local
    spacing, so even spacing ≈ constant metric speed."""

    waypoints: np.ndarray  # (M, 3)
    speed: float = 1.2  # m/s average
    ramp: float = 1.5
    t_start: float = 1.0
    pitch_amp: float = 0.06
    pitch_freq: float = 0.27
    yaw_wobble: float = 0.12
    yaw_wobble_freq: float = 0.37

    def __post_init__(self):
        P = np.asarray(self.waypoints, float)
        # clamp ends (repeat) so the spline starts/ends AT the ends
        self._P = np.concatenate([P[:1], P[:1], P, P[-1:], P[-1:]])
        # average segment length -> spline-parameter rate for `speed`
        seg = np.linalg.norm(np.diff(P, axis=0), axis=1)
        self._rate = self.speed / max(float(np.mean(seg)), 1e-9)
        self._s_max = len(P) + 1.0  # param range of the padded spline

    def _spline(self, s):
        """Uniform cubic B-spline over the padded control points."""
        s = np.clip(s, 0.0, self._s_max - 1e-6)
        i = int(np.floor(s))
        u = s - i
        p = self._P[i : i + 4]
        b0 = (1 - u) ** 3 / 6.0
        b1 = (3 * u**3 - 6 * u**2 + 4) / 6.0
        b2 = (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6.0
        b3 = u**3 / 6.0
        return b0 * p[0] + b1 * p[1] + b2 * p[2] + b3 * p[3]

    def _s(self, t):
        tau = t - self.t_start
        if tau <= 0:
            return 0.0
        r = _smootherstep(tau / self.ramp) if self.ramp > 0 else 1.0
        return min(self._rate * tau * r, self._s_max - 1e-6)

    def pos(self, t):
        return self._spline(self._s(t))

    def _tangent(self, t):
        s = self._s(t)
        # progressively widen the stencil: at the clamped ends the
        # spline's first derivative vanishes (triple knot), and a
        # fixed tiny h would fall back to yaw=0 — making the ground-
        # truth ORIENTATION step discontinuously (≈45° here) the
        # instant motion starts.  The finite-difference gyro then
        # contains a near-delta spike no estimator can integrate,
        # poisoning the whole run.  A wider stencil returns the
        # departure/arrival direction instead, keeping rot(t)
        # continuous through standstill.
        for h in (1e-4, 1e-2, 0.1, 0.5):
            d = self._spline(s + h) - self._spline(max(s - h, 0.0))
            n = np.linalg.norm(d[:2])
            if n > 1e-9:
                return d[:2] / n
        return np.array([1.0, 0.0])

    def rot(self, t):
        tx, ty = self._tangent(t)
        yaw = np.arctan2(ty, tx)
        tau = t - self.t_start
        r = _smootherstep(tau / self.ramp) if self.ramp > 0 else 1.0
        if tau <= 0:
            r = 0.0
        yaw = yaw + self.yaw_wobble * np.sin(
            2 * np.pi * self.yaw_wobble_freq * t
        ) * r
        pitch = self.pitch_amp * np.sin(
            2 * np.pi * self.pitch_freq * t
        ) * r
        Rz = _so3_exp(np.array([0, 0, yaw]))
        Ry = _so3_exp(np.array([0, pitch, 0]))
        return Rz @ Ry

    _H = 1e-5

    def vel(self, t):
        h = self._H
        return (self.pos(t + h) - self.pos(t - h)) / (2 * h)

    def acc(self, t):
        h = self._H
        return (self.pos(t + h) - 2 * self.pos(t) + self.pos(t - h)) / (h * h)

    def omega_body(self, t):
        h = self._H
        R = self.rot(t)
        dR = (self.rot(t + h) - self.rot(t - h)) / (2 * h)
        Om = R.T @ dR
        return np.array([Om[2, 1], Om[0, 2], Om[1, 0]])


def stress_waypoints() -> np.ndarray:
    """The multi-room stress route: wander room A, traverse the
    featureless corridor (degeneracy -> session reset), tour room B,
    corridor up to room C, loop C, return through B to A — >= 3 true
    revisits (B twice, A at start/end, C loop) over ~130 m."""
    pts = []

    def seg(path):
        pts.extend(path)

    # room A loop (start at origin, quiet)
    seg([(0, 0), (2, 2), (4, 0), (2, -3), (-2, -3), (-4, 0),
         (-2, 3), (1, 3), (3, 0.5)])
    # corridor A->B (featureless stretch)
    seg([(7, 0), (10, 0), (13, 0), (16, 0), (19, 0), (22, 0),
         (25, 0), (28, 0)])
    # room B tour
    seg([(31, 0), (34, -2.5), (38, -3.5), (41, -1), (40, 2), (37, 3)])
    # corridor B->C
    seg([(36, 6), (36, 9), (36, 12), (36, 15), (36, 18)])
    # room C loop
    seg([(36, 22), (39, 24), (41, 27), (39, 31), (35, 32), (31, 30),
         (30, 26), (33, 23)])
    # back down the corridor, through B, back to A
    seg([(36, 19), (36, 15), (36, 11), (36, 7)])
    seg([(37, 3), (39, 0), (36, -2), (32, -1)])
    seg([(28, 0), (24, 0), (20, 0), (16, 0), (12, 0), (8, 0)])
    # room A re-entry + final loop
    seg([(4, 1), (1, 3), (-2, 2), (-3, -1), (0, -2), (2, 0)])
    out = np.zeros((len(pts), 3))
    out[:, :2] = np.asarray(pts, float)
    return out


# ---------------------------------------------------------------- raycast

def raycast(world: PlaneWorld, origin: np.ndarray, dirs: np.ndarray,
            max_range: float = 60.0, min_range: float = 0.3) -> np.ndarray:
    """Nearest bounded-plane hit per ray.  origin (3,), dirs (K,3) unit.
    Returns (K,) ranges (inf when no hit)."""
    d_n = dirs @ world.normal.T  # (K, M)
    co = (world.center - origin)  # (M, 3)
    num = np.einsum("mi,mi->m", co, world.normal)  # (M,)
    with np.errstate(divide="ignore", invalid="ignore"):
        tt = num[None, :] / d_n  # (K, M)
    tt = np.where((np.abs(d_n) > 1e-9) & (tt > min_range) & (tt < max_range), tt, np.inf)
    # bounded-rectangle test
    hit = origin[None, None, :] + tt[..., None] * dirs[:, None, :]  # (K, M, 3)
    rel = hit - world.center[None, :, :]
    uu = np.einsum("mi,mi->m", world.u, world.u)
    vv = np.einsum("mi,mi->m", world.v, world.v)
    pu = np.abs(np.einsum("kmi,mi->km", rel, world.u)) / np.maximum(uu, 1e-12)
    pv = np.abs(np.einsum("kmi,mi->km", rel, world.v)) / np.maximum(vv, 1e-12)
    tt = np.where((pu <= 1.0) & (pv <= 1.0), tt, np.inf)
    return tt.min(axis=1)


# ---------------------------------------------------------------- simulate

@dataclass
class SynthScan:
    t_begin: float  # scan begin time (s)
    t_end: float
    points: np.ndarray  # (K, 3) LiDAR-frame points at acquisition time
    offsets: np.ndarray  # (K,) per-point time offsets from t_begin (s)


@dataclass
class SynthData:
    scans: List[SynthScan]
    imu_t: np.ndarray  # (M,) timestamps
    imu_gyr: np.ndarray  # (M, 3)
    imu_acc: np.ndarray  # (M, 3)
    gt_t: np.ndarray  # ground-truth poses at scan ends
    gt_R: np.ndarray
    gt_p: np.ndarray
    gravity: np.ndarray


def lidar_dirs(n_lines: int = 16, n_cols: int = 64,
               fov_v: float = 35.0, fov_h: float = 70.0) -> np.ndarray:
    """A forward-looking grid scan pattern (Avia-like FoV)."""
    el = np.deg2rad(np.linspace(-fov_v / 2, fov_v / 2, n_lines))
    az = np.deg2rad(np.linspace(-fov_h / 2, fov_h / 2, n_cols))
    el, az = np.meshgrid(el, az, indexing="ij")
    d = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1)
    return d.reshape(-1, 3)


def simulate(n_scans: int = 20, scan_hz: float = 10.0, imu_hz: float = 200.0,
             world: PlaneWorld | None = None, traj: Trajectory | None = None,
             dirs: np.ndarray | None = None,
             gyr_noise: float = 0.0, acc_noise: float = 0.0,
             gyr_bias=(0.0, 0.0, 0.0), acc_bias=(0.0, 0.0, 0.0),
             gyr_scale: float = 1.0,
             range_noise: float = 0.0, range_scale: float = 1.0,
             range_noise_rel: float = 0.0,  # + σ ∝ range (real LiDAR)
             outlier_frac: float = 0.0,  # spurious short returns
             max_range: float = 60.0,  # sensor range cap
             gravity: float = 9.8,
             extrinsic_R: np.ndarray | None = None,
             extrinsic_t: np.ndarray | None = None,
             t0: float = 0.5, seed: int = 1) -> SynthData:
    """Simulate scans+IMU along the trajectory.

    IMU: gyr = ω_body + bg, acc = Rᵀ(a_w − g_w) + ba  (g_w = −g ez... the
    estimator's convention is x.g ≈ world gravity acceleration vector,
    i.e. pointing down, and acc measures Rᵀ(a_w − x.g)).
    LiDAR points are emitted in the LiDAR frame (extrinsics applied) at
    their true acquisition time, uniformly spread across the scan.
    """
    rng = np.random.default_rng(seed)
    world = world or make_room()
    traj = traj or Trajectory()
    dirs = dirs if dirs is not None else lidar_dirs()
    eR = np.eye(3) if extrinsic_R is None else extrinsic_R
    et = np.zeros(3) if extrinsic_t is None else extrinsic_t
    g_w = np.array([0.0, 0.0, -gravity])
    bg = np.asarray(gyr_bias, float)
    ba = np.asarray(acc_bias, float)

    dt_scan = 1.0 / scan_hz
    # IMU stream covering [t0 - dt, t_end + dt]
    t_imu0 = t0 - 0.45
    t_end_all = t0 + n_scans * dt_scan + 0.05
    imu_t = np.arange(t_imu0, t_end_all, 1.0 / imu_hz)
    # gyr_scale models a scale-factor calibration error — unlike a
    # bias it is NOT estimated by the filter, so heading error (and
    # position drift) accumulates with total rotation: the organic
    # drift source for loop-closure/PGO exercises
    imu_gyr = gyr_scale * np.stack([traj.omega_body(t) for t in imu_t]) + bg
    imu_acc = np.stack(
        [traj.rot(t).T @ (traj.acc(t) - g_w) for t in imu_t]
    ) + ba
    if gyr_noise > 0:
        imu_gyr = imu_gyr + rng.normal(0, gyr_noise, imu_gyr.shape)
    if acc_noise > 0:
        imu_acc = imu_acc + rng.normal(0, acc_noise, imu_acc.shape)

    scans, gt_R, gt_p, gt_t = [], [], [], []
    K = dirs.shape[0]
    for s in range(n_scans):
        tb = t0 + s * dt_scan
        te = tb + dt_scan
        offs = np.linspace(0.0, dt_scan, K, endpoint=False)
        # ray-cast each point at its own acquisition time from the
        # LiDAR's true world pose at that time
        pts = np.zeros((K, 3))
        # group points into a few time buckets for speed
        n_buckets = 10
        for b in range(n_buckets):
            idx = np.arange(K)[(offs * n_buckets / dt_scan).astype(int) == b]
            if idx.size == 0:
                continue
            tm = tb + (b + 0.5) * dt_scan / n_buckets
            offs[idx] = tm - tb
            R_w = traj.rot(tm)
            p_w = traj.pos(tm)
            # LiDAR pose = IMU pose ∘ extrinsics
            R_l = R_w @ eR
            p_l = R_w @ et + p_w
            d_w = (R_l @ dirs[idx].T).T
            rr = raycast(world, p_l, d_w, max_range=max_range)
            ok = np.isfinite(rr)
            if range_noise > 0 or range_noise_rel > 0:
                sig = range_noise + range_noise_rel * np.where(ok, rr, 0.0)
                rr = rr + rng.normal(0, 1, rr.shape) * sig
            if outlier_frac > 0:
                # dust/glass-style spurious short returns: a fraction
                # of rays report a hit well before the surface
                sel = ok & (rng.random(rr.shape) < outlier_frac)
                rr = np.where(
                    sel, rr * rng.uniform(0.15, 0.9, rr.shape), rr
                )
            # range scale error (real lidar mis-calibration): the
            # traversed geometry measures range_scale x larger, which
            # lidar matching cannot self-correct — odometry drift
            # grows with distance and only loop closure recovers it
            rr = rr * range_scale
            pts[idx] = np.where(ok[:, None], dirs[idx] * rr[:, None], np.nan)
        valid = np.isfinite(pts).all(axis=1)
        scans.append(SynthScan(tb, te, pts[valid], offs[valid]))
        gt_t.append(te)
        gt_R.append(traj.rot(te))
        gt_p.append(traj.pos(te))

    return SynthData(
        scans=scans,
        imu_t=imu_t,
        imu_gyr=imu_gyr,
        imu_acc=imu_acc,
        gt_t=np.array(gt_t),
        gt_R=np.stack(gt_R),
        gt_p=np.stack(gt_p),
        gravity=g_w,
    )
