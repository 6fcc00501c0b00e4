"""Voxel map tests: hash table semantics, plane recovery from
synthetic scans, match gating, marginalization cap, eviction."""

import numpy as np
import jax
import jax.numpy as jnp

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.map import hashmap, voxelmap
from voxelslam_tpu.map.voxelmap import MapParams

PARAMS = MapParams(capacity=1 << 14, voxel_size=1.0)


class TestHashmap:
    def test_insert_lookup_roundtrip(self):
        rng = np.random.default_rng(0)
        coords = rng.integers(-50, 50, size=(500, 3)).astype(np.int32)
        levels = rng.integers(0, 3, size=500).astype(np.int32)
        keys = hashmap.empty_keys(1 << 12)
        keys, slots, created, ovf = hashmap.insert(
            keys, jnp.asarray(coords), jnp.asarray(levels),
            jnp.ones(500, bool), 16,
        )
        assert int(jnp.sum(ovf)) == 0
        slots2 = hashmap.lookup(keys, jnp.asarray(coords), jnp.asarray(levels), 16)
        np.testing.assert_array_equal(np.asarray(slots), np.asarray(slots2))
        # duplicates map to the same slot
        keys, slots3, created3, _ = hashmap.insert(
            keys, jnp.asarray(coords), jnp.asarray(levels),
            jnp.ones(500, bool), 16,
        )
        np.testing.assert_array_equal(np.asarray(slots), np.asarray(slots3))
        assert not bool(jnp.any(created3))

    def test_batch_duplicates_one_slot(self):
        """Many identical keys in one batch get exactly one slot."""
        coords = jnp.tile(jnp.array([[3, -4, 5]], jnp.int32), (64, 1))
        levels = jnp.zeros(64, jnp.int32)
        keys = hashmap.empty_keys(1 << 10)
        keys, slots, created, ovf = hashmap.insert(keys, coords, levels,
                                                   jnp.ones(64, bool), 8)
        assert len(np.unique(np.asarray(slots))) == 1
        assert int(jnp.sum(created)) == 1
        assert int(hashmap.stats(keys).occupied) == 1

    def test_lookup_missing(self):
        keys = hashmap.empty_keys(1 << 10)
        slots = hashmap.lookup(
            keys, jnp.array([[1, 2, 3]], jnp.int32), jnp.array([0], jnp.int32), 8
        )
        assert int(slots[0]) == -1

    def test_invalid_queries_untouched(self):
        keys = hashmap.empty_keys(1 << 10)
        keys, slots, _, _ = hashmap.insert(
            keys, jnp.array([[1, 2, 3]], jnp.int32), jnp.array([0], jnp.int32),
            jnp.array([False]), 8,
        )
        assert int(slots[0]) == -1
        assert int(hashmap.stats(keys).occupied) == 0


def _scatter_scan(vm, pts, params=PARAMS, W=1):
    """Insert one identity-pose scan as the whole window."""
    N = pts.shape[0]
    pts_b = jnp.asarray(pts, jnp.float32)[None]
    var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-4, (1, N, 3, 3))
    R = jnp.eye(3, dtype=jnp.float32)[None]
    p = jnp.zeros((1, 3), jnp.float32)
    valid = jnp.ones((1, N), bool)
    return voxelmap.scatter(vm, pts_b, var, R, p, valid, jnp.float32(0), params)[:3]


class TestVoxelMapPlanes:
    def test_plane_recovery(self):
        """Points on the synthetic room's floor produce a plane voxel
        with the right normal."""
        rng = np.random.default_rng(1)
        # floor at z=-2: points in one voxel (0..1, 0..1)
        pts = np.stack(
            [rng.uniform(0, 1, 400), rng.uniform(0, 1, 400),
             np.full(400, -2.0) + rng.normal(0, 0.005, 400)], axis=-1
        )
        vm = voxelmap.empty(PARAMS, 1)
        vm, scratch, ovf = _scatter_scan(vm, pts)
        assert int(ovf) == 0
        vm, _ = voxelmap.recut(vm, scratch, PARAMS)
        pv = np.asarray(vm.plane_valid)
        assert pv.sum() >= 1
        nrm = np.asarray(vm.plane_n)[pv]
        assert (np.abs(nrm[:, 2]) > 0.99).all()
        # eigenvalues: λ0 tiny
        eig = np.asarray(vm.eig)[pv]
        assert (eig[:, 0] < 1e-3).all()

    def test_subdivision_on_nonplanar(self):
        """A voxel filled with an edge (two walls) fails the plane test
        and subdivides; children refit planes on the next pass."""
        rng = np.random.default_rng(2)
        n = 300
        wall_a = np.stack([rng.uniform(0, 1, n), np.full(n, 0.5),
                           rng.uniform(0, 1, n)], -1)
        wall_b = np.stack([np.full(n, 0.5), rng.uniform(0, 1, n),
                           rng.uniform(0, 1, n)], -1)
        pts = np.concatenate([wall_a, wall_b])
        vm = voxelmap.empty(PARAMS, 1)
        vm, scratch, _ = _scatter_scan(vm, pts)
        vm, _ = voxelmap.recut(vm, scratch, PARAMS)
        st = np.asarray(vm.state)
        occ = np.asarray(vm.keys)[:, 3]
        assert (st[(occ == 0)] == 1).sum() >= 1  # root subdivided
        # second pass routes points into children at level 1
        vm, scratch, _ = _scatter_scan(vm, pts)
        vm, _ = voxelmap.recut(vm, scratch, PARAMS)
        lvl1 = (np.asarray(vm.keys)[:, 3] == 1)
        assert lvl1.sum() >= 2
        assert np.asarray(vm.plane_valid)[lvl1].sum() >= 1

    def test_match_on_plane(self):
        rng = np.random.default_rng(3)
        pts = np.stack(
            [rng.uniform(0, 1, 400), rng.uniform(0, 1, 400),
             np.full(400, 0.3) + rng.normal(0, 0.003, 400)], axis=-1
        )
        vm = voxelmap.empty(PARAMS, 1)
        vm, scratch, _ = _scatter_scan(vm, pts)
        vm, _ = voxelmap.recut(vm, scratch, PARAMS)
        q = jnp.asarray([[0.5, 0.5, 0.3], [0.5, 0.5, 0.9]], jnp.float32)
        var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-6, (2, 3, 3))
        res = voxelmap.match(vm, q, var, jnp.ones(2, bool), PARAMS)
        ok = np.asarray(res.valid)
        assert ok[0]  # on the plane: matched
        assert not ok[1]  # 0.6 m off the plane: Mahalanobis-gated out
        assert abs(float(res.dist[0])) < 0.02

    def test_marginalize_then_plane_persists(self):
        """After folding the scan into fixed moments, the plane still
        fits with no window points (mid-term association path)."""
        rng = np.random.default_rng(4)
        pts = np.stack(
            [rng.uniform(0, 1, 300), rng.uniform(0, 1, 300),
             np.full(300, 0.2) + rng.normal(0, 0.003, 300)], axis=-1
        )
        vm = voxelmap.empty(PARAMS, 1)
        vm, scratch, _ = _scatter_scan(vm, pts)
        vm, _ = voxelmap.recut(vm, scratch, PARAMS)
        n_before = float(jnp.sum(vm.fix_n))
        var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-4, (300, 3, 3))
        vm = voxelmap.marginalize(
            vm, jnp.asarray(pts, jnp.float32), var,
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.ones(300, bool), PARAMS,
        )
        assert float(jnp.sum(vm.fix_n)) > n_before
        # plane still matchable with empty window
        q = jnp.asarray([[0.5, 0.5, 0.2]], jnp.float32)
        var1 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-6, (1, 3, 3))
        res = voxelmap.match(vm, q, var1, jnp.ones(1, bool), PARAMS)
        assert bool(res.valid[0])

    def test_marginalize_cap(self):
        """fix_n never grows past max_points + one scan's worth; capped
        voxels discard new history (reference max_points semantics)."""
        params = PARAMS._replace(max_points=50)
        rng = np.random.default_rng(5)
        pts = np.stack(
            [rng.uniform(0, 1, 200), rng.uniform(0, 1, 200),
             np.full(200, 0.2) + rng.normal(0, 0.003, 200)], axis=-1
        )
        vm = voxelmap.empty(params, 1)
        vm, scratch, _ = _scatter_scan(vm, pts, params)
        vm, _ = voxelmap.recut(vm, scratch, params)
        var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-4, (200, 3, 3))
        args = (jnp.asarray(pts, jnp.float32), var,
                jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
                jnp.ones(200, bool), params)
        vm = voxelmap.marginalize(vm, *args)
        n1 = float(jnp.max(vm.fix_n))
        vm = voxelmap.marginalize(vm, *args)  # cap already reached
        n2 = float(jnp.max(vm.fix_n))
        assert n1 >= 50
        assert n2 == n1  # discarded

    def test_evict(self):
        rng = np.random.default_rng(6)
        pts = rng.uniform(0, 5, size=(500, 3))
        vm = voxelmap.empty(PARAMS, 1)
        vm, scratch, _ = _scatter_scan(vm, pts)
        occ0 = int(hashmap.stats(vm.keys).occupied)
        assert occ0 > 0
        # voxels holding live (un-marginalized) window clusters are
        # never dropped, however stale their travel stamp
        vm2, _ = voxelmap.evict(vm, jnp.float32(1000.0), PARAMS)
        assert int(hashmap.stats(vm2.keys).occupied) == occ0
        # once the window content is gone, stale voxels evict
        vm_nowin = vm._replace(
            win=vm.win.at[:, :, voxelmap.CL_N].set(0.0)
        )
        vm2, _ = voxelmap.evict(vm_nowin, jnp.float32(1000.0), PARAMS)
        assert int(hashmap.stats(vm2.keys).occupied) == 0
        vm3, _ = voxelmap.evict(vm, jnp.float32(100.0), PARAMS)
        assert int(hashmap.stats(vm3.keys).occupied) == occ0
        # surviving entries still resolve
        coord = np.asarray(vm.keys)[np.asarray(vm.keys)[:, 3] >= 0]
        slots = hashmap.lookup(
            vm3.keys, jnp.asarray(coord[:, :3]), jnp.asarray(coord[:, 3]), 16
        )
        assert (np.asarray(slots) >= 0).all()


class TestReroute:
    def test_reroute_moves_points_to_children(self):
        """Inline subdivision re-route (reference subdivide()
        redistribution, voxel_map.hpp:1150-1194): after a voxel fails
        the plane gate and subdivides, reroute_subdivided must move
        every resident window point into the correct level-1 child
        with exact cluster moments, and marginalize_column must fold
        only the children (parent skipped via the state gate)."""
        rng = np.random.default_rng(3)
        W, N = 2, 240
        C = PARAMS.capacity
        # non-planar cloud inside ONE voxel -> fails plane gate
        pts = rng.uniform(0.05, 0.95, (N, 3)).astype(np.float32)
        var = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 1e-4,
                               (N, 3, 3))
        R = jnp.eye(3, dtype=jnp.float32)
        p = jnp.zeros(3, jnp.float32)
        mask = jnp.ones((N,), bool)
        vm = voxelmap.empty(PARAMS, W)
        vm, ovf, touched, slot_new = voxelmap.push_scan(
            vm, jnp.asarray(pts), var, R, p, mask, jnp.int32(0),
            jnp.float32(0), PARAMS,
        )
        Rw = jnp.broadcast_to(R, (W, 3, 3))
        pw = jnp.zeros((W, 3), jnp.float32)
        vm, n_sub, add_n = voxelmap.recut_touched(
            vm, Rw, pw, touched, PARAMS, size=512
        )
        assert int(n_sub) >= 1

        win_pts = jnp.zeros((W, N, 3), jnp.float32).at[0].set(
            jnp.asarray(pts)
        )
        win_var = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32) * 1e-4, (W, N, 3, 3)
        )
        win_mask = jnp.zeros((W, N), bool).at[0].set(True)
        slot_pt = jnp.full((W, N), C, jnp.int32).at[0].set(slot_new)
        col_of_w = jnp.arange(W, dtype=jnp.int32)
        vm2, slot2, child_touch, n_left = voxelmap.reroute_subdivided(
            vm, win_pts, win_mask, slot_pt, Rw, pw, col_of_w,
            jnp.float32(0), PARAMS, 512, pending=n_sub,
        )
        assert int(n_left) == 0
        # every point now records a level-1 slot
        s0 = np.asarray(slot2[0])
        assert (s0 < C).all()
        lv = np.asarray(vm2.keys)[s0, 3]
        assert (lv == 1).all()
        # per-child cluster moments exactly match a direct grouping
        child_coord = np.floor(pts / 0.5).astype(np.int64)
        keysv = np.asarray(vm2.keys)
        winn = np.asarray(vm2.win_n)
        winv = np.asarray(vm2.win_v)
        seen = set()
        for s in np.unique(s0):
            cx, cy, cz, clv = keysv[s]
            grp = (child_coord == np.array([cx, cy, cz])).all(axis=1)
            assert clv == 1
            np.testing.assert_allclose(winn[s, 0], grp.sum())
            np.testing.assert_allclose(
                winv[s, 0], pts[grp].sum(axis=0), rtol=1e-5, atol=1e-4
            )
            seen.add((cx, cy, cz))
        assert len(seen) >= 2
        # marginalize folds ONLY the children (parent state==1 skipped)
        vm3 = voxelmap.marginalize_column(
            vm2, R, p, jnp.int32(0), PARAMS, size=512
        )
        np.testing.assert_allclose(float(jnp.sum(vm3.fix_n)), N)


class TestIncrementalPush:
    """The incremental per-scan path (push_scan + window_sums +
    marginalize_column + slide_window_cols) must agree with the full
    window rebuild (scatter) on identical content."""

    def _window(self, W=4, N=300, seed=11):
        rng = np.random.default_rng(seed)
        pts, Rs, ps = [], [], []
        for w in range(W):
            # plane points at z=0 in world; pose offsets per scan
            q = rng.uniform(-3, 3, size=(N, 3)).astype(np.float32)
            q[:, 2] = 0.01 * rng.standard_normal(N).astype(np.float32)
            ang = 0.1 * w
            R = np.array(
                [[np.cos(ang), -np.sin(ang), 0],
                 [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32
            )
            p = np.array([0.3 * w, -0.2 * w, 0.05 * w], np.float32)
            pts.append((q - p) @ R)  # body frame so world pts = q
            Rs.append(R)
            ps.append(p)
        pts = jnp.asarray(np.stack(pts))
        Rs = jnp.asarray(np.stack(Rs))
        ps = jnp.asarray(np.stack(ps))
        var = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32) * 1e-4, (W, N, 3, 3)
        )
        valid = jnp.ones((W, N), bool)
        return pts, var, Rs, ps, valid

    @staticmethod
    def _by_key(vm, scratch):
        keys = np.asarray(vm.keys)
        act = keys[:, 3] >= 0
        out = {}
        for s in np.where(act)[0]:
            out[tuple(keys[s])] = (
                np.asarray(scratch.add_P[s]),
                np.asarray(scratch.add_v[s]),
                float(scratch.add_n[s]),
            )
        return out

    def test_push_matches_scatter(self):
        W = 4
        pts, var, Rs, ps, valid = self._window(W)
        vm_a = voxelmap.empty(PARAMS, W)
        vm_a, scr_a, _, _ = voxelmap.scatter(
            vm_a, pts, var, Rs, ps, valid, jnp.float32(0), PARAMS
        )
        vm_b = voxelmap.empty(PARAMS, W)
        for w in range(W):
            vm_b, ovf, _, _ = voxelmap.push_scan(
                vm_b, pts[w], var[w], Rs[w], ps[w], valid[w],
                jnp.int32(w), jnp.float32(0), PARAMS,
            )
            assert int(ovf) == 0
        scr_b = voxelmap.window_sums(vm_b, Rs, ps, PARAMS)

        a, b = self._by_key(vm_a, scr_a), self._by_key(vm_b, scr_b)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k][2], b[k][2])  # counts
            np.testing.assert_allclose(a[k][1], b[k][1], atol=1e-4)
            np.testing.assert_allclose(a[k][0], b[k][0], atol=2e-3)

    def test_ring_lap_overwrites_stale_column(self):
        """clear_window_col only invalidates win_n; a later push into
        the same ring column must fully overwrite the stale cluster
        rows (and consumers must see exactly the new scan)."""
        W = 2
        pts, var, Rs, ps, valid = self._window(W)
        vm = voxelmap.empty(PARAMS, W)
        vm, _, _, _ = voxelmap.push_scan(
            vm, pts[0], var[0], Rs[0], ps[0], valid[0],
            jnp.int32(0), jnp.float32(0), PARAMS,
        )
        vm = voxelmap.clear_window_col(vm, jnp.int32(0))
        assert float(jnp.sum(vm.win_n[:, 0])) == 0.0
        # ring lap: scan 1 lands in the SAME column
        vm, _, _, _ = voxelmap.push_scan(
            vm, pts[1], var[1], Rs[1], ps[1], valid[1],
            jnp.int32(0), jnp.float32(0), PARAMS,
        )
        scr = voxelmap.window_sums(
            vm, Rs[1:2].repeat(W, 0), ps[1:2].repeat(W, 0), PARAMS
        )
        # reference: fresh map with only scan 1
        vm_r = voxelmap.empty(PARAMS, W)
        vm_r, _, _, _ = voxelmap.push_scan(
            vm_r, pts[1], var[1], Rs[1], ps[1], valid[1],
            jnp.int32(0), jnp.float32(0), PARAMS,
        )
        scr_r = voxelmap.window_sums(
            vm_r, Rs[1:2].repeat(W, 0), ps[1:2].repeat(W, 0), PARAMS
        )
        a = self._by_key(vm, scr)
        b = self._by_key(vm_r, scr_r)
        # every ref voxel matches exactly; extra (scan-0) voxels empty
        for k, vb in b.items():
            np.testing.assert_allclose(a[k][2], vb[2])
            np.testing.assert_allclose(a[k][1], vb[1], atol=1e-4)
            np.testing.assert_allclose(a[k][0], vb[0], atol=2e-3)
        for k in set(a) - set(b):
            assert a[k][2] == 0.0

    def test_marginalize_column_conserves_content(self):
        W = 4
        pts, var, Rs, ps, valid = self._window(W)
        vm = voxelmap.empty(PARAMS, W)
        for w in range(W):
            vm, _, _, _ = voxelmap.push_scan(
                vm, pts[w], var[w], Rs[w], ps[w], valid[w],
                jnp.int32(w), jnp.float32(0), PARAMS,
            )
        scr0 = voxelmap.window_sums(vm, Rs, ps, PARAMS)
        tot0_P = np.asarray(vm.fix_P + scr0.add_P)
        tot0_v = np.asarray(vm.fix_v + scr0.add_v)
        tot0_n = np.asarray(vm.fix_n + scr0.add_n)

        vm = voxelmap.marginalize_column(vm, Rs[0], ps[0], jnp.int32(0), PARAMS)
        vm = voxelmap.slide_window_cols(vm)
        # window arrays slid too: poses roll left, last repeats (unused)
        Rs2 = jnp.concatenate([Rs[1:], Rs[-1:]])
        ps2 = jnp.concatenate([ps[1:], ps[-1:]])
        scr1 = voxelmap.window_sums(vm, Rs2, ps2, PARAMS)
        np.testing.assert_allclose(
            np.asarray(vm.fix_n + scr1.add_n), tot0_n
        )
        np.testing.assert_allclose(
            np.asarray(vm.fix_v + scr1.add_v), tot0_v, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(vm.fix_P + scr1.add_P), tot0_P, atol=2e-3
        )
        # the last window column is empty after the slide
        assert float(jnp.sum(vm.win_n[:, -1])) == 0.0


def test_pvec_downsample_matches_numpy():
    """down_sampling_pvec parity (voxel_map.hpp:24-65): centroid AND
    averaged covariance per voxel must match a direct numpy groupby."""
    import numpy as np
    import jax.numpy as jnp
    from voxelslam_tpu.ops import downsample
    from voxelslam_tpu.core import hashing

    rng = np.random.default_rng(5)
    N, M = 400, 256
    pts = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    var = rng.uniform(0.1, 1.0, (N, 3, 3)).astype(np.float32)
    var = (var + var.transpose(0, 2, 1)) / 2
    mask = rng.random(N) < 0.9
    size = 1.0
    ds, var_out = downsample.voxel_average_pvec(
        jnp.asarray(pts), jnp.asarray(var), jnp.asarray(mask), size, M
    )
    ds_pts = np.asarray(ds.pts)[np.asarray(ds.mask)]
    ds_var = np.asarray(var_out)[np.asarray(ds.mask)]
    # numpy reference
    ids = np.floor(pts[mask] / size).astype(np.int64)
    groups = {}
    for k, p, v in zip(map(tuple, ids), pts[mask], var[mask]):
        groups.setdefault(k, []).append((p, v))
    assert len(ds_pts) == len(groups)
    got = {tuple(np.round(p, 3)): v for p, v in zip(ds_pts, ds_var)}
    for members in groups.values():
        pm = np.mean([p for p, _ in members], axis=0)
        vm = np.mean([v for _, v in members], axis=0)
        kq = tuple(np.round(pm, 3))
        assert kq in got, kq
        np.testing.assert_allclose(got[kq], vm, atol=1e-4)


def test_voxel_average_hash_matches_sort():
    """The sort-free hash downsample (ops/downsample.voxel_average)
    must produce the same SET of (centroid, count>0) cells as the
    sort + segment-reduce path it replaced (voxel_average_sort) —
    row order differs by design (table order vs hash-sorted order)."""
    import numpy as np
    import jax.numpy as jnp
    from voxelslam_tpu.ops import downsample

    rng = np.random.default_rng(11)
    for N, m_out, vs in [(8192, 8192, 0.25), (1000, 1024, 0.5),
                         (512, 512, 2.0)]:
        pts = rng.uniform(-20, 20, (N, 3)).astype(np.float32)
        # cluster half the points into shared cells
        pts[N // 2:] = pts[: N - N // 2] + rng.normal(
            0, 0.03, (N - N // 2, 3)
        ).astype(np.float32)
        mask = rng.random(N) > 0.1
        a = downsample.voxel_average_sort(
            jnp.asarray(pts), jnp.asarray(mask), vs, m_out
        )
        b = downsample.voxel_average_hash(
            jnp.asarray(pts), jnp.asarray(mask), vs, m_out
        )
        assert int(a.n_voxels) == int(b.n_voxels)
        pa = np.asarray(a.pts)[np.asarray(a.mask)]
        pb = np.asarray(b.pts)[np.asarray(b.mask)]
        ka = pa[np.lexsort(pa.T)]
        kb = pb[np.lexsort(pb.T)]
        assert ka.shape == kb.shape
        np.testing.assert_allclose(ka, kb, atol=1e-5)
    # all-invalid input: empty output, no NaNs
    z = downsample.voxel_average_hash(
        jnp.zeros((64, 3), jnp.float32), jnp.zeros((64,), bool), 0.5, 32
    )
    assert int(z.n_voxels) == 0 and not bool(np.asarray(z.mask).any())
    assert np.isfinite(np.asarray(z.pts)).all()
