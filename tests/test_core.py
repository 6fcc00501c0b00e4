"""Unit tests for the core math layer vs closed forms / scipy."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelslam_tpu.core import so3, state, cluster, hashing
from voxelslam_tpu.ops import eigh3


class TestSO3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 3)) * 1.5
        # keep the generic block below the near-pi switchover
        nrm = np.linalg.norm(w, axis=-1, keepdims=True)
        w = np.where(nrm > 2.8, w * 2.8 / nrm, w)
        # include near-pi rotations explicitly
        axes = rng.normal(size=(8, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        w = np.concatenate([w, axes * (np.pi - 1e-3)], axis=0)
        R = so3.exp(jnp.asarray(w, jnp.float32))
        w2 = so3.log(R)
        R2 = np.asarray(so3.exp(w2))
        R = np.asarray(R)
        np.testing.assert_allclose(R2[:64], R[:64], atol=5e-4)
        # near pi the f32 axis extraction loses ~sqrt(eps); looser gate
        np.testing.assert_allclose(R2[64:], R[64:], atol=1e-2)

    def test_exp_small_angle(self):
        w = jnp.array([1e-9, -2e-9, 1e-10], jnp.float32)
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)

    def test_exp_orthogonal(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(32, 3)) * 2, jnp.float32)
        R = so3.exp(w)
        RtR = jnp.swapaxes(R, -1, -2) @ R
        np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=5e-4)
        det = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(det, 1.0, atol=5e-4)

    def test_jr_identity(self):
        """exp(w + d) ≈ exp(w) exp(jr(w) d) for small d."""
        rng = np.random.default_rng(2)
        for _ in range(10):
            w = rng.normal(size=3)
            d = rng.normal(size=3) * 1e-4
            lhs = so3.exp(jnp.asarray(w + d, jnp.float32))
            rhs = so3.exp(jnp.asarray(w, jnp.float32)) @ so3.exp(
                so3.jr(jnp.asarray(w, jnp.float32)) @ jnp.asarray(d, jnp.float32)
            )
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_jr_inv(self):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        J = so3.jr(w)
        Ji = so3.jr_inv(w)
        np.testing.assert_allclose(
            np.asarray(J @ Ji), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5
        )

    def test_hat_vee(self):
        v = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(np.asarray(so3.vee(so3.hat(v))), np.asarray(v))

    def test_orthonormalize(self):
        rng = np.random.default_rng(4)
        R = so3.exp(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
        Rp = R + jnp.asarray(rng.normal(size=R.shape) * 1e-3, jnp.float32)
        Ro = so3.orthonormalize(Rp)
        RtR = jnp.swapaxes(Ro, -1, -2) @ Ro
        np.testing.assert_allclose(np.asarray(RtR), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=5e-4)
        assert np.abs(np.asarray(Ro) - np.asarray(R)).max() < 5e-3


class TestState:
    def test_boxplus_boxminus(self):
        x = state.identity()
        rng = np.random.default_rng(5)
        dx = jnp.asarray(rng.normal(size=15) * 0.1, jnp.float32)
        y = state.boxplus(x, dx)
        d2 = state.boxminus(y, x)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(dx), atol=5e-4)

    def test_stack_index(self):
        xs = [state.identity() for _ in range(3)]
        b = state.stack(xs)
        assert b.p.shape == (3, 3)
        x0 = state.index(b, 1)
        assert x0.p.shape == (3,)


class TestCluster:
    def test_from_points_cov(self):
        rng = np.random.default_rng(6)
        pts = rng.normal(size=(100, 3))
        c = cluster.from_points(jnp.asarray(pts, jnp.float32))
        np.testing.assert_allclose(np.asarray(c.v), pts.sum(0), rtol=1e-5)
        np.testing.assert_allclose(float(c.n), 100)
        ref_cov = np.cov(pts.T, bias=True)
        np.testing.assert_allclose(np.asarray(cluster.cov(c)), ref_cov, atol=1e-4)

    def test_transform_identity(self):
        """Moments of transformed points == transformed moments
        (reference tools.hpp:357-363)."""
        rng = np.random.default_rng(7)
        pts = rng.normal(size=(50, 3))
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32)))
        t = rng.normal(size=3)
        c = cluster.from_points(jnp.asarray(pts, jnp.float32))
        ct = cluster.transform(c, jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))
        pts2 = pts @ R.T + t
        c2 = cluster.from_points(jnp.asarray(pts2, jnp.float32))
        np.testing.assert_allclose(np.asarray(ct.P), np.asarray(c2.P), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ct.v), np.asarray(c2.v), rtol=1e-5, atol=5e-4)

    def test_masked(self):
        rng = np.random.default_rng(8)
        pts = rng.normal(size=(20, 3))
        mask = rng.random(20) > 0.5
        c = cluster.from_points(jnp.asarray(pts, jnp.float32), jnp.asarray(mask))
        c2 = cluster.from_points(jnp.asarray(pts[mask], jnp.float32))
        np.testing.assert_allclose(np.asarray(c.P), np.asarray(c2.P), rtol=1e-5, atol=5e-4)
        assert float(c.n) == mask.sum()

    def test_pack_unpack(self):
        rng = np.random.default_rng(9)
        M = rng.normal(size=(5, 3, 3))
        M = M + np.swapaxes(M, -1, -2)
        s = cluster.pack_sym(jnp.asarray(M, jnp.float32))
        M2 = cluster.unpack_sym(s)
        np.testing.assert_allclose(np.asarray(M2), M, rtol=1e-6)


class TestEigh3:
    def test_vs_numpy(self):
        rng = np.random.default_rng(10)
        A = rng.normal(size=(200, 3, 3))
        A = (A + np.swapaxes(A, -1, -2)) / 2
        w, V = eigh3.eigh3(jnp.asarray(A, jnp.float32))
        w_ref = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(np.asarray(w), w_ref, atol=2e-5)
        # eigenvector property A v = w v
        Av = np.einsum("bij,bjk->bik", A, np.asarray(V))
        wV = np.asarray(w)[:, None, :] * np.asarray(V)
        np.testing.assert_allclose(Av, wV, atol=1e-4)

    def test_plane_like(self):
        """Thin covariances (the actual workload): λ0 small, normal axis."""
        rng = np.random.default_rng(11)
        Cs, ns = [], []
        for _ in range(20):
            # points on a plane + tiny noise
            n = rng.normal(size=3); n /= np.linalg.norm(n)
            basis = np.linalg.svd(np.eye(3) - np.outer(n, n))[0][:, :2]
            pts = rng.normal(size=(200, 2)) @ basis.T + rng.normal(size=(200, 3)) * 1e-3
            Cs.append(np.cov(pts.T, bias=True)); ns.append(n)
        w, V = eigh3.eigh3(jnp.asarray(np.stack(Cs), jnp.float32))
        w = np.asarray(w); V = np.asarray(V); ns = np.stack(ns)
        assert (w[:, 0] < 5e-5).all()
        dots = np.abs(np.einsum("bi,bi->b", V[:, :, 0], ns))
        assert (dots > 0.999).all()

    def test_degenerate(self):
        """Isotropic and rank-1 matrices don't produce NaNs."""
        mats = [np.eye(3), np.zeros((3, 3)), np.diag([1.0, 1.0, 0.0]),
                np.outer([1, 2, 3], [1, 2, 3])]
        for A in mats:
            w, V = eigh3.eigh3(jnp.asarray(A, jnp.float32))
            assert np.isfinite(np.asarray(w)).all()
            assert np.isfinite(np.asarray(V)).all()
            w_ref = np.linalg.eigvalsh(A)
            np.testing.assert_allclose(np.asarray(w), w_ref, atol=5e-4)
            # columns orthonormal
            VtV = np.asarray(V).T @ np.asarray(V)
            np.testing.assert_allclose(VtV, np.eye(3), atol=5e-4)


class TestHashing:
    def test_voxel_coord_negative(self):
        pts = jnp.array([[-0.1, 0.1, 1.9], [-1.0, 0.0, -0.001]])
        c = hashing.voxel_coord(pts, 1.0)
        np.testing.assert_array_equal(np.asarray(c), [[-1, 0, 1], [-1, 0, -1]])

    def test_mix_spread(self):
        """Adjacent coords should map to well-spread slots."""
        xs = np.arange(-20, 20)
        coords = np.stack(np.meshgrid(xs, xs, [0, 1, 2]), axis=-1).reshape(-1, 3)
        slots = hashing.slot_of(jnp.asarray(coords, jnp.int32), jnp.int32(0), 1 << 14)
        u = np.unique(np.asarray(slots))
        # compare against the birthday-ideal occupancy for random slots
        C = 1 << 14
        ideal = C * (1 - np.exp(-len(coords) / C))
        assert len(u) > 0.95 * ideal
        # and the 32-bit keys themselves must be collision-free-ish
        keys = np.asarray(hashing.mix(jnp.asarray(coords, jnp.int32), jnp.int32(0)))
        assert len(np.unique(keys)) > 0.999 * len(coords)
