"""Segment-sum paths: the MXU one-hot-matmul sorted_segment_add and
the Pallas single-pass segmented scan (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from voxelslam_tpu.ops import segsum
from voxelslam_tpu.ops import segscan_pallas as sp


def _ref_add(out, idx, vals, drop):
    out = np.array(out)
    for i, d in enumerate(np.asarray(idx)):
        if 0 <= d < drop:
            out[d] += np.asarray(vals)[i]
    return out


class TestSortedSegmentAdd:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        for K, D in ((512, 3), (4096, 6), (1024, 1)):
            idx = np.sort(rng.integers(0, 300, K)).astype(np.int32)
            shape = (K, D) if D > 1 else (K,)
            vals = rng.normal(size=shape).astype(np.float32)
            out = np.zeros((400,) + shape[1:], np.float32)
            got = segsum.sorted_segment_add(
                jnp.asarray(out), jnp.asarray(idx), jnp.asarray(vals)
            )
            np.testing.assert_allclose(
                np.asarray(got), _ref_add(out, idx, vals, 400),
                rtol=1e-5, atol=1e-4,
            )

    def test_odd_length_padding(self):
        rng = np.random.default_rng(1)
        K = 700  # not a multiple of the 512 chunk
        idx = np.sort(rng.integers(0, 50, K)).astype(np.int32)
        vals = rng.normal(size=(K, 2)).astype(np.float32)
        out = np.zeros((60, 2), np.float32)
        got = segsum.sorted_segment_add(
            jnp.asarray(out), jnp.asarray(idx), jnp.asarray(vals)
        )
        np.testing.assert_allclose(
            np.asarray(got), _ref_add(out, idx, vals, 60), atol=1e-4
        )

    def test_drop_beyond(self):
        idx = jnp.asarray(np.array([0, 1, 5, 7, 9, 9], np.int32))
        vals = jnp.ones((6,), jnp.float32)
        out = jnp.zeros((10,), jnp.float32)
        got = segsum.sorted_segment_add(out, idx, vals, drop_beyond=6)
        exp = np.zeros(10, np.float32)
        exp[0] = exp[1] = exp[5] = 1.0  # 7 and 9 dropped
        np.testing.assert_allclose(np.asarray(got), exp)

    def test_single_segment_chunk_straddle(self):
        # one segment spanning multiple chunks -> partials must add up
        K = 1536
        idx = jnp.zeros((K,), jnp.int32)
        vals = jnp.ones((K,), jnp.float32)
        out = jnp.zeros((4,), jnp.float32)
        got = segsum.sorted_segment_add(out, idx, vals)
        assert float(got[0]) == K


class TestPallasSegscan:
    def test_interpret_matches_numpy(self):
        rng = np.random.default_rng(2)
        K, D = 1024, 5
        idx = np.sort(rng.integers(0, 90, K))
        vals = rng.normal(size=(K, D)).astype(np.float32)
        first = np.concatenate([[True], idx[1:] != idx[:-1]])
        got = np.asarray(sp.segmented_scan(
            jnp.asarray(vals), jnp.asarray(first), interpret=True
        ))
        ref = np.zeros_like(vals)
        for seg in np.unique(idx):
            m = idx == seg
            ref[m] = np.cumsum(vals[m], axis=0)
        np.testing.assert_allclose(got, ref, atol=1e-4)
