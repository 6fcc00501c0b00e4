"""Batched-vs-stepwise equivalence of the steady program.

`steady_step_batch` (lax.scan over `steady_step`) is the production
path at scan_batch=16, while tests mostly exercise the per-scan
program.  This exact program class silently corrupted once before: in
round 2 the batched lax.scan program produced garbage on TPU (match
count 0 from scan 2) while the identical per-scan program was fine
(CLAUDE.md round-2 facts; root cause was a reroute cov_add
accumulation that only miscompiled under the scan).  This test locks
the equivalence on CPU: B chained `steady_step` calls must equal ONE
`steady_step_batch` over the same flats — full carry and all outputs,
tight tolerance.

Reference parity note: the reference has no batch dimension (one scan
per loop iteration, voxelslam.cpp:1456-1738); batching is purely a
TPU dispatch-amortization construct and must be semantics-free.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.core.config import (
    Config, GeneralCfg, LocalBACfg, OdometryCfg, Shapes,
)
from voxelslam_tpu.odom import pipeline as pl
from voxelslam_tpu.slam import SlamFrontend

B = 7  # scans per batch under test (< scan_batch so feeds buffer)


def _cfg() -> Config:
    return Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.25, voxel_size=1.0,
            min_eigen_value=0.01, init_span_bound=4.0,
        ),
        local_ba=LocalBACfg(win_size=5, plane_eigen_value_thre=(4.0,) * 4),
        shapes=Shapes(
            max_raw_points=2048,
            max_points=1024,
            max_imu=32,
            hash_capacity=1 << 14,
            max_ba_voxels=512,
            scan_batch=B + 1,  # feeds below stay buffered (no dispatch)
        ),
    )


@pytest.fixture(scope="module")
def steady_setup():
    """A frontend in STEADY state + B packed flats it has NOT run."""
    traj = synthetic.Trajectory(
        amp=np.array([1.2, 0.9, 0.2]), ramp=1.5, t_start=1.0,
    )
    dirs = synthetic.lidar_dirs(n_lines=20, n_cols=80, fov_v=55.0,
                                fov_h=140.0)
    data = synthetic.simulate(n_scans=20 + B, traj=traj, dirs=dirs,
                              t0=0.5, seed=7)
    fe = SlamFrontend(_cfg())
    for sc in data.scans[:20]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    fe.flush()
    assert fe.phase == "STEADY"
    carry0 = fe.carry
    # feed B more scans: with scan_batch=B+1 they only BUFFER (the
    # carry is untouched), so the captured flats went through the real
    # host pack path against exactly carry0
    for sc in data.scans[20:20 + B]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    assert not fe._pending
    flats = np.stack([f for f, _ in fe._batch_buf])
    assert flats.shape[0] == B
    return fe, carry0, flats


def _leaf_paths(tree):
    leaves, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), v) for kp, v in leaves]


def _assert_tree_close(ta, tb, what, rtol=1e-5, atol=1e-5):
    la, lb = _leaf_paths(ta), _leaf_paths(tb)
    assert len(la) == len(lb)
    for (ka, va), (kb, vb) in zip(la, lb):
        assert ka == kb
        a, b = np.asarray(va), np.asarray(vb)
        assert a.shape == b.shape, f"{what}{ka}: {a.shape} vs {b.shape}"
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b, err_msg=f"{what}{ka}")
        else:
            np.testing.assert_allclose(
                a, b, rtol=rtol, atol=atol, err_msg=f"{what}{ka}"
            )


class TestBatchedEqualsStepwise:
    def test_carry_and_outputs_match(self, steady_setup):
        fe, carry0, flats = steady_setup
        args = (fe.imu_noise, fe.ext_R, fe.ext_t, fe.scale_gravity)

        carry_b, outs_b = pl.steady_step_batch(
            carry0, jnp.asarray(flats), fe.pp, *args
        )
        carry_s = carry0
        outs_s = []
        for b in range(B):
            carry_s, out = pl.steady_step_flat(
                carry_s, jnp.asarray(flats[b]), fe.pp, *args
            )
            outs_s.append(out)
        outs_s = jax.tree.map(lambda *a: jnp.stack(a), *outs_s)

        _assert_tree_close(outs_b, outs_s, "outputs")
        _assert_tree_close(carry_b, carry_s, "carry")

    def test_batch_trajectory_stays_on_ground_truth(self, steady_setup):
        """The batched outputs must also be RIGHT, not merely equal:
        positions over the B scans stay finite and matched against the
        map (guards against an equal-but-degenerate pair)."""
        fe, carry0, flats = steady_setup
        args = (fe.imu_noise, fe.ext_R, fe.ext_t, fe.scale_gravity)
        _, outs = pl.steady_step_batch(
            carry0, jnp.asarray(flats), fe.pp, *args
        )
        assert np.isfinite(np.asarray(outs.x.p)).all()
        assert (np.asarray(outs.match_count) > 50).all(), (
            "batched steady program lost map association "
            f"(match counts {np.asarray(outs.match_count)})"
        )
