"""voxelslam_tpu — a TPU-native LiDAR-inertial SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hku-mars/Voxel-SLAM (reference layout documented in SURVEY.md):

- ``core``     : SO(3) kernels, 15-DoF ESIKF state pytree, point-cluster
                 (second moment) algebra, spatial hashing, configs.
- ``ops``      : batched closed-form 3x3 eigendecomposition and other
                 device primitives.
- ``map``      : the device-resident hashed adaptive voxel map (fixed
                 capacity open-addressing hash over (coord, level) keys).
- ``imu``      : ESIKF forward propagation + scan deskew, IMU
                 preintegration factors (lax.scan).
- ``odom``     : iterated ESIKF point-to-plane measurement update.
- ``lba``      : BALM2-style eigen-factor local BA (LM on device),
                 marginalization, sliding window.
- ``loop``     : BTC-style binary-triangle descriptors, loop detection,
                 plane ICP, pose-graph optimization.
- ``glb``      : hierarchical global BA (bottom-up submaps + top-down PGO).
- ``parallel`` : jax.sharding mesh helpers for multi-chip operation.
- ``io``       : trajectory/map serialization compatible with the
                 reference's alidarState.txt / edge.txt formats.

The compute path is pure JAX (jit/lax/pallas); host code only feeds
padded scan batches and drains results.
"""

__version__ = "0.1.0"

# TPU matmul precision: JAX's default lowers f32 matmuls to bfloat16
# multiplications on TPU (8-bit mantissa).  SLAM covariance/Hessian
# algebra (ESIKF gains, preintegration, BALM2 Hessians, gravity BA)
# is numerically meaningless at bf16 — estimation quality silently
# collapses on device while CPU tests pass.  The framework's matmuls
# are tiny (3x3..153x153), so full-f32 MXU passes cost nothing
# relative to the scatter/gather-bound pipeline.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
