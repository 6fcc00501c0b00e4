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
