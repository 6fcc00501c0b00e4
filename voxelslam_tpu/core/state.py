"""15-DoF ESIKF navigation state as a JAX pytree.

TPU-native counterpart of the reference's `IMUST` struct
(VoxelSLAM/src/tools.hpp:135-199): t, R, p, v, bg, ba, g and a 15x15
covariance, with the manifold boxplus/boxminus used by the ESIKF and
the BA optimizers.  Tangent ordering matches the reference:
[dθ(0:3), dp(3:6), dv(6:9), dbg(9:12), dba(12:15)].

Unlike the C++ struct, `NavState` is an immutable pytree whose leaves
may carry arbitrary leading batch dims, so a sliding window of states
is just a `NavState` with leading dim W (and `jax.vmap`/`lax.scan`
operate on it directly).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import so3

DIM = 15  # tangent dimension (reference tools.hpp:16)
GRAVITY = 9.8  # m/s^2 (reference tools.hpp:15)


class NavState(NamedTuple):
    """Navigation state; every field broadcasts over leading batch dims."""

    t: jnp.ndarray  # ()        scan-end timestamp (seconds, session-relative)
    R: jnp.ndarray  # (3, 3)    body-to-world rotation
    p: jnp.ndarray  # (3,)      position
    v: jnp.ndarray  # (3,)      velocity
    bg: jnp.ndarray  # (3,)     gyro bias
    ba: jnp.ndarray  # (3,)     accel bias
    g: jnp.ndarray  # (3,)      gravity in world frame
    cov: jnp.ndarray  # (15,15) ESIKF covariance


def identity(dtype=jnp.float32) -> NavState:
    """Zero state with the reference's default prior covariance
    (tools.hpp:188-197: 1e-4 * I, bias block 1e-5 * I)."""
    cov = jnp.eye(DIM, dtype=dtype) * 1e-4
    cov = cov.at[9:, 9:].set(jnp.eye(6, dtype=dtype) * 1e-5)
    return NavState(
        t=jnp.zeros((), dtype),
        R=jnp.eye(3, dtype=dtype),
        p=jnp.zeros(3, dtype),
        v=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        g=jnp.array([0.0, 0.0, -GRAVITY], dtype),
        cov=cov,
    )


def boxplus(x: NavState, dx: jnp.ndarray) -> NavState:
    """Retract a 15-dim tangent: R <- R @ exp(dθ); linear on the rest
    (reference tools.hpp:154-162)."""
    return x._replace(
        R=x.R @ so3.exp(dx[..., 0:3]),
        p=x.p + dx[..., 3:6],
        v=x.v + dx[..., 6:9],
        bg=x.bg + dx[..., 9:12],
        ba=x.ba + dx[..., 12:15],
    )


def boxminus(a: NavState, b: NavState) -> jnp.ndarray:
    """15-dim tangent a ⊟ b with dθ = log(R_bᵀ R_a)
    (reference tools.hpp:164-173)."""
    return jnp.concatenate(
        [
            so3.log(jnp.swapaxes(b.R, -1, -2) @ a.R),
            a.p - b.p,
            a.v - b.v,
            a.bg - b.bg,
            a.ba - b.ba,
        ],
        axis=-1,
    )


def stack(states: list["NavState"]) -> NavState:
    """Stack individual states into a batched NavState (window buffer)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)


def index(states: NavState, i) -> NavState:
    """Select window slot i from a batched NavState."""
    return jax.tree.map(lambda x: x[i], states)
