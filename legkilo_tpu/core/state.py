"""The 30-dim ESKF state as a JAX pytree with manifold boxplus/boxminus.

Capability parity with the reference `State` struct and its operators
(/root/reference/legkilo/src/core/slam/eskf.{h,cc}): rotation lives on SO(3)
(stored as a 3x3 matrix), the remaining 9 blocks of 3 are Euclidean and packed
into one flat 27-vector so boxplus is a single add.

Error-state index layout (eskf.cc:18-29):

    0:3   rot        (SO(3) tangent)
    3:6   pos
    6:9   vel
    9:12  ba         accelerometer bias
    12:15 bw         gyroscope bias
    15:18 grav       gravity in world
    18:21 imu_a      latched body acceleration (IMU-as-observation model)
    21:24 imu_w      latched body angular velocity
    24:27 bv         kinematic velocity bias
    27:30 contact    contact foot position

All functions support arbitrary leading batch dimensions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .so3 import exp_so3, log_so3

DIM_STATE = 30
DIM_LIN = 27  # everything but rotation

# Slices into the flat 27-dim linear block (state vector index minus 3).
POS = slice(0, 3)
VEL = slice(3, 6)
BA = slice(6, 9)
BW = slice(9, 12)
GRAV = slice(12, 15)
IMU_A = slice(15, 18)
IMU_W = slice(18, 21)
BV = slice(21, 24)
CONTACT = slice(24, 27)

# Column indices into the full 30-dim error state (for building H / F).
IDX_ROT = 0
IDX_POS = 3
IDX_VEL = 6
IDX_BA = 9
IDX_BW = 12
IDX_GRAV = 15
IDX_IMU_A = 18
IDX_IMU_W = 21
IDX_BV = 24
IDX_CONTACT = 27


class State(NamedTuple):
    """Nominal filter state: rotation matrix + flat linear block."""

    rot: jnp.ndarray  # [..., 3, 3]
    lin: jnp.ndarray  # [..., 27]

    @property
    def pos(self) -> jnp.ndarray:
        return self.lin[..., POS]

    @property
    def vel(self) -> jnp.ndarray:
        return self.lin[..., VEL]

    @property
    def ba(self) -> jnp.ndarray:
        return self.lin[..., BA]

    @property
    def bw(self) -> jnp.ndarray:
        return self.lin[..., BW]

    @property
    def grav(self) -> jnp.ndarray:
        return self.lin[..., GRAV]

    @property
    def imu_a(self) -> jnp.ndarray:
        return self.lin[..., IMU_A]

    @property
    def imu_w(self) -> jnp.ndarray:
        return self.lin[..., IMU_W]

    @property
    def bv(self) -> jnp.ndarray:
        return self.lin[..., BV]

    @property
    def contact(self) -> jnp.ndarray:
        return self.lin[..., CONTACT]


def make_state(batch_shape: tuple = (), dtype=jnp.float32) -> State:
    """Default-constructed state (State::State, eskf.cc:5-16).

    rot = I, everything zero except gravity = (0, 0, -9.81).
    """
    rot = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
    lin = jnp.zeros(batch_shape + (DIM_LIN,), dtype=dtype)
    lin = lin.at[..., GRAV].set(jnp.asarray([0.0, 0.0, -9.81], dtype=dtype))
    return State(rot=rot, lin=lin)


def boxplus(state: State, delta: jnp.ndarray) -> State:
    """Manifold retraction: rot <- rot @ Exp(delta[0:3]); linear += delta[3:].

    Parity: State::operator+= (eskf.cc:18-29).
    """
    rot = state.rot @ exp_so3(delta[..., 0:3])
    lin = state.lin + delta[..., 3:DIM_STATE]
    return State(rot=rot, lin=lin)


def boxminus(a: State, b: State) -> jnp.ndarray:
    """Manifold difference: delta[0:3] = Log(b.rot^T a.rot); rest Euclidean.

    Parity: State::operator- (eskf.cc:31-45).
    """
    rot_delta = jnp.swapaxes(b.rot, -1, -2) @ a.rot
    dr = log_so3(rot_delta)
    dl = a.lin - b.lin
    return jnp.concatenate([dr, dl], axis=-1)
