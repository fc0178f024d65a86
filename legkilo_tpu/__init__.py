"""legkilo_tpu — TPU-native kinematic-inertial-LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ouguangjun/Leg-KILO 2.0 (reference mounted read-only at /root/reference):
a 30-dim error-state Kalman filter with per-point-timestamp LiDAR updates,
IMU-as-observation, optional leg-kinematic contact-velocity fusion, and a
probabilistic plane voxel map — built for batched, sharded replay on TPU
device meshes.
"""

__version__ = "0.1.0"


def _set_matmul_precision() -> None:
    """Default all f32 matmuls/einsums to full-precision MXU passes.

    TPU's 'default' matmul precision truncates f32 dot inputs to bf16,
    which degrades the ESKF's covariance sandwiches and the plane-map
    statistics enough to inflate trajectory ATE ~38x (0.0058 m -> 0.22 m
    on the sim benchmark) at ZERO measured wall-clock cost for this
    workload's small-matrix shapes (docs/PERF_NOTES.md "matmul
    precision").  An explicit user setting (env JAX_DEFAULT_MATMUL_PRECISION
    or prior jax.config.update) is respected.
    """
    import os

    if os.environ.get("JAX_DEFAULT_MATMUL_PRECISION"):
        return
    import jax

    if jax.config.jax_default_matmul_precision is None:
        jax.config.update("jax_default_matmul_precision", "highest")


_set_matmul_precision()

from . import config  # noqa: F401,E402
