"""legkilo_tpu — TPU-native kinematic-inertial-LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ouguangjun/Leg-KILO 2.0 (reference mounted read-only at /root/reference):
a 30-dim error-state Kalman filter with per-point-timestamp LiDAR updates,
IMU-as-observation, optional leg-kinematic contact-velocity fusion, and a
probabilistic plane voxel map — built for batched, sharded replay on TPU
device meshes.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
