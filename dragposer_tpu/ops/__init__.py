"""Math kernels: quaternions, dual quaternions, forward kinematics, topology."""

from dragposer_tpu.ops import quat, dual_quat, fk, topology  # noqa: F401
