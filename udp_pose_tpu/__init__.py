"""udp_pose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) top-down 2D human pose
estimation framework with the capabilities of realphongha/UDP-Pose.

Design: everything that is per-sample Python/OpenCV in the reference
(`/root/reference`) is batched, jit-compiled array code here.  Models are Flax
modules in NHWC layout; the codec (UDP affine crop, Gaussian/offset target
encoding, DARK/UDP decode, flip-test folding) is closed-form `jax.numpy` +
Pallas kernels; scaling is `jax.sharding.Mesh` + `pjit` (no NCCL-style code).
"""

__version__ = "0.1.0"
