"""Pallas TPU kernels (the hand-tuned native compute layer)."""

from point_cloud_registration_tpu.ops.pallas.exact_nn import exact_nn_pallas
