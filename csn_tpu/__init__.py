"""csn-tpu: TPU-native Cross-Shape Attention Networks.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of marios2019/CSN
(Cross-Shape Attention for part segmentation of 3D point clouds on PartNet).

Layout:
  core/      static-shape sparse voxel engine (replaces MinkowskiEngine)
  ops/       attention kernels (SSA/CSA), Pallas flash attention
  data/      PartNet h5 pipeline, augmentations, batching
  models/    HRNet / ResUNet / Res16UNet / ResNet model zoo (flax.linen)
  midfc/     precomputed-feature (O-CNN MID-FC) SSA/CSA head path
  retrieval/ shape-graph construction (kNN over SSA descriptors)
  train/     optimizers, schedulers, metrics, trainers, checkpointing
  parallel/  multi-chip meshes and sharded training
"""

__version__ = "0.1.0"
