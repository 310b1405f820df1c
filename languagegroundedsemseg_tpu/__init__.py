"""TPU-native framework for language-grounded 3D semantic segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RozDavid/LanguageGroundedSemseg (ECCV 2022, ScanNet200 benchmark):

- ``sparse``  : fixed-capacity sparse voxel grids + coordinate/kernel-map engine
                (the TPU-native replacement for MinkowskiEngine).
- ``ops``     : compute kernels (gather-GEMM sparse conv, pooling, kNN, FPS,
                connected components) built on XLA + Pallas.
- ``models``  : Res16UNet / ResNet / CLIP-head model zoo (flax).
- ``losses``  : CE / focal / contrastive-language / SupCon / SimSiam losses with
                head-common-tail balancing.
- ``data``    : voxelizer, augmentations, datasets, capacity-bucketed batching.
- ``parallel``: data-parallel sharding over a jax device Mesh.
- ``train``   : optimizers/schedulers, trainers, metrics, checkpointing.
"""

__version__ = "0.1.0"
