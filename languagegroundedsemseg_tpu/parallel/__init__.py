"""Device-mesh parallelism: data-parallel shard_map, collectives, meshes.

The reference's only parallelism is DDP over NCCL (SURVEY.md §2.4); here it
is an explicit jax.sharding.Mesh with psum over ICI. The padded all_gather of
variable-point tensors that insseg hand-rolls (reference
downstream/insseg/lib/distributed.py:148-222) maps to fixed-capacity
jax.lax.all_gather for free.
"""

from languagegroundedsemseg_tpu.parallel.mesh import make_mesh
from languagegroundedsemseg_tpu.parallel.dp import shard_train_step, stack_batches

__all__ = ["make_mesh", "shard_train_step", "stack_batches"]
