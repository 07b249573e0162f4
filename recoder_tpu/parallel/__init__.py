"""Multi-chip execution: device meshes and sharding rules.

The reference is single-device (SURVEY.md section 2.3); this subsystem
is the TPU-native scale-out the rebuild adds: data-parallel users over
the 'data' mesh axis and item-axis model parallelism -- the embedding
tables row-sharded over the 'model' axis, with XLA inserting the
all-gather of the mini-batch item-union rows over ICI and the psum of
gradients (the Scaling-Book recipe: pick a mesh, annotate shardings,
let the SPMD partitioner place collectives).
"""

from recoder_tpu.parallel.mesh import MeshConfig, make_mesh
from recoder_tpu.parallel.sharding import (batch_pspecs, param_pspecs,
                                           shard_batch, shard_params)

__all__ = ['MeshConfig', 'make_mesh', 'param_pspecs', 'batch_pspecs',
           'shard_params', 'shard_batch']

from recoder_tpu.parallel.distributed import host_user_shard, initialize  # noqa: E402,F401

__all__ += ['initialize', 'host_user_shard']
