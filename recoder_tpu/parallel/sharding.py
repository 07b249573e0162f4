"""Sharding rules: model params and batch slabs onto a (data, model) mesh.

Placement policy:
  * embedding tables (axes ('item'|'user', 'embed')) -> rows sharded
    over 'model': the item catalog is the scale axis of this workload
    (SURVEY.md section 5), so the tables are what must not replicate.
  * per-item bias vectors (('item',)) -> sharded over 'model'.
  * MLP weights/biases -> replicated (they are tiny: hidden_layers of
    a few hundred).
  * batch users axis -> sharded over 'data' (each chip trains its slice
    of users); COO nnz arrays replicated, the densified slab constrained
    to P('data', None).

With these annotations the SPMD partitioner materializes exactly the
communication the design calls for: an all-gather of the batch's
item-union embedding rows over the 'model' axis in the forward pass,
a reduce-scatter/psum of table-row gradients in the backward pass, and
a psum of MLP gradients over 'data'.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def param_pspecs(model):
  """PartitionSpecs per param path, from the model's ``param_axes``."""
  specs = {}
  for path, axes in model.param_axes().items():
    spec = []
    for ax in axes:
      if ax in ('item', 'user'):
        spec.append('model')
      else:
        spec.append(None)
    specs[path] = P(*spec)
  return specs


def shard_params(params, model, mesh):
  """Place a params pytree onto the mesh with :func:`param_pspecs`."""
  specs = param_pspecs(model)
  return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
          for k, v in params.items()}


def batch_pspecs(batch):
  """PartitionSpecs for a staged batch dict (see Recoder._stage_batch).

  The users axis rides 'data'; everything else is replicated (the COO
  arrays are small relative to the dense slab, and replicating them
  keeps the scatter local-only after XLA partitions it).
  """
  specs = {}
  for k, v in batch.items():
    if v is None:
      specs[k] = None
    elif k in ('in_users',):
      specs[k] = P('data')
    else:
      specs[k] = P()
  return specs


def shard_batch(batch, mesh):
  """Place a staged batch dict onto the mesh.

  Single-process meshes only: ``jax.device_put`` treats each leaf as
  the GLOBAL array and keeps this process's addressable shards, so on
  a multi-process mesh each host would silently contribute only a
  slice of its own (different) local batch and the replicated leaves
  (unions, valid counts) would disagree across processes. Multi-host
  training runs on the fused device pipeline instead, whose resident
  CSR/table arrays are replicated and whose batches are built in-jit
  (SPMD-coherent by construction).
  """
  if jax.process_count() > 1:
    raise NotImplementedError(
        'host-staged batches cannot be placed coherently on a '
        'multi-process mesh (per-host loaders hold different batches); '
        'use the fused device pipeline (plain train matrices, or '
        "shuffle='blocks' for target datasets) for multi-host training")
  specs = batch_pspecs(batch)
  out = {}
  for k, v in batch.items():
    if v is None:
      out[k] = None
    else:
      out[k] = jax.device_put(v, NamedSharding(mesh, specs[k]))
  return out
