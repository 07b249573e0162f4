"""Device-mesh construction for (data, model) parallelism."""

import dataclasses

import jax
import numpy as np


@dataclasses.dataclass
class MeshConfig:
  """Mesh sizing.

  Args:
    data: data-parallel ways (users axis). None = auto.
    model: model-parallel ways (item axis of embedding tables).
  """
  data: int | None = None
  model: int = 1


def make_mesh(config: MeshConfig | None = None, devices=None):
  """Build a 2-D ('data', 'model') mesh over ``devices``.

  With ``config.data=None`` the data axis absorbs all devices left over
  after the model axis. A (1, 1) mesh on one device is valid and makes
  single-chip and multi-chip code paths identical.

  Multi-host (``jax.process_count() > 1``): the 'model' axis carries the
  hot collective -- an all-gather of the batch's union embedding rows
  every step -- while 'data' carries one gradient psum per step, so the
  mesh is laid out DCN-aware: 'model' groups are placed within a host
  (ICI), and only the 'data' axis crosses hosts (DCN). Uses
  ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` when the
  axis sizes permit (model fits within a host, data divisible by the
  host count); otherwise falls back to the contiguous reshape, which
  keeps 'model' intra-host whenever the model axis divides the local
  device count (devices enumerate host-major).
  """
  config = config or MeshConfig()
  explicit = devices is not None
  devices = list(devices if explicit else jax.devices())
  n = len(devices)
  model = max(1, config.model)
  assert n % model == 0, f'{n} devices not divisible by model={model}'
  data = config.data if config.data is not None else n // model
  assert data * model == n, \
      f'data({data}) x model({model}) != devices({n})'
  if not explicit and jax.process_count() > 1:
    procs = jax.process_count()
    local = n // procs
    if model <= local and local % model == 0 and data % procs == 0:
      from jax.experimental import mesh_utils
      # granule = process: hosts are the DCN boundary (TPU slice_index
      # is absent/uniform on CPU and on single-slice pods)
      arr = mesh_utils.create_hybrid_device_mesh(
          (data // procs, model), (procs, 1), process_is_granule=True)
      return jax.sharding.Mesh(arr, ('data', 'model'))
  arr = np.asarray(devices).reshape(data, model)
  return jax.sharding.Mesh(arr, ('data', 'model'))
