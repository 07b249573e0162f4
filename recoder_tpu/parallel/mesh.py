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
  """
  config = config or MeshConfig()
  devices = list(devices if devices is not None else jax.devices())
  n = len(devices)
  model = max(1, config.model)
  assert n % model == 0, f'{n} devices not divisible by model={model}'
  data = config.data if config.data is not None else n // model
  assert data * model == n, \
      f'data({data}) x model({model}) != devices({n})'
  arr = np.asarray(devices).reshape(data, model)
  return jax.sharding.Mesh(arr, ('data', 'model'))
