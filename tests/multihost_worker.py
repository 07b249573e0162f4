"""Worker process for the simulated 2-host test (test_distributed.py).

Each process joins the JAX distributed system via
recoder_tpu.parallel.initialize, contributes 2 virtual CPU devices to a
global 4-device ('data','model') mesh, and runs the SAME fused SPMD
training as single-host -- the global mesh makes per-process execution
identical, with cross-process collectives riding the distributed
backend (DCN on real pods). Final params are dumped for the parent
test to compare across processes and against a single-process run.

Usage: multihost_worker.py <pid> <nproc> <coordinator> <out.npz>
"""

import os
import sys


def main():
  pid, nproc = int(sys.argv[1]), int(sys.argv[2])
  coordinator, out_path = sys.argv[3], sys.argv[4]

  os.environ['XLA_FLAGS'] = ('--xla_force_host_platform_device_count=2 '
                             + os.environ.get('XLA_FLAGS', ''))
  import jax
  jax.config.update('jax_platforms', 'cpu')

  from recoder_tpu.parallel import host_user_shard, initialize
  initialize(coordinator_address=coordinator, num_processes=nproc,
             process_id=pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert len(jax.devices()) == 2 * nproc, jax.devices()

  import numpy as np
  import pandas as pd

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder
  from recoder_tpu.parallel import MeshConfig, make_mesh
  from recoder_tpu.utils import dataframe_to_csr_matrix

  rng = np.random.default_rng(0)
  df = pd.DataFrame({'uid': rng.integers(0, 64, 800),
                     'sid': rng.integers(0, 200, 800),
                     'v': 1.0}).drop_duplicates(['uid', 'sid'])
  matrix, _, _ = dataframe_to_csr_matrix(df, 'uid', 'sid', 'v')
  ds = RecommendationDataset(matrix)

  # every process sees the same global data; the mesh splits the work
  mesh = make_mesh(MeshConfig(data=2 * nproc // 2, model=2))
  # DCN-aware layout: each 'model' group (the per-step union all-gather)
  # must live within one process; only 'data' crosses processes
  for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, mesh.devices
  model = DynamicAutoencoder(hidden_layers=[32])
  trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                    seed=5, mesh=mesh)
  trainer.train(train_dataset=ds, batch_size=16, num_epochs=2,
                negative_sampling=True, num_sampling_users=32)

  # host_user_shard: the loader split a real multi-host deployment uses
  lo, hi = host_user_shard(matrix.shape[0])
  assert 0 <= lo < hi <= matrix.shape[0]

  params = {k: np.asarray(v) for k, v in trainer.model.params.items()}
  np.savez(out_path, shard_lo=lo, shard_hi=hi, **params)
  print(f'worker {pid}: OK, shard=({lo},{hi})', flush=True)


if __name__ == '__main__':
  main()
