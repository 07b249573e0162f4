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

  # ---- checkpoint round-trip + eval across processes (VERDICT r3 #8)
  from jax.experimental import multihost_utils

  from recoder_tpu.metrics import NDCG, Recall

  # ALL processes call save_state: 'model'-sharded leaves cross
  # processes, so checkpoint._to_np runs a collective allgather; both
  # write the same bytes (pid-unique temp + atomic replace)
  ck_prefix = out_path + '.ck'
  ck_file = trainer.save_state(ck_prefix)
  multihost_utils.sync_global_devices('checkpoint-saved')

  # disjoint fold-in/target split (recommend() excludes seen input
  # items, so input==target would score identically zero): alternate
  # each user's interactions between the two folds
  coo = matrix.tocoo()
  order = np.lexsort((coo.col, coo.row))
  pos_in_row = np.zeros(len(order), np.int64)
  rows_sorted = coo.row[order]
  starts = np.r_[0, np.flatnonzero(np.diff(rows_sorted)) + 1]
  for s, e in zip(starts, np.r_[starts[1:], len(order)]):
    pos_in_row[order[s:e]] = np.arange(e - s)
  import scipy.sparse as sp
  fold_in = pos_in_row % 2 == 0
  in_m = sp.csr_matrix((coo.data[fold_in],
                        (coo.row[fold_in], coo.col[fold_in])), matrix.shape)
  tg_m = sp.csr_matrix((coo.data[~fold_in],
                        (coo.row[~fold_in], coo.col[~fold_in])),
                       matrix.shape)
  eval_ds = RecommendationDataset(in_m, tg_m)
  metrics = [Recall(k=10), NDCG(k=10)]

  # resume under the hybrid mesh from the checkpoint (multi-host mesh
  # reload: arrays are device_put back onto their global shardings)
  tr_mesh = Recoder(model=DynamicAutoencoder(), optimizer_type='adam',
                    loss='mse', seed=5, mesh=mesh)
  tr_mesh.init_from_model_file(ck_file)
  tr_mesh.train(train_dataset=ds, batch_size=16, num_epochs=3,
                negative_sampling=True, num_sampling_users=32)

  # per-host eval of the host's own user shard with locally-replicated
  # params -- the production multi-host eval layout (each host scores
  # its users; metric lists concatenate across hosts). The parent
  # combines both shards and checks the mean against the full set.
  tr_local = Recoder(model=DynamicAutoencoder(), optimizer_type='adam',
                     loss='mse', seed=5)
  tr_local.init_from_model_file(ck_file)
  full = tr_local._evaluate(eval_dataset=eval_ds, num_recommendations=10,
                            metrics=metrics, batch_size=16)
  full_means = np.array([np.mean(full[m]) for m in metrics])
  # evaluate only this host's user rows (row-slice of the shared folds)
  shard_ds = RecommendationDataset(in_m[lo:hi], tg_m[lo:hi])
  shard_res = tr_local._evaluate(eval_dataset=shard_ds,
                                 num_recommendations=10,
                                 metrics=metrics, batch_size=16)
  shard_sums = np.array([np.sum(shard_res[m]) for m in metrics])
  shard_counts = np.array([len(shard_res[m]) for m in metrics])

  params = {k: np.asarray(v) for k, v in trainer.model.params.items()}
  resumed = {f'resumed::{k}': np.asarray(v)
             for k, v in tr_mesh.model.params.items()}
  np.savez(out_path, shard_lo=lo, shard_hi=hi,
           eval_means=full_means, shard_sums=shard_sums,
           shard_counts=shard_counts, **params, **resumed)
  print(f'worker {pid}: OK, shard=({lo},{hi})', flush=True)


if __name__ == '__main__':
  main()
