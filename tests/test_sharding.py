"""Multi-chip SPMD tests on a virtual 8-device CPU mesh: the jitted
train step under mesh (4 data x 2 model) must match the single-device
run (same seed, same batches) to numerical tolerance -- the JAX-native
analog of distributed-parity testing (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization
from recoder_tpu.parallel import (MeshConfig, make_mesh, param_pspecs,
                                  shard_params)
from recoder_tpu.utils import dataframe_to_csr_matrix


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 (virtual) devices')


def _dataset(seed=0, users=64, items=300):
  rng = np.random.default_rng(seed)
  df = pd.DataFrame({
      'user': rng.integers(0, users, users * 12),
      'item': rng.integers(0, items, users * 12),
      'inter': 1.0,
  }).drop_duplicates(['user', 'item'])
  m, _, _ = dataframe_to_csr_matrix(df, 'user', 'item', 'inter')
  return RecommendationDataset(m)


def test_param_pspecs():
  ae = DynamicAutoencoder([64, 32])
  ae.init_model(num_items=300, seed=0)
  specs = param_pspecs(ae)
  assert specs['en_embedding'] == jax.sharding.PartitionSpec('model', None)
  assert specs['de_bias'] == jax.sharding.PartitionSpec('model')
  assert specs['encode_w_1'] == jax.sharding.PartitionSpec(None, None)


def test_shard_params_places_on_mesh():
  mesh = make_mesh(MeshConfig(data=4, model=2))
  ae = DynamicAutoencoder([64])
  params = ae.init_model(num_items=300, seed=0)
  sharded = shard_params(params, ae, mesh)
  table = sharded['en_embedding']
  # row-sharded over the 2-way model axis
  shard_shapes = {s.data.shape for s in table.addressable_shards}
  assert shard_shapes == {(table.shape[0] // 2, table.shape[1])}


@pytest.mark.parametrize('model_cls,kw,shuffle', [
    (DynamicAutoencoder, dict(hidden_layers=[64], activation_type='tanh'),
     'users'),
    (MatrixFactorization, dict(embedding_size=32, activation_type='tanh'),
     'users'),
    # blocks mode exercises the host-precomputed block-union tables
    # (replicated over the mesh) inside the SPMD step
    (DynamicAutoencoder, dict(hidden_layers=[64], activation_type='tanh'),
     'blocks'),
])
def test_sharded_training_matches_single_device(model_cls, kw, shuffle):
  ds = _dataset()

  def run(mesh):
    model = model_cls(**kw)
    trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                      seed=7, mesh=mesh)
    trainer.train(train_dataset=ds, batch_size=16, lr=1e-3,
                  num_epochs=3, negative_sampling=True,
                  num_sampling_users=32, shuffle=shuffle)
    if shuffle == 'blocks':
      assert trainer._fused_source_cache[2]._precomputed is not None
    return jax.tree_util.tree_map(np.asarray, trainer.model.params)

  # mesh size 1 vs mesh size 8: same jitted step, same host batches
  ref = run(make_mesh(MeshConfig(data=1, model=1),
                      devices=jax.devices()[:1]))
  got = run(make_mesh(MeshConfig(data=4, model=2)))

  flat_ref = jax.tree_util.tree_flatten(ref)[0]
  flat_got = jax.tree_util.tree_flatten(got)[0]
  for a, b in zip(flat_ref, flat_got):
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5)


def test_sharded_eval_matches_single_device():
  ds = _dataset(seed=3)
  from recoder_tpu.data import UsersInteractions

  def run(mesh):
    model = DynamicAutoencoder(hidden_layers=[64])
    trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                      seed=11, mesh=mesh)
    trainer.train(train_dataset=ds, batch_size=16, num_epochs=2,
                  negative_sampling=True)
    ui = UsersInteractions(users=np.arange(8),
                           interactions_matrix=ds.interactions_matrix[:8])
    return np.asarray(trainer.predict(ui))

  ref = run(make_mesh(MeshConfig(data=1, model=1),
                      devices=jax.devices()[:1]))
  got = run(make_mesh(MeshConfig(data=4, model=2)))
  np.testing.assert_allclose(ref, got, rtol=5e-4, atol=1e-5)


def test_mesh_uses_fused_pipeline():
  """Under a mesh, plain-matrix training must keep the fused on-device
  pipeline (VERDICT r1 #3), not fall back to the host loader."""
  ds = _dataset(seed=5)
  mesh = make_mesh(MeshConfig(data=4, model=2))
  model = DynamicAutoencoder(hidden_layers=[32])
  trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                    seed=3, mesh=mesh)
  trainer.train(train_dataset=ds, batch_size=16, num_epochs=1,
                negative_sampling=True)
  assert getattr(trainer, '_fused_source_cache', None) is not None
  src = trainer._fused_source_cache[2]
  assert src.mesh is mesh
  # resident CSR is replicated over every device of the mesh
  assert len(src.d_cols.sharding.device_set) == 8


@pytest.mark.parametrize('sparse', [False, True])
def test_sharded_sparse_training_matches_single_device(sparse):
  """1-vs-8-device equality for the sparse (row-sparse Adam) path --
  the msd flagship config is sparse=True (reference msd/train.py:42-49),
  so the sparse scatter into 'model'-row-sharded tables must partition
  correctly (VERDICT r1 #5)."""
  ds = _dataset(seed=9)

  def run(mesh):
    model = DynamicAutoencoder(hidden_layers=[48], sparse=sparse)
    trainer = Recoder(model=model, optimizer_type='adam', loss='logloss',
                      seed=13, mesh=mesh)
    trainer.train(train_dataset=ds, batch_size=16, lr=1e-3,
                  num_epochs=2, negative_sampling=True,
                  num_sampling_users=32)
    return jax.tree_util.tree_map(np.asarray, trainer.model.params)

  ref = run(make_mesh(MeshConfig(data=1, model=1),
                      devices=jax.devices()[:1]))
  got = run(make_mesh(MeshConfig(data=4, model=2)))
  for (ka, a), (kb, b) in zip(sorted(ref.items()), sorted(got.items())):
    assert ka == kb
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5, err_msg=ka)


def test_checkpoint_reload_preserves_mesh_sharding(tmp_path):
  """Reloading a checkpoint into a mesh trainer must keep tables
  row-sharded (a reload that collapses params onto one device would
  silently serialize later steps)."""
  ds = _dataset(seed=11)
  mesh = make_mesh(MeshConfig(data=4, model=2))

  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[32]),
               optimizer_type='adam', loss='mse', seed=2, mesh=mesh)
  tr.train(train_dataset=ds, batch_size=16, num_epochs=2,
           negative_sampling=True)
  path = tr.save_state(str(tmp_path / 'ck'))

  tr2 = Recoder(model=DynamicAutoencoder(), optimizer_type='adam',
                loss='mse', seed=2, mesh=mesh)
  tr2.init_from_model_file(path)
  table = tr2.model.params['en_embedding']
  assert len(table.sharding.device_set) == 8
  shard_shapes = {s.data.shape for s in table.addressable_shards}
  assert shard_shapes == {(table.shape[0] // 2, table.shape[1])}

  # params identical to the saved ones, and training resumes under mesh
  np.testing.assert_allclose(np.asarray(table),
                             np.asarray(tr.model.params['en_embedding']))
  tr2.train(train_dataset=ds, batch_size=16, num_epochs=3,
            negative_sampling=True)
  assert tr2.current_epoch == 3


def test_sharded_tables_match_replicated():
  """table_sharding='data': block tables + CSR live sharded over the
  'data' axis (shard_map owner-slice + psum fetches) and training is
  numerically identical to the replicated layout, for the union path,
  full-decode, weighted values, and a dual-CSR target dataset."""
  import scipy.sparse as sp

  mesh = make_mesh(MeshConfig(data=4, model=2))
  from jax.sharding import PartitionSpec as P

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  rng = np.random.default_rng(17)
  n_users, n_items = 64, 300
  nnz = 1500
  m = sp.csr_matrix((rng.random(nnz).astype(np.float32) + 0.5,
                     (rng.integers(0, n_users, nnz),
                      rng.integers(0, n_items, nnz))),
                    shape=(n_users, n_items))
  m.sum_duplicates()
  tgt = m.copy()
  tgt.data[:] = 1.0

  for dataset, fd in ((RecommendationDataset(m), False),
                      (RecommendationDataset(m), True),
                      (RecommendationDataset(tgt, m), False)):
    def run(sharding):
      tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8],
                                            noise_prob=0.0),
                   optimizer_type='adam', loss='mse', seed=4, mesh=mesh)
      tr.train(train_dataset=dataset, batch_size=16, num_epochs=2,
               negative_sampling=True, shuffle='blocks',
               full_decode=fd)
      src = tr._fused_source_cache[2]
      return tr.model.params, src

    # force sharding through the source the trainer builds
    from recoder_tpu.data import device_pipeline as dp
    orig = dp.DeviceDataSource.__init__

    def forced(self, *a, **kw):
      kw['table_sharding'] = 'data'
      orig(self, *a, **kw)

    dp.DeviceDataSource.__init__ = forced
    try:
      p_sharded, src = run('data')
    finally:
      dp.DeviceDataSource.__init__ = orig
    assert src.table_sharding == 'data'
    assert src._precomputed['u_rel'].sharding.spec == P('data', None)
    assert src.d_cols.ndim == 2  # halo-chunked layout

    p_repl, src_r = run(None)
    assert src_r.table_sharding is None
    for k in p_repl:
      np.testing.assert_allclose(np.asarray(p_sharded[k]),
                                 np.asarray(p_repl[k]), atol=2e-5,
                                 err_msg=f'fd={fd} param {k}')


def test_shard_batch_rejects_multiprocess_mesh(monkeypatch):
  """Host-staged batches are per-process and cannot be placed
  coherently on a multi-process mesh (each host would keep only a
  slice of its own, different, batch and 'replicated' leaves would
  disagree); shard_batch must fail loudly instead of silently
  dropping data (review r3 finding). Multi-host training uses the
  fused device pipeline."""
  from recoder_tpu.parallel import shard_batch
  from recoder_tpu.parallel import sharding as sharding_mod

  mesh = make_mesh(MeshConfig(data=1, model=1),
                   devices=jax.devices()[:1])
  batch = {'in_users': np.arange(4, dtype=np.int32)}
  # single-process: fine
  out = shard_batch(batch, mesh)
  np.testing.assert_array_equal(np.asarray(out['in_users']),
                                batch['in_users'])
  monkeypatch.setattr(sharding_mod.jax, 'process_count', lambda: 2)
  with pytest.raises(NotImplementedError, match='multi-process'):
    shard_batch(batch, mesh)
