"""bf16 parameter STORAGE (params_dtype): load a float32 checkpoint
into a bfloat16-table model and serve from half the HBM bytes -- the
lever for 1M+-item catalogs where eval is bandwidth-bound on table
reads (docs/benchmarks.md). Since r4 training on bf16 params is also
supported (quality-gated; optimizer math anchors at f32 and storage
rounds per step -- optim.Optimizer.update); float16 remains refused
(narrow exponent would need loss scaling)."""

import jax.numpy as jnp
import numpy as np
import pytest

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.data.dataset import UsersInteractions
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization

from tests.test_chunked_eval import NUM_ITEMS, NUM_USERS, _random_matrix


def _trained_checkpoint(tmp_path, matrix):
  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[32], activation_type='tanh')
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  tr.train(ds, batch_size=20, num_epochs=2, lr=0.01)
  tr.save_state(str(tmp_path / 'ck'))
  return str(tmp_path / 'ck_epoch_2.model'), tr


def test_bf16_params_load_and_recommend(tmp_path):
  matrix = _random_matrix(seed=21)
  ck, tr_f32 = _trained_checkpoint(tmp_path, matrix)

  model = DynamicAutoencoder(hidden_layers=[32], activation_type='tanh',
                             params_dtype='bfloat16')
  assert model.compute_dtype == jnp.bfloat16  # defaulted to params dtype
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  tr.init_from_model_file(ck)
  assert model.params['en_embedding'].dtype == jnp.bfloat16
  assert model.params['de_bias'].dtype == jnp.bfloat16

  # rig de_bias (in BOTH trainers) so the ranking is decisively
  # separated at bf16 resolution in the top region: item i scores ~ -10i
  for t in (tr_f32, tr):
    p = dict(t.model.params)
    p['de_bias'] = (-10.0 * jnp.arange(t.model.num_items_padded,
                                       dtype=jnp.float32)
                    ).astype(p['de_bias'].dtype)
    t.model.params = p

  users = [0, 3, 7]
  ui = UsersInteractions(users=np.asarray(users),
                         interactions_matrix=matrix[users])
  k = 10
  recs_f32 = tr_f32.recommend(ui, k)
  recs_bf16 = tr.recommend(ui, k)
  tr.eval_item_chunk = 128
  recs_bf16_chunked = tr.recommend(ui, k)

  for u, a, b, c in zip(users, recs_f32, recs_bf16, recs_bf16_chunked):
    seen = set(matrix[u].nonzero()[1])
    expected = [i for i in range(NUM_ITEMS) if i not in seen][:k]
    assert list(a) == expected
    assert list(b) == expected
    assert list(c) == expected


def test_bf16_params_training_runs(tmp_path):
  """r4: bf16 params are a legal TRAINING mode -- storage stays bf16
  through the optimizer round-trip and the run trains to finite loss
  (quality is gated by the 30-epoch tests/test_model.py row)."""
  matrix = _random_matrix(seed=22)
  ds = RecommendationDataset(matrix)
  model = MatrixFactorization(embedding_size=16, params_dtype='bfloat16')
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  tr.train(ds, batch_size=20, num_epochs=2, lr=0.01)
  assert all(v.dtype == jnp.bfloat16 for v in tr.model.params.values()
             if jnp.issubdtype(v.dtype, jnp.floating))
  # checkpoints upcast to f32 (npz has no bf16); the construction arg
  # restores bf16 storage on reload
  tr.save_state(str(tmp_path / 'ck'))
  model2 = MatrixFactorization(embedding_size=16, params_dtype='bfloat16')
  tr2 = Recoder(model2, optimizer_type='adam', loss='mse')
  tr2.init_from_model_file(str(tmp_path / 'ck_epoch_2.model'))
  for k, v in tr.model.params.items():
    assert tr2.model.params[k].dtype == v.dtype
    np.testing.assert_array_equal(np.asarray(tr2.model.params[k], np.float32),
                                  np.asarray(v, np.float32))


def test_f16_params_training_refused():
  matrix = _random_matrix(seed=22)
  ds = RecommendationDataset(matrix)
  model = MatrixFactorization(embedding_size=16, params_dtype='float16')
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  with pytest.raises(ValueError, match='float32 or bfloat16'):
    tr.train(ds, batch_size=20, num_epochs=1)


def test_f32_default_unchanged():
  model = DynamicAutoencoder(hidden_layers=[8])
  model.init_model(num_items=50, num_users=10)
  assert all(v.dtype == jnp.float32 for v in model.params.values())
  assert model.compute_dtype is None


def test_compute_dtype_roundtrips_through_checkpoint(tmp_path):
  """A bf16-compute training checkpoint reloads with bf16 compute (so
  eval numerics match the saving trainer) -- unless the loader chose a
  dtype at construction, which wins."""
  matrix = _random_matrix(seed=23)
  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[32], activation_type='tanh',
                             compute_dtype='bfloat16')
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  tr.train(ds, batch_size=20, num_epochs=1, lr=0.01)
  ck = tr.save_state(str(tmp_path / 'ck'))

  re = DynamicAutoencoder()
  tr2 = Recoder(re, optimizer_type='adam', loss='mse')
  tr2.init_from_model_file(ck)
  assert re.compute_dtype == jnp.bfloat16
  assert re.params['en_embedding'].dtype == jnp.float32  # storage stays

  # explicit construction dtype wins over the checkpoint's
  override = DynamicAutoencoder(compute_dtype='float32')
  tr3 = Recoder(override, optimizer_type='adam', loss='mse')
  tr3.init_from_model_file(ck)
  assert override.compute_dtype == jnp.float32

  # f32 checkpoints don't grow the key (and still load)
  model_f = DynamicAutoencoder(hidden_layers=[32])
  trf = Recoder(model_f, optimizer_type='adam', loss='mse')
  trf.train(ds, batch_size=20, num_epochs=1, lr=0.01)
  ckf = trf.save_state(str(tmp_path / 'ckf'))
  ref = DynamicAutoencoder()
  trf2 = Recoder(ref, optimizer_type='adam', loss='mse')
  trf2.init_from_model_file(ckf)
  assert ref.compute_dtype is None
