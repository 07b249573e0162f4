"""Chunked full-catalog scoring (eval_item_chunk) and inference-only
compute-dtype override (eval_compute_dtype).

The chunked path exists for catalogs whose ``[B, num_items]`` score slab
exceeds HBM (ROADMAP: >4M-item catalogs; the reference densifies the
full catalog per eval batch, reference model.py:508-510). These tests
pin its exactness against the monolithic path on both model families,
including the clamped-overlap handling of the last chunk and the
chunk-frame seen-item masking.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.data.dataset import UsersInteractions
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization


NUM_USERS, NUM_ITEMS = 60, 700


def _random_matrix(seed=7, num_users=NUM_USERS, num_items=NUM_ITEMS):
  rng = np.random.RandomState(seed)
  rows, cols = [], []
  for u in range(num_users):
    items = rng.choice(num_items, size=rng.randint(5, 40), replace=False)
    rows.extend([u] * len(items))
    cols.extend(items)
  vals = np.ones(len(rows), np.float32)
  return sp.csr_matrix((vals, (rows, cols)),
                       shape=(num_users, num_items))


def _interactions(matrix, users):
  return UsersInteractions(users=np.asarray(users),
                           interactions_matrix=matrix[users])


def _make_trainer(model_kind, train_dataset, **kw):
  if model_kind == 'ae':
    model = DynamicAutoencoder(hidden_layers=[32], activation_type='tanh')
  elif model_kind == 'vae':
    from recoder_tpu.models import MultVAE
    model = MultVAE(hidden_dim=32, latent_dim=8, total_anneal_steps=0)
  else:
    model = MatrixFactorization(embedding_size=32, activation_type='tanh')
  loss = 'logloss' if model_kind == 'vae' else 'mse'
  trainer = Recoder(model, optimizer_type='adam', loss=loss, **kw)
  trainer.train(train_dataset, batch_size=20, num_epochs=2, lr=0.01)
  return trainer


@pytest.mark.parametrize('model_kind', ['ae', 'mf', 'vae'])
@pytest.mark.parametrize('chunk', [256, 192, 50])
def test_chunked_matches_monolithic(model_kind, chunk):
  """Chunked top-k == monolithic top-k, including when the chunk does
  not divide the padded catalog (clamped last chunk must not duplicate
  or skip columns)."""
  matrix = _random_matrix()
  ds = RecommendationDataset(matrix)
  trainer = _make_trainer(model_kind, ds)
  users = np.arange(0, NUM_USERS, 3)
  batch = _interactions(matrix, users)

  k = 20
  mono = trainer.recommend(batch, k)

  trainer.eval_item_chunk = chunk  # same params, chunked lowering
  chunked = trainer.recommend(batch, k)

  for u, (a, b) in enumerate(zip(mono, chunked)):
    assert len(b) == k
    assert len(set(b)) == k, f'user {u}: duplicate recommendations {b}'
    # identical float sums can legally swap rank order between the two
    # reduction shapes; require the recommended SETS to agree
    assert set(a) == set(b), f'user {u}: {sorted(a)} != {sorted(b)}'


def test_chunked_excludes_seen_and_pad():
  """No seen item and no out-of-catalog (padded) id may appear."""
  matrix = _random_matrix(seed=11)
  ds = RecommendationDataset(matrix)
  trainer = _make_trainer('ae', ds, eval_item_chunk=128)
  users = np.arange(NUM_USERS)
  recs = trainer.recommend(_interactions(matrix, users), 30)
  for u, rec in zip(users, recs):
    seen = set(matrix[u].nonzero()[1])
    assert not (set(rec) & seen), f'user {u} got seen items'
    assert max(rec) < NUM_ITEMS


def test_chunked_few_unseen_items():
  """A user with fewer than k unseen items must still get k DISTINCT
  item ids, identical to the monolithic path (regression: the merge
  init used duplicated id-0 filler)."""
  import scipy.sparse as sp
  n_items = 300
  seen = np.setdiff1d(np.arange(n_items), [3, 50, 142, 260, 299])
  m = sp.csr_matrix((np.ones(len(seen), np.float32),
                     (np.zeros(len(seen), np.int64), seen)),
                    shape=(4, n_items))
  ds = RecommendationDataset(m)
  trainer = _make_trainer('ae', ds)
  ui = _interactions(m, [0])
  k = 10
  mono = trainer.recommend(ui, k)[0]
  trainer.eval_item_chunk = 64
  chunked = trainer.recommend(ui, k)[0]
  assert len(set(chunked)) == k
  assert list(chunked) == list(mono)


def test_chunked_exact_tie_fallback():
  """All-tied scores defeat the global certification, forcing the
  salvage/full-fallback branches -- results must stay exact (ties break
  to the lowest item id, matching lax.top_k order)."""
  import jax.numpy as jnp
  matrix = _random_matrix(seed=13)
  ds = RecommendationDataset(matrix)
  trainer = _make_trainer('ae', ds, eval_item_chunk=128)
  p = dict(trainer.model.params)
  p['de_embedding'] = jnp.zeros_like(p['de_embedding'])
  p['de_bias'] = jnp.zeros_like(p['de_bias'])
  trainer.model.params = p

  users = [0, 5, 9]
  recs = trainer.recommend(_interactions(matrix, users), 12)
  for u, rec in zip(users, recs):
    seen = set(matrix[u].nonzero()[1])
    expected = [i for i in range(NUM_ITEMS) if i not in seen][:12]
    assert list(rec) == expected


def test_chunk_smaller_than_k_rejected():
  matrix = _random_matrix(seed=3)
  ds = RecommendationDataset(matrix)
  trainer = _make_trainer('mf', ds, eval_item_chunk=8)
  with pytest.raises(ValueError, match='eval_item_chunk'):
    trainer.recommend(_interactions(matrix, [0, 1]), 16)


def test_auto_chunk_threshold():
  """Catalogs past AUTO_CHUNK_ITEMS auto-enable chunking; 0 disables."""
  model = DynamicAutoencoder(hidden_layers=[8])
  trainer = Recoder(model, num_items=NUM_ITEMS)
  trainer._init_model()
  assert trainer._resolve_eval_chunk() is None  # small catalog: monolithic

  trainer.eval_item_chunk = 64
  assert trainer._resolve_eval_chunk() == 64

  # simulate a huge padded catalog without allocating its tables
  model.num_items_padded = Recoder.AUTO_CHUNK_ITEMS * 2
  trainer.eval_item_chunk = None
  assert trainer._resolve_eval_chunk() == Recoder.AUTO_CHUNK_WIDTH
  trainer.eval_item_chunk = 0
  assert trainer._resolve_eval_chunk() is None


def test_bf16_eval_dtype():
  """eval_compute_dtype='bfloat16' runs both recommend paths and
  preserves a decisively-separated ranking (scores dominated by the
  decoder bias, spaced far beyond bf16 resolution)."""
  matrix = _random_matrix(seed=5)
  ds = RecommendationDataset(matrix)
  trainer = _make_trainer('ae', ds, eval_compute_dtype='bfloat16')
  import jax.numpy as jnp
  # rig de_bias so item i scores ~ -i: top-k = lowest unseen ids
  params = dict(trainer.model.params)
  params['de_bias'] = -10.0 * jnp.arange(
      trainer.model.num_items_padded, dtype=jnp.float32)
  trainer.model.params = params

  users = [0, 1, 2]
  batch = _interactions(matrix, users)
  k = 10
  recs = trainer.recommend(batch, k)

  trainer.eval_item_chunk = 128
  recs_chunked = trainer.recommend(batch, k)

  for u, rec, rec_c in zip(users, recs, recs_chunked):
    seen = set(matrix[u].nonzero()[1])
    expected = [i for i in range(NUM_ITEMS) if i not in seen][:k]
    assert list(rec) == expected
    assert list(rec_c) == expected


@pytest.mark.parametrize('loss', ['mse', 'logistic', 'logloss'])
@pytest.mark.parametrize('chunk', [256, 192])
def test_chunked_val_loss_matches_dense(loss, chunk):
  """Full-catalog validation loss through the chunked
  (encode_coo/decode_slice) path == the dense [B, W] path, for the
  elementwise losses and the two-pass multinomial NLL, including when
  the chunk does not divide the padded catalog."""
  from recoder_tpu.data.loader import RecommendationDataLoader

  matrix = _random_matrix(seed=21)
  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[16], activation_type='tanh')
  tr = Recoder(model, optimizer_type='adam', loss=loss)
  tr.train(ds, batch_size=20, num_epochs=1, lr=0.01)

  dl = RecommendationDataLoader(ds, batch_size=20,
                                negative_sampling=False)
  dense = tr._validate(dl)

  tr.eval_item_chunk = chunk     # re-resolved per call (cache key)
  chunked = tr._validate(dl)
  np.testing.assert_allclose(chunked, dense, rtol=2e-5)


def test_chunked_val_loss_target_dataset():
  """Chunked val loss with a dual-CSR target dataset (input and target
  interactions differ) matches the dense path."""
  from recoder_tpu.data.loader import RecommendationDataLoader

  in_m = _random_matrix(seed=31)
  tg_m = _random_matrix(seed=32)
  train_ds = RecommendationDataset(in_m)
  val_ds = RecommendationDataset(tg_m, in_m)
  tr = Recoder(DynamicAutoencoder(hidden_layers=[16]),
               optimizer_type='adam', loss='mse')
  tr.train(train_ds, batch_size=20, num_epochs=1, lr=0.01)

  dl = RecommendationDataLoader(val_ds, batch_size=20,
                                negative_sampling=False)
  dense = tr._validate(dl)
  tr.eval_item_chunk = 128
  chunked = tr._validate(dl)
  np.testing.assert_allclose(chunked, dense, rtol=2e-5)


def test_chunked_val_loss_custom_loss_falls_back():
  """A custom Loss module has unknowable chunk semantics: the val path
  must stay dense (and still work) when one is supplied."""
  from recoder_tpu.data.loader import RecommendationDataLoader
  from recoder_tpu.ops import losses as losses_lib

  matrix = _random_matrix(seed=41)
  ds = RecommendationDataset(matrix)
  tr = Recoder(DynamicAutoencoder(hidden_layers=[8]),
               optimizer_type='adam',
               loss=losses_lib.MSELoss(reduction='sum'),
               eval_item_chunk=128)
  tr.train(ds, batch_size=20, num_epochs=1, lr=0.01)
  dl = RecommendationDataLoader(ds, batch_size=20,
                                negative_sampling=False)
  assert np.isfinite(tr._validate(dl))


def test_inference_nnz_ladder_not_sticky():
  """Inference nnz padding sits on a power-of-two ladder: a huge batch
  must NOT permanently inflate the scatter width of later small ones
  (the r4 sticky-max behavior), while same-bucket batches still share
  one padded width (compiled-program reuse)."""
  matrix = _random_matrix(seed=13, num_users=400)
  ds = RecommendationDataset(matrix)
  tr = _make_trainer('ae', ds)

  big = tr._inference_collate(_interactions(matrix, range(380)))
  assert len(big.rows) >= 2048  # genuinely a bigger bucket
  small1 = tr._inference_collate(_interactions(matrix, [0, 1]))
  assert len(small1.rows) == 1024  # ladder floor, not big's width
  small2 = tr._inference_collate(_interactions(matrix, [5, 6, 7]))
  assert len(small2.rows) == len(small1.rows)  # bucket reuse
  # padded triplets are inert: pad rows point one past the user count
  assert np.all(big.rows[-1:] == len(big.users))
  # results off the padded batch match an un-padded oracle
  recs = tr.recommend(_interactions(matrix, [0, 1]), 7)
  assert len(recs) == 2 and all(len(r) == 7 for r in recs)
