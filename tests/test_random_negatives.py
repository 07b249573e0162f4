"""num_random_negatives: uniform-random items appended to each step's
union as extra zero-target negatives (coverage knob for catalogs where
in-batch unions touch a tiny item fraction; CBNS-motivated,
arXiv:2110.15154). Both the host collator and the fused device pipeline
must (a) keep the union sorted/unique/sentinel-padded, (b) scatter NO
values into the extra columns, and (c) train."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import (BatchCollator, RecommendationDataset,
                              RecommendationDataLoader)
from recoder_tpu.data.device_pipeline import DeviceDataSource
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder
from recoder_tpu.utils import dataframe_to_csr_matrix


@pytest.fixture
def matrix():
  rng = np.random.default_rng(9)
  df = pd.DataFrame({
      'u': rng.integers(0, 40, 600),
      'i': rng.integers(0, 500, 600),
      'v': 1.0,
  }).drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  return m


def _check_union(items, width_valid, num_items, own_cols, R):
  items = np.asarray(items)
  valid = items[:int(width_valid)]
  # sorted, unique, in-catalog, sentinel-padded tail
  assert np.all(np.diff(valid) > 0)
  assert valid.max() < num_items
  assert np.all(items[int(width_valid):] == num_items)
  # contains the batch's own items plus extras
  own = np.unique(own_cols)
  assert np.isin(own, valid).all()
  assert len(valid) > len(own)  # extras joined (500-item catalog, R=64)
  return set(valid) - set(own)


def test_host_collator_random_negatives(matrix):
  n_users, n_items = matrix.shape
  collator = BatchCollator(batch_size=16, negative_sampling=True,
                           num_items=n_items, num_random_negatives=64)
  from recoder_tpu.data.dataset import UsersInteractions
  ui = UsersInteractions(users=np.arange(16),
                         interactions_matrix=matrix[:16])
  batch = collator.collate(ui)[0]
  extras = _check_union(batch.items, batch.num_items_in_batch, n_items,
                        matrix[:16].indices, 64)
  # no value lands in an extra column
  dense = np.zeros((16, len(batch.items)), np.float32)
  for r, c, v in zip(batch.rows, batch.cols, batch.vals):
    if r < 16:
      dense[r, c] += v
  valid_items = np.asarray(batch.items)[:batch.num_items_in_batch]
  for col, item in enumerate(valid_items):
    if item in extras:
      assert dense[:, col].sum() == 0


def test_device_pipeline_random_negatives(matrix):
  n_users, n_items = matrix.shape
  src = DeviceDataSource(matrix, batch_size=8, num_sampling_users=16,
                         num_items=n_items, union_width=256,
                         num_random_negatives=64, seed=3)
  perm = jnp.arange(src.n_pad, dtype=jnp.int32)
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True,
                      neg_step=jnp.int32(0))
  own_cols = np.concatenate([matrix[u].indices for u in range(16)])
  extras = _check_union(b['items'], b['width_valid'], n_items,
                        own_cols, 64)
  # values only scatter from the [:M] slots; extras' columns stay zero
  dense = np.zeros((9, 256), np.float32)
  np.add.at(dense, (np.minimum(np.asarray(b['rows']), 8),
                    np.asarray(b['cols'])), np.asarray(b['vals']))
  items = np.asarray(b['items'])
  for col in range(int(b['width_valid'])):
    if items[col] in extras:
      assert dense[:8, col].sum() == 0

  # different neg_step -> different extras (refresh across epochs)
  b2 = src.build_batch(perm, jnp.int32(0), negative_sampling=True,
                       neg_step=jnp.int32(777))
  assert not np.array_equal(np.asarray(b['items']),
                            np.asarray(b2['items']))


def test_training_with_random_negatives(matrix):
  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[16], activation_type='tanh')
  tr = Recoder(model, optimizer_type='adam', loss='logistic')
  tr.train(ds, batch_size=8, num_epochs=2, lr=0.01,
           negative_sampling=True, num_sampling_users=16,
           num_random_negatives=64)
  assert np.isfinite(np.asarray(tr.model.params['en_embedding'])).all()


def test_random_negatives_requires_negative_sampling(matrix):
  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[8])
  tr = Recoder(model, optimizer_type='adam', loss='mse')
  with pytest.raises(ValueError, match='negative_sampling'):
    tr.train(ds, batch_size=8, num_epochs=1, num_random_negatives=16)
