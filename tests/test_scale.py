"""Large-catalog shape stress (BASELINE config 4 proxy): a ~1M-item
catalog with sparse row-wise updates, single-device and mesh-sharded.
Data is tiny -- what's exercised is the padded-table geometry, the
row-sparse optimizer at scale, and the sharded gather/scatter paths."""

import jax
import numpy as np
import pandas as pd
import pytest
from scipy.sparse import csr_matrix

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder

NUM_ITEMS = 1_000_003  # deliberately not round: pad/sentinel must cope


def _big_catalog_dataset(users=48, items_per_user=30):
  rng = np.random.default_rng(0)
  rows = np.repeat(np.arange(users), items_per_user)
  cols = rng.choice(NUM_ITEMS, size=users * items_per_user)
  m = csr_matrix((np.ones_like(cols, np.float32), (rows, cols)),
                 shape=(users, NUM_ITEMS))
  m.sum_duplicates()
  return RecommendationDataset(m)


def test_sparse_training_at_1m_items():
  ds = _big_catalog_dataset()
  model = DynamicAutoencoder(hidden_layers=[16], sparse=True)
  tr = Recoder(model=model, optimizer_type='adam', loss='logistic')
  tr.train(train_dataset=ds, batch_size=16, num_epochs=2,
           negative_sampling=True)
  assert model.num_items_padded > NUM_ITEMS
  # only union rows (plus padding sentinel) should have moved: check a
  # random untouched row kept its init value
  p = tr.model.params
  touched = set(np.unique(ds.interactions_matrix.indices))
  probe = next(i for i in range(1000, NUM_ITEMS) if i not in touched)
  fresh = DynamicAutoencoder(hidden_layers=[16], sparse=True)
  fresh.init_model(num_items=NUM_ITEMS, seed=tr.seed)
  np.testing.assert_array_equal(np.asarray(p['en_embedding'][probe]),
                                np.asarray(fresh.params['en_embedding'][probe]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_sharded_training_at_1m_items():
  from recoder_tpu.parallel import MeshConfig, make_mesh
  ds = _big_catalog_dataset()
  mesh = make_mesh(MeshConfig(data=2, model=4))
  model = DynamicAutoencoder(hidden_layers=[16])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse', mesh=mesh)
  tr.train(train_dataset=ds, batch_size=16, num_epochs=1,
           negative_sampling=True)
  table = tr.model.params['en_embedding']
  # row-sharded 4 ways over 'model'
  shard_rows = {s.data.shape[0] for s in table.addressable_shards}
  assert shard_rows == {table.shape[0] // 4}
