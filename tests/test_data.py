"""Data-pipeline tests, mirroring the reference tiers (tests/test_data.py):
dataset<->dataframe bijection, loader batch shapes under negative
sampling, and collator re-densification checks -- extended with the
padding/masking invariants of the static-shape slabs."""

import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import (BatchCollator, BucketLadder,
                              RecommendationDataLoader,
                              RecommendationDataset)
from recoder_tpu.utils import dataframe_to_csr_matrix


def generate_dataframe(seed=0):
  rng = np.random.default_rng(seed)
  data = pd.DataFrame()
  data['user'] = rng.integers(0, 100, 1000)
  data['item'] = rng.integers(0, 200, 1000)
  data['inter'] = np.ones(1000)
  return data.drop_duplicates(['user', 'item']).reset_index(drop=True)


@pytest.fixture
def input_dataframe():
  return generate_dataframe(0)


@pytest.fixture
def target_dataframe():
  return generate_dataframe(1)


def densify(batch):
  """Re-densify a padded COO Batch (trims padding)."""
  B = len(batch.users)
  W = (len(batch.items) if batch.items is not None else batch.size[1])
  dense = np.zeros((B, W), dtype=np.float32)
  for r, c, v in zip(batch.rows, batch.cols, batch.vals):
    if r < B:
      dense[r, c] += v
  return dense


def test_bucket_ladder():
  ladder = BucketLadder(min_size=256, max_size=10000, growth=1.25, align=256)
  assert all(s % 256 == 0 for s in ladder.sizes)
  assert ladder.fit(1) == 256
  assert ladder.fit(256) == 256
  assert ladder.fit(257) >= 257
  for n in [5, 300, 999, 5000, 9999]:
    b = ladder.fit(n)
    assert b >= n and b % 256 == 0
  # beyond the ladder: aligned passthrough
  assert ladder.fit(100001) % 256 == 0 and ladder.fit(100001) >= 100001


def test_RecommendationDataset(input_dataframe):
  matrix, item_id_map, user_id_map = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix)
  assert len(dataset) == input_dataframe['user'].nunique()

  replica = input_dataframe.copy()
  replica['u'] = replica.user.map(user_id_map)
  replica['i'] = replica.item.map(item_id_map)

  for index in range(len(dataset)):
    inter, target = dataset[[index]]
    assert target is None
    user = inter.users[0]
    m = inter.interactions_matrix
    assert m.shape[0] == 1
    assert m.getnnz() == len(replica[replica.u == user])
    for item_id, val in zip(m.indices, m.data):
      match = replica[(replica.u == user) & (replica.i == item_id)
                      & (replica.inter == val)]
      assert len(match) == 1
      replica = replica.drop(match.index)
  assert len(replica) == 0


def test_RecommendationDataset_negative_index(input_dataframe):
  """Python-style negative row indices behave like scipy fancy
  indexing (the raw indptr arithmetic used to compute a negative nnz
  and crash on np.empty)."""
  matrix, _, _ = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix)
  n = len(dataset)
  neg, _ = dataset[[-1, -n]]
  pos, _ = dataset[[n - 1, 0]]
  assert (neg.interactions_matrix != pos.interactions_matrix).nnz == 0
  with pytest.raises(IndexError):
    dataset[[-n - 1]]


def test_RecommendationDataset_target(input_dataframe, target_dataframe):
  common_users = np.intersect1d(input_dataframe.user.unique(),
                                target_dataframe.user.unique())
  common_items = np.intersect1d(input_dataframe.item.unique(),
                                target_dataframe.item.unique())
  input_df = input_dataframe[input_dataframe.user.isin(common_users)
                             & input_dataframe.item.isin(common_items)]
  target_df = target_dataframe[target_dataframe.user.isin(common_users)
                               & target_dataframe.item.isin(common_items)]

  matrix, item_id_map, user_id_map = dataframe_to_csr_matrix(
      input_df, user_col='user', item_col='item', inter_col='inter')
  target_matrix, _, _ = dataframe_to_csr_matrix(
      target_df, user_col='user', item_col='item', inter_col='inter',
      item_id_map=item_id_map, user_id_map=user_id_map)

  dataset = RecommendationDataset(matrix, target_matrix)
  idx = np.random.randint(0, len(dataset))
  inter, target = dataset[[idx]]
  assert inter.users == target.users
  assert inter.interactions_matrix.getnnz() > 0


@pytest.mark.parametrize('batch_size,num_sampling_users', [(5, 0), (5, 10)])
def test_RecommendationDataLoader(input_dataframe, batch_size,
                                  num_sampling_users):
  matrix, _, _ = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix, matrix)
  dataloader = RecommendationDataLoader(dataset, batch_size=batch_size,
                                        negative_sampling=True,
                                        num_sampling_users=num_sampling_users)
  seen_users = []
  for input_batch, target_batch in dataloader:
    assert target_batch is not None
    # padded leading axis is always batch_size; valid rows tracked
    assert len(input_batch.users) == batch_size
    assert 0 < input_batch.num_users <= batch_size
    # the union is shared between every slice of a mega-batch
    assert input_batch.num_items_in_batch <= len(input_batch.items)
    # union ids beyond the valid width are the pad sentinel
    union = input_batch.num_items_in_batch
    assert np.all(input_batch.items[union:] == input_batch.pad_item_id)
    # cols of valid nnz stay within the union
    assert np.all(input_batch.cols[:input_batch.nnz] < union)
    # padded nnz rows are out of range (dropped by device scatter)
    assert np.all(input_batch.rows[input_batch.nnz:] == batch_size)
    seen_users.extend(input_batch.users[:input_batch.num_users].tolist())

  assert sorted(seen_users) == list(range(len(dataset)))
  assert len(dataloader) == int(np.ceil(len(dataset) / batch_size))


def test_loader_prefetch_matches_sync(input_dataframe):
  matrix, _, _ = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix)
  kw = dict(batch_size=7, negative_sampling=True, num_sampling_users=14,
            shuffle=True, seed=123)
  sync = RecommendationDataLoader(dataset, num_workers=0, **kw)
  pref = RecommendationDataLoader(dataset, num_workers=2, **kw)
  for (a, _), (b, _) in zip(sync, pref):
    np.testing.assert_array_equal(a.users, b.users)
    np.testing.assert_array_equal(a.rows, b.rows)
    np.testing.assert_array_equal(a.cols, b.cols)
    np.testing.assert_array_equal(a.vals, b.vals)


@pytest.mark.parametrize('batch_size', [1, 2, 5, 10, 13])
def test_BatchCollator(input_dataframe, batch_size):
  matrix, _, _ = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix)
  collator = BatchCollator(batch_size=batch_size, negative_sampling=True,
                           num_items=matrix.shape[1])

  big_batch, _ = dataset[np.arange(len(dataset))]
  batches = collator.collate(big_batch)
  assert len(batches) == np.ceil(len(dataset) / batch_size)

  offset = 0
  for batch in batches:
    dense = densify(batch)
    rows = big_batch.interactions_matrix[offset:offset + batch_size]
    nnz_per_user = [rows[i].getnnz() for i in range(batch.num_users)]
    got_nnz = (dense > 0).sum(axis=1)[:batch.num_users].tolist()
    assert got_nnz == nnz_per_user

    item_pos = {item: j for j, item in enumerate(batch.items.tolist())}
    for u in range(batch.num_users):
      for item_id, val in zip(rows[u].indices, rows[u].data):
        assert item_id in item_pos
        assert dense[u, item_pos[item_id]] == val
    offset += batch_size


def test_collator_full_catalog(input_dataframe):
  matrix, _, _ = dataframe_to_csr_matrix(
      input_dataframe, user_col='user', item_col='item', inter_col='inter')
  dataset = RecommendationDataset(matrix)
  collator = BatchCollator(batch_size=4, negative_sampling=False,
                           num_items=matrix.shape[1])
  big_batch, _ = dataset[np.arange(8)]
  batches = collator.collate(big_batch)
  for i, batch in enumerate(batches):
    assert batch.items is None
    assert batch.size[1] == matrix.shape[1]
    dense = densify(batch)
    np.testing.assert_array_equal(
        dense[:batch.num_users],
        matrix[i * 4:i * 4 + batch.num_users].toarray())


def test_loader_len_matches_iteration_nonmultiple_mega():
  """len() must count the short tail slice every mega-batch yields
  when num_sampling_users is not a multiple of batch_size."""
  import pandas as pd

  from recoder_tpu.data import RecommendationDataLoader, \
      RecommendationDataset
  from recoder_tpu.utils import dataframe_to_csr_matrix

  rng = np.random.default_rng(9)
  df = pd.DataFrame({'u': np.repeat(np.arange(100), 3),
                     'i': rng.integers(0, 50, 300), 'v': 1.0})
  df = df.drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  loader = RecommendationDataLoader(RecommendationDataset(m),
                                    batch_size=40,
                                    num_sampling_users=50,
                                    negative_sampling=True)
  assert len(loader) == sum(1 for _ in loader)
