"""Recommender strategy tests: the Aiolli-style similarity recommender
over an embeddings index, and the inference recommender contract."""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from recoder_tpu.data import UsersInteractions
from recoder_tpu.embedding import BruteForceEmbeddingsIndex
from recoder_tpu.recommender import SimilarityRecommender


@pytest.fixture
def clustered_index():
  """Three tight item clusters; similarity search should stay in-cluster."""
  rng = np.random.default_rng(0)
  centers = np.eye(3, 12) * 10
  emb = np.vstack([centers[i // 20] + rng.normal(scale=0.1, size=12)
                   for i in range(60)]).astype(np.float32)
  index = BruteForceEmbeddingsIndex(embeddings=emb)
  index.build()
  return index


def test_similarity_recommender_stays_in_cluster(clustered_index):
  rec = SimilarityRecommender(clustered_index, num_recommendations=5,
                              n=10, scale=1)
  # user history entirely in cluster 0 (items 0..19)
  hist = csr_matrix((np.ones(3), ([0, 0, 0], [1, 5, 9])), shape=(1, 60))
  ui = UsersInteractions(users=np.array([0]), interactions_matrix=hist)
  out = rec.recommend(ui)
  assert len(out) == 1
  items = np.asarray(out[0])
  assert len(items) == 5
  assert np.all(items < 20)               # same cluster
  assert not np.any(np.isin(items, [1, 5, 9]))  # seen items excluded


def test_similarity_recommender_multiple_users(clustered_index):
  rec = SimilarityRecommender(clustered_index, num_recommendations=4,
                              n=8, scale=2)
  hist = csr_matrix((np.ones(4), ([0, 0, 1, 1], [2, 3, 25, 30])),
                    shape=(2, 60))
  ui = UsersInteractions(users=np.arange(2), interactions_matrix=hist)
  out = rec.recommend(ui)
  assert len(out) == 2
  assert np.all(np.asarray(out[0]) < 20)          # cluster 0 user
  assert np.all((np.asarray(out[1]) >= 20)
                & (np.asarray(out[1]) < 40))      # cluster 1 user


def _oracle_recommend_single(index, user_items, k, n, scale):
  """Straight transcription of the reference per-user algorithm
  (reference recommender.py:56-96), used as the semantics oracle for
  the batched implementation."""
  import recoder_tpu.utils as utils
  pools = [index.get_nns_by_id(i, n) for i in user_items]
  pool = np.unique(np.concatenate([np.asarray(p).reshape(-1)
                                   for p in pools]))
  pool = pool[np.isin(pool, user_items, invert=True)]
  if len(pool) == 0:
    return pool, np.array([])
  pe = utils.normalize(np.asarray(index.get_embeddings(pool), np.float64),
                       axis=1)
  ue = utils.normalize(np.asarray(index.get_embeddings(user_items),
                                  np.float64), axis=1)
  scores = np.power((pe @ ue.T + 1) / 2, scale).sum(axis=1)
  if len(scores) > k:
    top = np.argpartition(-scores, k)[:k]
  else:
    top = np.arange(len(scores))
  top = top[np.argsort(-scores[top])]
  return pool[top], scores[top]


def test_batched_matches_per_user_oracle(clustered_index):
  """The batched implementation must reproduce the reference's
  per-user algorithm: same candidate sets, same scores, same ranking
  (up to exact-tie order, compared by score)."""
  rng = np.random.default_rng(3)
  num_users, num_items = 40, 60
  rows, cols = [], []
  for u in range(num_users):
    hist = rng.choice(num_items, size=rng.integers(1, 8), replace=False)
    rows += [u] * len(hist)
    cols += list(hist)
  m = csr_matrix((np.ones(len(rows)), (rows, cols)),
                 shape=(num_users, num_items))
  ui = UsersInteractions(users=np.arange(num_users), interactions_matrix=m)

  for n, scale, k in [(5, 1, 10), (10, 3, 5)]:
    rec = SimilarityRecommender(clustered_index, num_recommendations=k,
                                n=n, scale=scale)
    batched = rec.recommend(ui)
    for u in range(num_users):
      items = m.indices[m.indptr[u]:m.indptr[u + 1]]
      want_ids, want_scores = _oracle_recommend_single(
          clustered_index, items, k, n, scale)
      got = np.asarray(batched[u])
      assert len(got) == len(want_ids), f'user {u}'
      if len(got) == 0:
        continue
      # identical sets; identical score-ordering (ties may permute)
      np.testing.assert_array_equal(np.sort(got), np.sort(want_ids))
      got_pos = {int(i): p for p, i in enumerate(want_ids)}
      got_scores = np.array([want_scores[got_pos[int(i)]] if int(i) in got_pos
                             else np.nan for i in got])
      np.testing.assert_allclose(got_scores, want_scores, rtol=1e-9)


def test_batch_nns_match_single_queries(clustered_index):
  """get_nns_by_ids == per-id get_nns_by_id for the brute-force index."""
  ids = np.array([0, 7, 25, 41, 59])
  batch = clustered_index.get_nns_by_ids(ids, 6)
  for i, lst in zip(ids, batch):
    single = clustered_index.get_nns_by_id(int(i), 6)
    np.testing.assert_array_equal(np.sort(lst), np.sort(single))


def test_similarity_recommender_many_users_fast(clustered_index):
  """Batched eval scales: 5k users in well under a second of work."""
  import time
  rng = np.random.default_rng(4)
  num_users, num_items = 5000, 60
  rows = np.repeat(np.arange(num_users), 5)
  cols = rng.integers(0, num_items, num_users * 5)
  m = csr_matrix((np.ones(len(rows)), (rows, cols)),
                 shape=(num_users, num_items))
  m.sum_duplicates()
  ui = UsersInteractions(users=np.arange(num_users), interactions_matrix=m)
  rec = SimilarityRecommender(clustered_index, num_recommendations=10,
                              n=5, scale=1)
  t0 = time.time()
  out = rec.recommend(ui)
  dt = time.time() - t0
  assert len(out) == num_users
  assert dt < 5.0, f'batched similarity recommend too slow: {dt:.2f}s'
