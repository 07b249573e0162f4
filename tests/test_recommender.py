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
