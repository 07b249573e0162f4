"""Recommendation strategies.

Parity with reference recoder/recommender.py: :class:`Recommender` ABC
(:8), :class:`SimilarityRecommender` (:27, the Aiolli'13 item-item
scheme over an embeddings index), and :class:`InferenceRecommender`
(:104, model-based top-k).
"""

import numpy as np

import recoder_tpu.utils as utils
from recoder_tpu.embedding import EmbeddingsIndex


class Recommender:
  """Base recommender over users' interaction histories."""

  def recommend(self, users_hist):
    """Recommend a list of items for each user.

    Args:
      users_hist (UsersInteractions): users' interaction histories.

    Returns:
      list: recommended item ids per user.
    """
    raise NotImplementedError


class SimilarityRecommender(Recommender):
  """Item-item similarity recommendations from an embeddings index.

  For each user: pool the union of the ``n`` nearest neighbors of every
  history item, drop seen items, score each pooled item by
  ``sum((cos_sim+1)/2 ** scale)`` against the history, return top-k
  (reference recommender.py:56-96; Aiolli, RecSys'13).

  Args:
    embeddings_index (EmbeddingsIndex): index for NN search + vectors.
    num_recommendations (int): recommendations per user (best-effort).
    n (int): neighbors fetched per history item.
    scale (float): similarity scaling exponent.
  """

  def __init__(self, embeddings_index: EmbeddingsIndex,
               num_recommendations, n=1, scale=1):
    self.embeddings_index = embeddings_index
    self.scale = scale
    self.num_recommendations = num_recommendations
    self.n = n

  def _recommend_single(self, user_items):
    user_items = np.asarray(user_items)

    items_pool = [self.embeddings_index.get_nns_by_id(item_id, self.n)
                  for item_id in user_items]
    items_pool = np.unique(np.concatenate([np.asarray(p).reshape(-1)
                                           for p in items_pool]))
    filtered_items = items_pool[np.isin(items_pool, user_items, invert=True)]
    if len(filtered_items) == 0:
      return filtered_items

    items_scores = self._compute_scores(filtered_items, user_items)

    if len(items_scores) > self.num_recommendations:
      top_ind = np.argpartition(-items_scores, self.num_recommendations)
      top_ind = top_ind[:self.num_recommendations]
    else:
      top_ind = np.arange(len(items_scores))

    top_ind = top_ind[np.argsort(-items_scores[top_ind])]
    return filtered_items[top_ind]

  def _compute_scores(self, items_pool, user_items):
    pool_embeddings = np.array([self.embeddings_index.get_embedding(i)
                                for i in items_pool])
    user_embeddings = np.array([self.embeddings_index.get_embedding(i)
                                for i in user_items])
    pool_embeddings = utils.normalize(pool_embeddings, axis=1)
    user_embeddings = utils.normalize(user_embeddings, axis=1)
    scores = pool_embeddings @ user_embeddings.T  # cosine in [-1, 1]
    scores = (scores + 1) / 2
    return np.power(scores, self.scale).sum(axis=1)

  def recommend(self, users_hist):
    m = users_hist.interactions_matrix.tocsr()
    out = []
    for i in range(len(users_hist.users)):
      items = m.indices[m.indptr[i]:m.indptr[i + 1]]
      out.append(self._recommend_single(items))
    return out


class InferenceRecommender(Recommender):
  """Model-based top-k recommendations via :class:`Recoder.recommend`."""

  def __init__(self, model, num_recommendations):
    self.model = model
    self.num_recommendations = num_recommendations

  def recommend(self, users_hist):
    return self.model.recommend(users_hist, self.num_recommendations)

  def recommend_async(self, users_hist):
    """Dispatch on device, return a handle; fetch with ``np.asarray``.

    Lets the evaluator overlap device compute/transfers across batches
    (one fetch round trip per batch otherwise dominates on tunneled
    platforms).
    """
    return self.model.recommend_async(users_hist, self.num_recommendations)
