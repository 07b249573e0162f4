"""Metric tests: the reference's hand-computed truth tables
(tests/test_metrics.py) plus equality between the per-user and
vectorized-batch implementations."""

import numpy as np
import pytest

from recoder_tpu.metrics import (AveragePrecision, Metric, NDCG,
                                 Recall, hits_from_relevant, recall)

RTOL = 1e-9
ATOL = 0.0


test_ap_tests = [
    (np.arange(10), [0, 2, 5, 8, 9], 10, False,
     1 / 5 * (1 + 2 / 3 + 3 / 6 + 4 / 9 + 5 / 10)),
    (np.arange(10), [1, 4, 5, 6, 12], 10, False,
     1 / 5 * (1 / 2 + 2 / 5 + 3 / 6 + 4 / 7 + 0)),
    (np.arange(10), [0, 1, 2, 3, 4], 10, False, 1),
    (np.arange(10), [0, 2, 5, 8, 9], 3, True, 1 / 3 * (1 + 2 / 3)),
    (np.arange(10), [1, 4, 5, 6, 12], 3, True, 1 / 3 * (1 / 2)),
]


@pytest.mark.parametrize('x, y, k, normalize, expected_value', test_ap_tests)
def test_ap(x, y, k, normalize, expected_value):
  metric = AveragePrecision(k=k, normalize=normalize)
  assert np.isclose(metric.evaluate(x, y), expected_value,
                    rtol=RTOL, atol=ATOL)


test_recall_tests = [
    (np.arange(10), [0, 2, 5, 8, 9], 10, False, 1),
    (np.arange(10), [1, 4, 5, 6, 12], 10, False, 4 / 5),
    (np.arange(10), [0, 2, 5, 8, 9], 3, False, 2 / 5),
    (np.arange(10), [1, 4, 5, 6, 12], 3, False, 1 / 5),
    (np.arange(10), [0, 2, 5, 8, 9], 3, True, 2 / 3),
    (np.arange(10), [1, 4, 5, 6, 12], 3, True, 1 / 3),
]


@pytest.mark.parametrize('x, y, k, normalize, expected_value',
                         test_recall_tests)
def test_recall(x, y, k, normalize, expected_value):
  metric = Recall(k=k, normalize=normalize)
  assert np.isclose(metric.evaluate(x, y), expected_value,
                    rtol=RTOL, atol=ATOL)


test_ndcg_tests = [
    (np.arange(10), [0, 2, 5, 8, 9], 10, 0.8296882915641869),
    (np.arange(10), [1, 4, 5, 6, 12], 10, 0.5790560467042355),
    (np.arange(10), [0, 2, 5, 8, 9], 3, 0.7039180890341347),
    (np.arange(10), [1, 4, 5, 6, 12], 3, 0.2960819109658652),
]


@pytest.mark.parametrize('x, y, k, expected_value', test_ndcg_tests)
def test_ndcg(x, y, k, expected_value):
  metric = NDCG(k=k)
  assert np.isclose(metric.evaluate(x, y), expected_value,
                    rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize('metric', [
    AveragePrecision(k=10), AveragePrecision(k=3, normalize=False),
    Recall(k=10), Recall(k=4, normalize=False), NDCG(k=10), NDCG(k=3)])
def test_batch_matches_per_user(metric):
  rng = np.random.default_rng(7)
  B, K = 50, 10
  x_batch = np.stack([rng.permutation(100)[:K] for _ in range(B)])
  y_list = [np.unique(rng.integers(0, 100, rng.integers(1, 20)))
            for _ in range(B)]
  batch_vals = metric.evaluate_batch(x_batch, y_list)
  loop_vals = np.array([metric.evaluate(x, y)
                        for x, y in zip(x_batch, y_list)])
  np.testing.assert_allclose(batch_vals, loop_vals, rtol=1e-12)

  # the shared precomputed hits matrix must give identical values
  from recoder_tpu.metrics import hits_from_relevant
  shared = hits_from_relevant(x_batch, y_list)
  shared_vals = metric.evaluate_batch(x_batch, y_list, hits=shared)
  np.testing.assert_allclose(shared_vals, loop_vals, rtol=1e-12)


def test_evaluate_batch_fallback_strips_padding():
  """The base-class per-user fallback must strip -1 rectangle padding:
  the per-user formulas use np.isin(assume_unique=True), which
  duplicated pad ids would silently break."""

  class LoopOnly(Metric):
    def __init__(self):
      super().__init__('LoopOnly')

    def evaluate(self, x, y):
      assert np.all(np.asarray(x) >= 0)
      return recall(x, y, k=len(x) or 1, normalize=False)

  rect = np.array([[5, 2, -1, -1], [1, 0, 3, -1]])
  y_list = [np.array([2, 9]), np.array([0, 3])]
  got = LoopOnly().evaluate_batch(rect, y_list)
  np.testing.assert_allclose(got, [0.5, 1.0])
  # padded and unpadded ranked lists agree with the real metrics
  r = Recall(k=2, normalize=False)
  np.testing.assert_allclose(
      r.evaluate_batch(rect, y_list),
      [r.evaluate(np.array([5, 2]), y_list[0]),
       r.evaluate(np.array([1, 0]), y_list[1])])


def test_hits_from_relevant_large_sparse_ids():
  """Membership math must not depend on a dense [B, num_items] table:
  huge item ids (1M-item catalogs) must work in O(B*K + nnz) memory."""
  big = 50_000_000
  x = np.array([[big - 1, 3, -1], [big - 2, 0, big - 1]])
  y = [np.array([3, big - 1]), np.array([big - 2])]
  got = hits_from_relevant(x, y)
  np.testing.assert_array_equal(got, [[1, 1, 0], [1, 0, 0]])


def test_evaluator_warns_on_approx_topk():
  """eval_topk='approx' is serving-only (~0.95 recall target,
  model.py eval_topk docs): computing evaluation metrics from its
  candidate sets must WARN so quality numbers are never silently
  approximate. 'exact' (default) must stay silent."""
  import warnings

  import pandas as pd

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.metrics import Recall, RecommenderEvaluator
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder
  from recoder_tpu.recommender import InferenceRecommender
  from recoder_tpu.utils import dataframe_to_csr_matrix

  rng = np.random.default_rng(0)
  df = pd.DataFrame({'uid': rng.integers(0, 30, 300),
                     'sid': rng.integers(0, 50, 300),
                     'watched': 1.0}).drop_duplicates(['uid', 'sid'])
  m, _, _ = dataframe_to_csr_matrix(df, 'uid', 'sid', 'watched')
  ds = RecommendationDataset(m)
  val_ds = RecommendationDataset(m, m)

  def build(eval_topk):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8]),
                 optimizer_type='adam', loss='mse', eval_topk=eval_topk)
    tr.train(train_dataset=ds, batch_size=15, num_epochs=1,
             negative_sampling=True)
    return tr

  tr = build('approx')
  with pytest.warns(UserWarning, match="approx"):
    tr.evaluate(eval_dataset=val_ds, num_recommendations=5,
                metrics=[Recall(k=5)], batch_size=15)
  # the plumbing the warning rests on: the recommender exposes the mode
  assert InferenceRecommender(tr, 5).topk_mode == 'approx'

  tr_exact = build('exact')
  with warnings.catch_warnings():
    warnings.simplefilter('error')
    tr_exact.evaluate(eval_dataset=val_ds, num_recommendations=5,
                      metrics=[Recall(k=5)], batch_size=15)

  # the guard is in the evaluator itself, so third-party recommenders
  # that declare topk_mode get it too
  class FakeRec:
    topk_mode = 'approx'
    def recommend(self, users_hist):
      return [[0] for _ in users_hist.users]

  with pytest.warns(UserWarning, match="serving-only"):
    RecommenderEvaluator(FakeRec(), [Recall(k=1)]).evaluate(
        val_ds, batch_size=15)
