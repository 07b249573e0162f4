"""Ranking metrics and the recommender evaluator.

Parity with reference recoder/metrics.py: the per-user functions
(average_precision :9, recall :23, dcg :32, ndcg :41), the Metric class
hierarchy (:48-132), and RecommenderEvaluator (:135-232).

TPU-first addition: every standard metric also implements
``evaluate_batch(x_batch, y_list)`` -- a vectorized numpy evaluation
over a whole batch of users that the trainer's fast eval path uses
(the reference loops per user and fans out to multiprocessing workers,
metrics.py:174-230; a vectorized pass over the top-k hit matrix is
orders of magnitude cheaper than either).
"""

import numpy as np

from recoder_tpu.data import RecommendationDataLoader


def average_precision(x, y, k, normalize=True):
  """AP@k of ranked list ``x`` against relevant set ``y``."""
  x = np.asarray(x)[:k]
  x_in_y = np.isin(x, y, assume_unique=True).astype(int)
  tp = x_in_y.cumsum()
  precision = tp / (1 + np.arange(len(x)))
  precision_drecall = precision * x_in_y
  normalization = min(k, len(y)) if normalize else len(y)
  return precision_drecall.sum() / normalization


def recall(x, y, k, normalize=True):
  """Recall@k of ranked list ``x`` against relevant set ``y``."""
  x = np.asarray(x)[:k]
  x_in_y = np.isin(x, y, assume_unique=True).astype(int)
  normalization = min(k, len(y)) if normalize else len(y)
  return x_in_y.sum() / normalization


def dcg(x, y, k):
  """DCG@k (binary gains)."""
  x = np.asarray(x)[:k]
  x_in_y = np.isin(x, y, assume_unique=True).astype(int)
  cg = x_in_y / np.log2(2 + np.arange(len(x)))
  return cg.sum()


def ndcg(x, y, k):
  """NDCG@k = DCG@k / IDCG@k (binary gains)."""
  return dcg(x, y, k) / dcg(y, y, k)


def _hits_matrix(x_batch, y_list, k):
  """hits[b, j] = 1 iff x_batch[b, j] is relevant for user b (j < k)."""
  x_batch = np.asarray(x_batch)[:, :k]
  B, K = x_batch.shape
  hits = np.zeros((B, K), dtype=np.float64)
  for b, y in enumerate(y_list):
    if len(y):
      hits[b] = np.isin(x_batch[b], y, assume_unique=True)
  return hits


def hits_from_relevant(x_batch, y_list, num_items=None):
  """Hits matrix via ONE vectorized membership test.

  Replaces per-user ``np.isin`` calls (the evaluator's profile showed
  them dominating eval time) with a single ``np.isin`` over
  row-offset id spaces: memory is O(B*K + sum(|y|)) regardless of
  catalog size (a dense [B, num_items] bool table costs ~0.5 GB per
  500-user batch at a 1M-item catalog). ``-1`` padding in ``x_batch``
  never matches. ``num_items`` is accepted for API compatibility and
  unused.
  """
  del num_items
  x_batch = np.asarray(x_batch)
  B, K = x_batch.shape
  lens = np.array([len(y) for y in y_list])
  if not lens.sum():
    return np.zeros((B, K), np.float64)
  rows_flat = np.repeat(np.arange(B, dtype=np.int64), lens)
  cols_flat = np.concatenate(
      [np.asarray(y) for y in y_list if len(y)]).astype(np.int64)
  stride = int(max(cols_flat.max(),
                   x_batch.max() if x_batch.size else 0)) + 1
  y_off = rows_flat * stride + cols_flat
  valid = x_batch >= 0
  x_off = (np.arange(B, dtype=np.int64)[:, None] * stride
           + np.where(valid, x_batch, 0))
  return (np.isin(x_off, y_off) & valid).astype(np.float64)


class Metric:
  """Base metric. ``evaluate(x, y)`` scores one user's ranked list
  ``x`` against their relevant items ``y``."""

  def __init__(self, metric_name):
    self.metric_name = metric_name

  def __str__(self):
    return self.metric_name

  def __hash__(self):
    return self.metric_name.__hash__()

  def __eq__(self, other):
    return str(self) == str(other)

  def evaluate(self, x, y):
    raise NotImplementedError

  def evaluate_batch(self, x_batch, y_list, hits=None):
    """Vectorized scoring of a batch; default falls back to the loop.

    ``hits`` optionally carries the precomputed full-width relevance
    matrix (see :func:`hits_from_relevant`) shared across metrics.
    Negative ids are rectangle padding (ragged recommendation lists)
    and are stripped before the per-user call -- the per-user formulas
    use ``np.isin(..., assume_unique=True)``, which duplicates would
    silently break.
    """
    del hits
    out = []
    for x, y in zip(x_batch, y_list):
      x = np.asarray(x)
      out.append(self.evaluate(x[x >= 0], y))
    return np.array(out)


class AveragePrecision(Metric):
  """AP@k. ``normalize=True`` divides by min(k, |y|) instead of |y|."""

  def __init__(self, k, normalize=True):
    super().__init__(metric_name=f'AveragePrecision@{k}')
    self.k = k
    self.normalize = normalize

  def evaluate(self, x, y):
    return average_precision(x, y, k=self.k, normalize=self.normalize)

  def evaluate_batch(self, x_batch, y_list, hits=None):
    hits = (hits[:, :self.k] if hits is not None
            else _hits_matrix(x_batch, y_list, self.k))
    tp = hits.cumsum(axis=1)
    precision = tp / (1 + np.arange(hits.shape[1]))[None, :]
    num = (precision * hits).sum(axis=1)
    y_len = np.array([len(y) for y in y_list], dtype=np.float64)
    denom = np.minimum(self.k, y_len) if self.normalize else y_len
    with np.errstate(divide='ignore', invalid='ignore'):
      return num / denom


class Recall(Metric):
  """Recall@k. ``normalize=True`` divides by min(k, |y|)."""

  def __init__(self, k, normalize=True):
    super().__init__(metric_name=f'Recall@{k}')
    self.k = k
    self.normalize = normalize

  def evaluate(self, x, y):
    return recall(x, y, k=self.k, normalize=self.normalize)

  def evaluate_batch(self, x_batch, y_list, hits=None):
    hits = (hits[:, :self.k] if hits is not None
            else _hits_matrix(x_batch, y_list, self.k))
    y_len = np.array([len(y) for y in y_list], dtype=np.float64)
    denom = np.minimum(self.k, y_len) if self.normalize else y_len
    with np.errstate(divide='ignore', invalid='ignore'):
      return hits.sum(axis=1) / denom


class NDCG(Metric):
  """NDCG@k with binary gains."""

  def __init__(self, k):
    super().__init__(metric_name=f'NDCG@{k}')
    self.k = k

  def evaluate(self, x, y):
    return ndcg(x, y, k=self.k)

  def evaluate_batch(self, x_batch, y_list, hits=None):
    hits = (hits[:, :self.k] if hits is not None
            else _hits_matrix(x_batch, y_list, self.k))
    discounts = 1.0 / np.log2(2 + np.arange(self.k))
    dcg_k = (hits * discounts[None, :hits.shape[1]]).sum(axis=1)
    y_len = np.array([min(len(y), self.k) for y in y_list])
    # idcg = sum of the first min(k, |y|) discounts
    cum = np.concatenate([[0.0], np.cumsum(discounts)])
    idcg_k = cum[y_len]
    with np.errstate(divide='ignore', invalid='ignore'):
      return dcg_k / idcg_k


class RecommenderEvaluator:
  """Evaluates a Recommender over a dataset with a set of Metrics.

  Args:
    recommender (recoder_tpu.recommender.Recommender): recommender.
    metrics (list[Metric]): metrics to compute.
  """

  def __init__(self, recommender, metrics):
    self.recommender = recommender
    self.metrics = metrics

  def evaluate(self, eval_dataset, batch_size=1, num_users=None,
               num_workers=0):
    """Returns {metric: [per-user values]}.

    ``num_workers`` is accepted for API parity; metric math here is
    vectorized per batch so worker processes are unnecessary. When the
    recommender exposes ``recommend_async`` (the model-based one does),
    device dispatch runs a few batches ahead of result fetching, hiding
    per-batch transfer latency.

    Deviation from the reference (documented in SURVEY.md section 7):
    users whose relevant-item set is empty are SKIPPED, where the
    reference emits NaN for them (0/0, reference metrics.py:26,45).
    Returned per-user lists can therefore be shorter than a reference
    run's on the same data, and means differ whenever empty-target
    users exist (NaN would propagate through the reference's
    ``np.mean`` anyway, so the reference's means are NaN in that case).
    """
    del num_workers
    import collections
    if getattr(self.recommender, 'topk_mode', None) == 'approx':
      # eval_topk='approx' is a serving-only mode (raw approx_max_k at
      # a ~0.95 recall target, model.py eval_topk docs): metrics
      # computed from its candidate sets are quietly degraded
      import warnings
      warnings.warn(
          "evaluating with eval_topk='approx': Recall/NDCG are computed "
          "from ~0.95-recall approximate top-k candidates and will read "
          "low. Use eval_topk='exact' (certified, default) for reported "
          "metrics; 'approx' is a serving-only latency mode.",
          UserWarning, stacklevel=2)
    dataloader = RecommendationDataLoader(eval_dataset, batch_size=batch_size,
                                          collate_fn=lambda _: _,
                                          shuffle=False)
    results = {metric: [] for metric in self.metrics}

    def score(recommendations, relevant):
      # users with no relevant items are undefined under every metric
      # (0/0); skip them instead of poisoning the means with NaN
      keep = [i for i, y in enumerate(relevant) if len(y)]
      if not keep:
        return
      if len(keep) != len(relevant):
        recommendations = [recommendations[i] for i in keep]
        relevant = [relevant[i] for i in keep]
      # pad ragged recommendation lists to a rectangle for batch eval
      max_len = max((len(r) for r in recommendations), default=0)
      rect = np.full((len(recommendations), max(max_len, 1)), -1,
                     dtype=np.int64)
      for i, r in enumerate(recommendations):
        rect[i, :len(r)] = r
      # one relevance lookup shared by every metric
      shared_hits = hits_from_relevant(rect, relevant)
      for metric in self.metrics:
        results[metric].extend(
            metric.evaluate_batch(rect, relevant,
                                  hits=shared_hits).tolist())

    use_async = hasattr(self.recommender, 'recommend_async')
    pending = collections.deque()

    def fetch(result):
      # recommend_async returns either a rectangular [B, k] device
      # array (the model-based recommender) or an already-ragged list
      # of per-user id arrays (trimmed recommenders, e.g. EASE)
      if isinstance(result, (list, tuple)):
        return [np.asarray(r).tolist() for r in result]
      return np.asarray(result).tolist()

    processed = 0
    if use_async:
      # batch staging + dispatch runs on one worker thread (host->device
      # transfers block the caller on tunneled platforms); the main
      # thread fetches results and scores, a few batches behind
      from concurrent.futures import ThreadPoolExecutor
      with ThreadPoolExecutor(max_workers=1) as pool:
        for input, target in dataloader:
          tgt = target.interactions_matrix
          relevant = [tgt.indices[tgt.indptr[i]:tgt.indptr[i + 1]]
                      for i in range(len(target.users))]
          pending.append(
              (pool.submit(self.recommender.recommend_async, input),
               relevant))
          if len(pending) > 3:
            fut, rel = pending.popleft()
            score(fetch(fut.result()), rel)
          processed += len(target.users)
          if num_users is not None and processed >= num_users:
            break
        while pending:
          fut, rel = pending.popleft()
          score(fetch(fut.result()), rel)
      return results

    for input, target in dataloader:
      tgt = target.interactions_matrix
      relevant = [tgt.indices[tgt.indptr[i]:tgt.indptr[i + 1]]
                  for i in range(len(target.users))]
      score(self.recommender.recommend(input), relevant)
      processed += len(target.users)
      if num_users is not None and processed >= num_users:
        break

    return results
