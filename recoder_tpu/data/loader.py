"""Mega-batch negative-sampling loader emitting static-shape slabs.

Parity with reference recoder/data.py:86-251 (RecommendationDataLoader,
Batch, BatchCollator). The central trick is unchanged: a *mega-batch*
of ``num_sampling_users`` users is fetched at once, the union of items
any of them touched becomes the compressed column space
(reference data.py:220 ``np.unique(..., return_inverse=True)``), and the
mega-batch is sliced into ``batch_size`` compute batches that all share
that union -- so each user's negatives are the other users' positives.

TPU-first differences from the reference:
  * Batches carry padded COO arrays (rows/cols/vals) plus valid counts;
    the union width and nnz are padded to :class:`BucketLadder` sizes so
    jit compiles a handful of programs instead of one per shape.
  * Densification happens on-device inside the jitted train step
    (reference densifies via torch.sparse at model.py:457-458).
  * Collation runs on a background thread pool (double-buffered
    prefetch) instead of torch DataLoader worker processes
    (reference data.py:135-136).
"""


import numpy as np

from recoder_tpu.data.buckets import BucketLadder


class Batch:
  """A static-shape sparse batch of user-item interactions.

  Attributes:
    users (np.ndarray int32 [batch_pad]): user ids (pad: 0 beyond num_users).
    items (np.ndarray int32 [union_pad] or None): the item-union ids for
      this batch's compressed column space; ``None`` means full catalog.
      Padding slots hold ``pad_item_id`` (= logical num_items sentinel).
    rows (np.ndarray int32 [nnz_pad]): COO row index per interaction;
      padding slots hold ``batch_pad`` (out of range -> dropped on scatter).
    cols (np.ndarray int32 [nnz_pad]): COO column index in the compressed
      (or full) column space.
    vals (np.ndarray float32 [nnz_pad]): interaction values (pad: 0).
    num_users (int): valid user rows.
    num_items_in_batch (int): valid union width (== size[1] if full).
    nnz (int): valid interaction count.
    size (tuple): logical dense shape (num_users, vector_dim).
  """

  def __init__(self, users, items, rows, cols, vals,
               num_users, num_items_in_batch, nnz, size,
               pad_item_id=None):
    self.users = users
    self.items = items
    self.rows = rows
    self.cols = cols
    self.vals = vals
    self.num_users = num_users
    self.num_items_in_batch = num_items_in_batch
    self.nnz = nnz
    self.size = size
    self.pad_item_id = pad_item_id


class BatchCollator:
  """Collates :class:`UsersInteractions` into static-shape :class:`Batch` es.

  Args:
    batch_size (int): users per compute batch.
    negative_sampling (bool): compress columns to the mega-batch item
      union (mini-batch based negative sampling).
    num_items (int, optional): logical catalog size; used as the pad
      sentinel id for union padding. Defaults to the matrix width.
    item_ladder (BucketLadder, optional): ladder for union padding.
    nnz_ladder (BucketLadder, optional): ladder for nnz padding.
    pad_users_to_batch_size (bool): pad the last slice's rows up to
      ``batch_size`` (keeps the leading axis static).
  """

  def __init__(self, batch_size, negative_sampling=False, num_items=None,
               item_ladder=None, nnz_ladder=None,
               pad_users_to_batch_size=True,
               fixed_union_width=None, fixed_nnz_width=None,
               num_random_negatives=0, seed=0):
    self.batch_size = batch_size
    self.negative_sampling = negative_sampling
    self.num_items = num_items
    self.num_random_negatives = int(num_random_negatives)
    self._neg_rng = np.random.default_rng(seed + 7)
    # numpy Generators are not thread-safe; prefetch workers collate
    # concurrently, so the draw is serialized (order across
    # mega-batches still depends on scheduling under num_workers > 0,
    # like the reference's multi-process loader)
    import threading
    self._neg_lock = threading.Lock()
    self.item_ladder = item_ladder or BucketLadder(min_size=256, growth=1.25)
    self.nnz_ladder = nnz_ladder or BucketLadder(min_size=1024, growth=1.25)
    self.pad_users_to_batch_size = pad_users_to_batch_size
    # stable-shape mode: one compiled program instead of one per bucket
    # pair; the ladder is the fallback when a mega-batch overflows
    self.fixed_union_width = fixed_union_width
    self.fixed_nnz_width = fixed_nnz_width

  def _fit_union(self, n):
    if self.fixed_union_width is not None and n <= self.fixed_union_width:
      return self.fixed_union_width
    return self.item_ladder.fit(max(n, 1))

  def _fit_nnz(self, n):
    if self.fixed_nnz_width is not None and n <= self.fixed_nnz_width:
      return self.fixed_nnz_width
    return self.nnz_ladder.fit(max(n, 1))

  def collate(self, users_interactions):
    """Collate one mega-batch into a list of :class:`Batch`.

    Mirrors reference data.py:203-251 semantics (shared union across
    slices, per-slice COO) with padding on top.
    """
    matrix = users_interactions.interactions_matrix.tocsr()
    batch_users = np.asarray(users_interactions.users)
    num_rows, full_dim = matrix.shape
    num_items = self.num_items if self.num_items is not None else full_dim

    indptr = matrix.indptr
    all_cols = matrix.indices
    all_vals = matrix.data

    if self.negative_sampling:
      # item union of the mega-batch -> compressed column space
      batch_items, compressed_cols = np.unique(all_cols, return_inverse=True)
      if self.num_random_negatives:
        # extra uniform-random negatives widen the union (zero-valued
        # decode columns); see DeviceDataSource.build_batch
        with self._neg_lock:
          rand = self._neg_rng.integers(0, num_items,
                                        self.num_random_negatives)
        merged = np.union1d(batch_items, rand).astype(batch_items.dtype)
        compressed_cols = np.searchsorted(
            merged, batch_items)[compressed_cols]
        batch_items = merged
      union = len(batch_items)
      union_pad = self._fit_union(union)
      items_padded = np.full(union_pad, num_items, dtype=np.int32)
      items_padded[:union] = batch_items
      vector_dim = union
    else:
      compressed_cols = all_cols
      items_padded = None
      union = full_dim
      vector_dim = full_dim

    batches = []
    for offset in range(0, num_rows, self.batch_size):
      hi = min(offset + self.batch_size, num_rows)
      rows_valid = hi - offset
      lo_ptr, hi_ptr = indptr[offset], indptr[hi]
      nnz = int(hi_ptr - lo_ptr)

      counts = np.diff(indptr[offset:hi + 1])
      slice_rows = np.repeat(np.arange(rows_valid, dtype=np.int32), counts)
      slice_cols = compressed_cols[lo_ptr:hi_ptr].astype(np.int32)
      slice_vals = all_vals[lo_ptr:hi_ptr].astype(np.float32)

      batch_pad = self.batch_size if self.pad_users_to_batch_size else rows_valid
      nnz_pad = self._fit_nnz(nnz)

      rows_p = np.full(nnz_pad, batch_pad, dtype=np.int32)  # OOB -> dropped
      cols_p = np.zeros(nnz_pad, dtype=np.int32)
      vals_p = np.zeros(nnz_pad, dtype=np.float32)
      rows_p[:nnz] = slice_rows
      cols_p[:nnz] = slice_cols
      vals_p[:nnz] = slice_vals

      users_p = np.zeros(batch_pad, dtype=np.int32)
      users_p[:rows_valid] = batch_users[offset:hi]

      batches.append(Batch(
          users=users_p, items=items_padded,
          rows=rows_p, cols=cols_p, vals=vals_p,
          num_users=rows_valid, num_items_in_batch=union, nnz=nnz,
          size=(rows_valid, vector_dim), pad_item_id=num_items))

    return batches


class RecommendationDataLoader:
  """Iterates a :class:`RecommendationDataset` in shuffled mega-batches.

  Yields ``(input_batch, target_batch_or_None)`` pairs, one per compute
  batch, like the reference loader (data.py:138-144). Collation of the
  next mega-batches runs ahead on background threads.

  Args:
    dataset (RecommendationDataset): source dataset.
    batch_size (int): users per compute batch.
    negative_sampling (bool): mini-batch based negative sampling.
    num_sampling_users (int): mega-batch size (>= batch_size); 0 means
      equal to ``batch_size``.
    num_workers (int): background collation threads (0 = synchronous).
    collate_fn (callable, optional): custom collation over
      :class:`UsersInteractions` (used by the evaluator with identity).
    shuffle (bool): shuffle users every epoch.
    seed (int): RNG seed for shuffling.
    item_ladder / nnz_ladder (BucketLadder, optional): padding ladders.
    stable_shapes (bool): estimate fixed union/nnz pad widths from a few
      sampled mega-batches so the whole epoch reuses one compiled step
      (overflowing mega-batches fall back to the ladder). Default True.
  """

  def __init__(self, dataset, batch_size, negative_sampling=False,
               num_sampling_users=0, num_workers=0, collate_fn=None,
               shuffle=True, seed=0, item_ladder=None, nnz_ladder=None,
               stable_shapes=True, num_random_negatives=0):
    self.dataset = dataset
    self.batch_size = batch_size
    self.negative_sampling = negative_sampling
    self.num_sampling_users = num_sampling_users or batch_size
    self.num_workers = num_workers
    self.shuffle = shuffle
    self.num_random_negatives = int(num_random_negatives)
    self._rng = np.random.default_rng(seed)

    assert self.num_sampling_users >= batch_size, \
        'num_sampling_users should be at least equal to the batch_size'

    fixed_union, fixed_nnz = None, None
    if stable_shapes and collate_fn is None:
      fixed_union, fixed_nnz = self._estimate_widths()

    self.batch_collator = BatchCollator(
        batch_size=batch_size, negative_sampling=negative_sampling,
        num_items=dataset.interactions_matrix.shape[1],
        item_ladder=item_ladder, nnz_ladder=nnz_ladder,
        fixed_union_width=fixed_union, fixed_nnz_width=fixed_nnz,
        num_random_negatives=num_random_negatives, seed=seed)

    if collate_fn is None:
      self._collate_fn = self.batch_collator.collate
      self._identity_collate = False
    else:
      self._collate_fn = collate_fn
      self._identity_collate = True

  def _estimate_widths(self, samples=4, margin=1.08, align=256):
    """Estimate stable pad widths from random mega-batch windows.

    Returns (union_width, nnz_width): the sampled maxima with a safety
    margin, snapped to ``align``. Unions across random windows of a
    fixed user count concentrate tightly, so a small margin suffices;
    overflows just fall back to the ladder (a rare extra compile).
    """
    matrix = self.dataset.interactions_matrix
    n = matrix.shape[0]
    rng = np.random.default_rng(1234)
    max_union, max_nnz = 1, 1
    for _ in range(samples):
      idx = rng.choice(n, size=min(self.num_sampling_users, n),
                       replace=False)
      counts = matrix.indptr[idx + 1] - matrix.indptr[idx]
      # per compute-batch nnz: worst window of batch_size users
      for off in range(0, len(idx), self.batch_size):
        max_nnz = max(max_nnz, int(counts[off:off + self.batch_size]
                                   .sum()))
      if self.negative_sampling:
        cols = np.concatenate([
            matrix.indices[matrix.indptr[i]:matrix.indptr[i + 1]]
            for i in idx]) if len(idx) else np.array([], np.int32)
        max_union = max(max_union, len(np.unique(cols)))
    if not self.negative_sampling:
      max_union = matrix.shape[1]

    def snap(v):
      v = int(v * margin)
      return ((v + align - 1) // align) * align

    return snap(max_union + self.num_random_negatives), snap(max_nnz)

  def _mega_batches(self):
    n = len(self.dataset)
    order = self._rng.permutation(n) if self.shuffle else np.arange(n)
    for off in range(0, n, self.num_sampling_users):
      yield order[off:off + self.num_sampling_users]

  def _collate_mega(self, user_idx):
    input_inter, target_inter = self.dataset[user_idx]
    input_out = self._collate_fn(input_inter)
    target_out = self._collate_fn(target_inter) if target_inter is not None else None
    return input_out, target_out

  def __iter__(self):
    if self.num_workers > 0:
      gen = self._prefetched()
    else:
      gen = (self._collate_mega(idx) for idx in self._mega_batches())

    for input_out, target_out in gen:
      if self._identity_collate:
        yield input_out, target_out
      else:
        for i, input_batch in enumerate(input_out):
          yield input_batch, (target_out[i] if target_out is not None else None)

  def _prefetched(self):
    """Collate mega-batches on a thread pool, yielding in order.

    ``num_workers`` collations run concurrently (numpy releases the GIL
    for the heavy ops) with a bounded in-flight window so memory stays
    proportional to the worker count.
    """
    from concurrent.futures import ThreadPoolExecutor
    import collections

    megas = self._mega_batches()
    window = max(2, self.num_workers * 2)
    with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
      pending = collections.deque()
      for idx in megas:
        pending.append(pool.submit(self._collate_mega, idx))
        if len(pending) >= window:
          yield pending.popleft().result()
      while pending:
        yield pending.popleft().result()

  def __len__(self):
    # batches per mega-batch is ceil(mega/batch_size): when the mega
    # size is not a multiple of batch_size, every mega yields a short
    # tail slice (plain ceil(n/bs) would undercount those)
    import math
    n = len(self.dataset)
    S, bs = self.num_sampling_users, self.batch_size
    full, rem = divmod(n, S)
    count = full * math.ceil(S / bs)
    if rem:
      count += math.ceil(rem / bs)
    return count
