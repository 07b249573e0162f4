"""Padding-budget overflow behavior: the host collator falls back to
the bucket ladder (correctness preserved, extra compile), the device
pipeline truncates the overflowing mega-batch tail (documented,
bounded by the sampled margin)."""

import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import BatchCollator, RecommendationDataset
from recoder_tpu.data.device_pipeline import DeviceDataSource
from recoder_tpu.utils import dataframe_to_csr_matrix


@pytest.fixture
def matrix():
  rng = np.random.default_rng(0)
  df = pd.DataFrame({'u': rng.integers(0, 30, 2000),
                     'i': rng.integers(0, 500, 2000),
                     'v': 1.0}).drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  return m


def test_host_collator_ladder_fallback(matrix):
  ds = RecommendationDataset(matrix)
  inter, _ = ds[np.arange(30)]
  true_union = len(np.unique(inter.interactions_matrix.indices))
  # fixed widths far too small: collator must fall back, not truncate
  collator = BatchCollator(batch_size=10, negative_sampling=True,
                           num_items=matrix.shape[1],
                           fixed_union_width=8, fixed_nnz_width=8)
  batches = collator.collate(inter)
  for b in batches:
    assert b.num_items_in_batch == true_union
    assert len(b.items) >= true_union          # ladder-padded, not 8
    assert b.nnz == int(np.diff(matrix.indptr[
        b.users[0]:b.users[0] + 0 + 1]).sum()) or b.nnz > 0
    assert len(b.rows) >= b.nnz


def test_device_pipeline_overflow_truncates(matrix):
  """A too-small nnz budget drops the mega-batch tail but never
  produces out-of-range indices."""
  import jax.numpy as jnp
  src = DeviceDataSource(matrix, batch_size=30, num_sampling_users=30,
                         num_items=matrix.shape[1], union_width=512,
                         mega_nnz_budget=64)  # << real nnz
  perm = jnp.asarray(np.concatenate([
      np.arange(matrix.shape[0]),
      np.arange(matrix.shape[0], src.n_pad)]).astype(np.int32))
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  rows = np.asarray(b['rows'])
  cols = np.asarray(b['cols'])
  # only budget-many slots exist; all indices in safe ranges
  assert rows.shape[0] == 64
  assert rows.max() <= 30          # valid row or the dropped sentinel
  assert cols.max() <= 512
  assert int(b['width_valid']) <= 512


def test_device_pipeline_union_overflow_drops(matrix):
  """A union wider than union_width drops the overflowing (highest-id)
  items; everything else stays consistent."""
  import jax.numpy as jnp
  src = DeviceDataSource(matrix, batch_size=30, num_sampling_users=30,
                         num_items=matrix.shape[1], union_width=256)
  perm = jnp.asarray(np.concatenate([
      np.arange(matrix.shape[0]),
      np.arange(matrix.shape[0], src.n_pad)]).astype(np.int32))
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  true_union = np.unique(matrix.indices)
  items = np.asarray(b['items'])
  assert len(true_union) > 256  # fixture genuinely overflows
  # kept items are exactly the 256 smallest union ids
  np.testing.assert_array_equal(items, true_union[:256])
  # overflowing ranks exceed the slab width and are dropped by the
  # scatter's mode='drop'; densifying stays in-bounds and consistent
  dense = np.zeros((30, 256), np.float32)
  rows = np.asarray(b['rows'])
  cols = np.asarray(b['cols'])
  vals = np.asarray(b['vals'])
  keep = (rows < 30) & (cols < 256)
  np.add.at(dense, (rows[keep], cols[keep]), vals[keep])
  # every kept (row, item) really is an interaction on a kept item
  for r, c in zip(rows[keep], cols[keep]):
    assert matrix[r, items[c]] > 0


def test_device_pipeline_overflow_counters(matrix):
  """build_batch reports [nnz_dropped, union_dropped] (VERDICT r1 #4)."""
  import jax.numpy as jnp
  perm_full = np.arange(matrix.shape[0]).astype(np.int32)

  # nnz overflow: budget 64 << real nnz
  src = DeviceDataSource(matrix, batch_size=30, num_sampling_users=30,
                         num_items=matrix.shape[1], union_width=512,
                         mega_nnz_budget=64)
  perm = jnp.asarray(np.concatenate(
      [perm_full, np.arange(matrix.shape[0], src.n_pad)]).astype(np.int32))
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  ov = np.asarray(b['overflow'])
  assert ov[0] == matrix.nnz - 64

  # union overflow: width 256 < true union
  src = DeviceDataSource(matrix, batch_size=30, num_sampling_users=30,
                         num_items=matrix.shape[1], union_width=256)
  perm = jnp.asarray(np.concatenate(
      [perm_full, np.arange(matrix.shape[0], src.n_pad)]).astype(np.int32))
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  ov = np.asarray(b['overflow'])
  true_union = len(np.unique(matrix.indices))
  assert ov[1] == true_union - 256
  assert ov[0] == 0

  # adequate budgets: both zero
  src = DeviceDataSource(matrix, batch_size=30, num_sampling_users=30,
                         num_items=matrix.shape[1], union_width=512)
  perm = jnp.asarray(np.concatenate(
      [perm_full, np.arange(matrix.shape[0], src.n_pad)]).astype(np.int32))
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  np.testing.assert_array_equal(np.asarray(b['overflow']), [0, 0])


def test_trainer_detects_overflow_and_rebuilds(matrix, caplog):
  """Forced overflow -> warning + budget growth at the next epoch
  boundary; the rebuilt source no longer overflows."""
  import logging
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[16], noise_prob=0.0)
  tr = Recoder(model=model, optimizer_type='adam', loss='mse')
  tr._init_training(ds, weight_decay=0.0)

  # pre-seed the fused-source cache with a deliberately starved source
  starved = DeviceDataSource(ds.interactions_matrix, batch_size=30,
                             num_sampling_users=30,
                             num_items=tr.num_items, union_width=512,
                             mega_nnz_budget=64)
  tr._fused_source_cache = (ds.interactions_matrix,
                            (30, 30, None, 'users', 0, False, 'auto'),
                                starved)

  with caplog.at_level(logging.WARNING, logger='recoder_tpu'):
    # slab_cache off: the dense-slab cache serves fd steps without a
    # nnz budget at all, so no overflow is possible on that path
    tr.train(train_dataset=ds, batch_size=30, num_sampling_users=30,
             num_epochs=1, negative_sampling=True, slab_cache=False)
  assert tr._overflow_rebuild is not None
  assert any('overflow' in r.message for r in caplog.records)

  # next train call rebuilds with grown budget and trains clean
  tr.train(train_dataset=ds, batch_size=30, num_sampling_users=30,
           num_epochs=2, negative_sampling=True, slab_cache=False)
  rebuilt = tr._fused_source_cache[2]
  assert rebuilt.mega_nnz_budget > 64
  assert tr._overflow_rebuild is None or rebuilt.mega_nnz_budget >= matrix.nnz


def test_rebuild_with_partial_epoch_iterator(matrix, caplog):
  """A budget rebuild while a partial-epoch iterator is retained must
  restart the epoch instead of feeding old-budget epoch tables to the
  new-budget step trace (users-precompute mode + iters_per_epoch)."""
  import logging
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                        noise_prob=0.0),
               optimizer_type='adam', loss='mse')
  tr._init_training(ds, weight_decay=0.0)
  starved = DeviceDataSource(ds.interactions_matrix, batch_size=10,
                             num_sampling_users=10,
                             num_items=tr.num_items, union_width=512,
                             mega_nnz_budget=32, shuffle='users')
  assert starved.users_precompute
  tr._fused_source_cache = (ds.interactions_matrix,
                            (10, 10, None, 'users', 0, False, 'auto'),
                            starved)
  with caplog.at_level(logging.INFO, logger='recoder_tpu'):
    # partial epochs: 1 batch per train-loop epoch, several epochs --
    # the overflow fires in epoch 1, the rebuild lands at epoch 2
    # while the epoch-1 iterator is only partially consumed
    tr.train(train_dataset=ds, batch_size=10, num_sampling_users=10,
             num_epochs=4, iters_per_epoch=1, negative_sampling=True,
             shuffle='users', slab_cache=False)
  assert any('restarting the epoch' in r.message
             for r in caplog.records)
  for v in tr.model.params.values():
    assert np.isfinite(np.asarray(v)).all()


def test_note_overflow_takes_elementwise_max(matrix):
  """Out-of-order async epoch notes must not shrink a pending rebuild
  request (elementwise max, not overwrite)."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8]),
               optimizer_type='adam', loss='mse')
  tr._note_overflow(np.asarray([10, 2, 5000, 64]))
  tr._note_overflow(np.asarray([1, 1, 50, 8]))  # late, smaller
  assert tr._overflow_rebuild == (5000, 64)


def test_rebuild_preserves_slab_cache(matrix, caplog):
  """An overflow-triggered source rebuild must re-establish the
  dense-slab cache on the new source (the fd path itself cannot
  overflow, but a pending note from an earlier config can force a
  rebuild mid-slab-run)."""
  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8],
                                        noise_prob=0.0),
               optimizer_type='adam', loss='mse', seed=1)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True, full_decode=True, slab_cache=True)
  assert tr._fused_source_cache[2].d_slab is not None

  tr._overflow_rebuild = (16, 8)  # pending note from elsewhere
  tr.train(train_dataset=ds, batch_size=8, num_epochs=3,
           negative_sampling=True, full_decode=True, slab_cache=True)
  rebuilt = tr._fused_source_cache[2]
  assert rebuilt.d_slab is not None, \
      'slab cache lost across the overflow rebuild'
  for v in tr.model.params.values():
    assert np.isfinite(np.asarray(v)).all()
