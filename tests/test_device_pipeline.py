"""The on-device batch pipeline must reproduce the host collator's
semantics exactly: same user order -> same item union (sorted ids, like
np.unique) -> same dense slab."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import BatchCollator, RecommendationDataset
from recoder_tpu.data.device_pipeline import DeviceDataSource
from recoder_tpu.utils import dataframe_to_csr_matrix


@pytest.fixture
def matrix():
  rng = np.random.default_rng(5)
  df = pd.DataFrame({
      'u': rng.integers(0, 37, 700),
      'i': rng.integers(0, 90, 700),
      'v': rng.integers(1, 5, 700).astype(np.float64),
  }).drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  return m


def densify_host(batch):
  B = len(batch.users)
  W = len(batch.items) if batch.items is not None else batch.size[1]
  dense = np.zeros((B, W), np.float32)
  for r, c, v in zip(batch.rows, batch.cols, batch.vals):
    if r < B:
      dense[r, c] += v
  return dense


def densify_device(b, B, W):
  dense = jnp.zeros((B, W), jnp.float32)
  dense = dense.at[b['rows'], b['cols']].add(b['vals'], mode='drop')
  return np.asarray(dense)


@pytest.mark.parametrize('batch_size,mega', [(8, 8), (8, 16), (5, 20)])
def test_device_matches_host_collator(matrix, batch_size, mega):
  n_users, n_items = matrix.shape
  dataset = RecommendationDataset(matrix)
  union_width = 128
  source = DeviceDataSource(matrix, batch_size=batch_size,
                            num_sampling_users=mega, num_items=n_items,
                            union_width=union_width)
  collator = BatchCollator(batch_size=batch_size, negative_sampling=True,
                           num_items=n_items,
                           fixed_union_width=union_width)

  perm_host = np.arange(n_users)
  perm_dev = jnp.asarray(
      np.concatenate([perm_host,
                      np.arange(n_users, source.n_pad)]).astype(np.int32))

  step = 0
  for off in range(0, n_users, mega):
    window = perm_host[off:off + mega]
    inter, _ = dataset[window]
    host_batches = collator.collate(inter)
    for hb in host_batches:
      db = source.build_batch(perm_dev, jnp.int32(step),
                              negative_sampling=True)
      step += 1
      # same union (sorted ascending, sentinel-padded)
      np.testing.assert_array_equal(np.asarray(db['items']),
                                    hb.items)
      assert int(db['width_valid']) == hb.num_items_in_batch
      assert int(db['num_users']) == hb.num_users
      # same densified slab
      host_dense = densify_host(hb)
      dev_dense = densify_device(db, batch_size, union_width)
      np.testing.assert_allclose(dev_dense[:hb.num_users],
                                 host_dense[:hb.num_users], rtol=1e-6)
      # padded rows carry nothing
      assert np.all(dev_dense[hb.num_users:] == 0)

  assert step == source.steps_per_epoch or step >= source.steps_per_epoch - 1


def test_device_pipeline_binary_detection(matrix):
  binary = matrix.copy()
  binary.data[:] = 1.0
  src = DeviceDataSource(binary, batch_size=8, num_sampling_users=8,
                         num_items=matrix.shape[1], union_width=128)
  assert src.binary
  src2 = DeviceDataSource(matrix, batch_size=8, num_sampling_users=8,
                          num_items=matrix.shape[1], union_width=128)
  assert not src2.binary


def test_device_pipeline_full_catalog(matrix):
  n_users, n_items = matrix.shape
  source = DeviceDataSource(matrix, batch_size=8, num_sampling_users=8,
                            num_items=n_items, union_width=128)
  perm = jnp.asarray(np.arange(source.n_pad).astype(np.int32))
  b = source.build_batch(perm, jnp.int32(0), negative_sampling=False)
  assert b['items'] is None
  dense = densify_device(b, 8, n_items)
  np.testing.assert_allclose(dense, matrix[:8].toarray(), rtol=1e-6)


def test_fused_training_learns(matrix):
  """End-to-end: fused pipeline trains and loss decreases."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[32])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse')
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True)
  p1 = jax.tree_util.tree_map(np.asarray, tr.model.params)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=5,
           negative_sampling=True)
  p2 = tr.model.params
  changed = jax.tree_util.tree_map(
      lambda a, b: not np.allclose(a, np.asarray(b)), p1, p2)
  assert any(jax.tree_util.tree_flatten(changed)[0])


def test_blocks_starved_budget_falls_back_to_runtime_build(matrix):
  """An explicit mega_nnz_budget smaller than a block's nnz cannot be
  represented by the precomputed tables: precompute must be skipped
  (not crash) and the runtime path truncates + reports overflow."""
  src = DeviceDataSource(matrix, batch_size=8, num_sampling_users=8,
                         num_items=matrix.shape[1], union_width=128,
                         shuffle='blocks', mega_nnz_budget=8)
  assert src._precomputed is None
  perm = jnp.arange(src.n_blocks, dtype=jnp.int32)
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  assert int(b['overflow'][0]) > 0  # truncation detected, not silent


def test_dual_csr_cache_distinguishes_target_matrices(matrix):
  """Two trainings with the same input matrix but different target
  matrices must not reuse each other's precomputed target tables."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  t1 = matrix.copy()
  t2 = matrix.copy()
  t2.data[:] = 2.0
  model = DynamicAutoencoder(hidden_layers=[8])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse', seed=1)
  tr.train(train_dataset=RecommendationDataset(matrix, t1), batch_size=8,
           num_epochs=1, negative_sampling=True, shuffle='blocks')
  src1 = tr._fused_source_cache[2]
  tr.train(train_dataset=RecommendationDataset(matrix, t2), batch_size=8,
           num_epochs=1, negative_sampling=True, shuffle='blocks')
  src2 = tr._fused_source_cache[2]
  assert src1 is not src2  # stale T1 tables must not serve the T2 run


def test_rebuild_key_matches_train_cache(matrix):
  """A source rebuilt after overflow must cache-hit the next train()
  call (the rebuilt budgets would otherwise be discarded and the
  overflow would recur every epoch)."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  model = DynamicAutoencoder(hidden_layers=[8])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse', seed=1)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True)
  src = tr._fused_source_cache[2]
  tr._overflow_rebuild = (64, 16)  # pretend the epoch overflowed
  rebuilt = tr._rebuild_fused_source(src, ds, 8, 8)
  assert rebuilt.mega_nnz_budget > src.mega_nnz_budget
  tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
           negative_sampling=True)
  assert tr._fused_source_cache[2] is rebuilt  # grown budgets kept


def test_fuzz_device_matches_host_collator():
  """Property sweep: random matrix shapes/densities x sampling modes,
  device build == host collator (union ids, widths, slabs) on every
  step of an epoch. Catches contract drift the fixed-shape tests
  miss (empty users, ragged last block, weighted values, catalogs
  wider than any observed column)."""
  rng = np.random.default_rng(77)
  for trial in range(8):
    n_users = int(rng.integers(5, 60))
    n_items = int(rng.integers(10, 400))
    density = rng.uniform(0.01, 0.3)
    nnz = max(1, int(n_users * n_items * density))
    rows = rng.integers(0, n_users, nnz)
    cols = rng.integers(0, n_items, nnz)
    # shuffle mode and value-weighting vary independently so the
    # precomputed blocks path is swept with weighted values too
    shuffle = 'blocks' if trial % 2 == 0 else 'users'
    binary = (trial // 2) % 2 == 0
    vals = (np.ones(nnz, np.float32) if binary
            else rng.random(nnz).astype(np.float32) + 0.25)
    from scipy.sparse import csr_matrix
    m = csr_matrix((vals, (rows, cols)), shape=(n_users, n_items))
    m.sum_duplicates()
    if binary:
      m.data[:] = 1.0
    # leave some users empty
    bs = int(rng.integers(2, 9))
    mega = bs * int(rng.integers(1, 4))
    catalog = n_items + int(rng.integers(0, 50))  # wider logical catalog
    W = 1 << int(np.ceil(np.log2(max(
        8, min(catalog, m.nnz) + 1))))
    src = DeviceDataSource(m, batch_size=bs, num_sampling_users=mega,
                           num_items=catalog, union_width=W,
                           shuffle=shuffle)
    collator = BatchCollator(batch_size=bs, negative_sampling=True,
                             num_items=catalog, fixed_union_width=W)
    dataset = RecommendationDataset(m)
    if shuffle == 'blocks':
      perm = jnp.arange(src.n_blocks, dtype=jnp.int32)
      order = np.arange(src.n_pad)
    else:
      order = np.arange(src.n_pad)
      perm = jnp.asarray(order.astype(np.int32))
    step = 0
    for off in range(0, n_users, mega):
      window = order[off:off + mega]
      window = window[window < n_users]
      inter, _ = dataset[window]
      for hb in collator.collate(inter):
        db = src.build_batch(perm, jnp.int32(step),
                             negative_sampling=True)
        step += 1
        wv = int(db['width_valid'])
        assert wv == hb.num_items_in_batch, (trial, step)
        np.testing.assert_array_equal(
            np.asarray(db['items'])[:wv], hb.items[:wv])
        dev = densify_device(db, bs, src.union_width)
        host = densify_host(hb)
        np.testing.assert_allclose(dev[:hb.num_users, :wv],
                                   host[:hb.num_users, :wv], rtol=1e-6)
        assert np.all(dev[hb.num_users:] == 0), (trial, step)


def test_dual_csr_target_matches_host_collator(matrix):
  """Target-dataset (dual-CSR) fused batches: input and target sides
  each reproduce the host collator's independent np.unique unions and
  slabs (reference data.py:146-158), and the staged loss matches the
  host-loader staging bit-for-bit at the same user window."""
  rng = np.random.default_rng(11)
  n_users, n_items = matrix.shape
  tgt = matrix.copy().tolil()
  # target = a perturbed interaction set over the same users
  for u in range(0, n_users, 3):
    tgt[u, int(rng.integers(0, n_items))] = 2.0
  tgt = tgt.tocsr()

  mega, bs = 10, 10
  src = DeviceDataSource(matrix, batch_size=bs, num_sampling_users=mega,
                         num_items=n_items, union_width=128,
                         shuffle='blocks', target_matrix=tgt)
  assert src._tg is not None
  dataset = RecommendationDataset(matrix, tgt)
  collator = BatchCollator(batch_size=bs, negative_sampling=True,
                           num_items=n_items)

  perm = jnp.arange(src.n_blocks, dtype=jnp.int32)
  for step in range(src.steps_per_epoch):
    db = src.build_batch(perm, jnp.int32(step), negative_sampling=True)
    lo = step * bs
    window = np.arange(lo - lo % mega, min(lo - lo % mega + mega,
                                           n_users))
    in_inter, tg_inter = dataset[window]
    hb_in = collator.collate(in_inter)[(lo % mega) // bs]
    hb_tg = collator.collate(tg_inter)[(lo % mega) // bs]

    for side, hb, B, W in (('', hb_in, bs, src.union_width),
                           ('tg_', hb_tg, bs, src._tg['W'])):
      wv_key = (side + 'width_valid') if side else 'width_valid'
      items = np.asarray(db[side + 'items'])
      wv = int(db[wv_key])
      assert wv == hb.num_items_in_batch
      np.testing.assert_array_equal(items[:wv], hb.items[:wv])
      dense = np.zeros((B + 1, W), np.float32)
      rows = np.asarray(db[side + 'rows'])
      cols = np.asarray(db[side + 'cols'])
      vals = np.asarray(db[side + 'vals'])
      keep = rows <= B
      np.add.at(dense, (rows[keep], cols[keep]), vals[keep])
      host = np.zeros((hb.num_users, wv), np.float32)
      for r, c, v in zip(hb.rows, hb.cols, hb.vals):
        if r < hb.num_users:
          host[r, c] += v
      np.testing.assert_allclose(dense[:hb.num_users, :wv], host,
                                 rtol=1e-6)
      assert dense[hb.num_users:].sum() == 0


def test_dual_csr_fused_training(matrix):
  """End-to-end: a target dataset trains through the fused pipeline in
  blocks mode (no host-loader fallback), loss matches the host-staged
  loss at the same window, and other configs fall back cleanly."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  rng = np.random.default_rng(12)
  tgt = matrix.copy()
  tgt.data[:] = (rng.random(tgt.nnz) + 0.5).astype(np.float32)
  ds = RecommendationDataset(matrix, tgt)

  # sparse variant: distinct encode/decode unions through the
  # row-sparse optimizer (sparse_entries' two-entry plan)
  sp_model = DynamicAutoencoder(hidden_layers=[16], sparse=True)
  sp = Recoder(model=sp_model, optimizer_type='adam', loss='mse', seed=5)
  sp.train(train_dataset=ds, batch_size=8, num_epochs=2,
           negative_sampling=True, shuffle='blocks')
  assert sp._fused_source_cache[2]._tg is not None

  model = DynamicAutoencoder(hidden_layers=[16])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse', seed=5)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
           negative_sampling=True, shuffle='blocks')
  src = getattr(tr, '_fused_source_cache', (None, None, None))[2]
  assert src is not None and src._tg is not None

  # loss parity: device-built batch vs host-staged batch, same window
  perm = jnp.arange(src.n_blocks, dtype=jnp.int32)
  b = src.build_batch(perm, jnp.int32(0), negative_sampling=True)
  dev_batch = {
      'in_rows': b['rows'], 'in_cols': b['cols'], 'in_vals': b['vals'],
      'in_users': b['users'], 'in_items': b['items'],
      'in_valid_users': b['num_users'],
      'in_valid_width': b['width_valid'],
      'tg_rows': b['tg_rows'], 'tg_cols': b['tg_cols'],
      'tg_vals': b['tg_vals'], 'tg_items': b['tg_items'],
      'tg_valid_width': b['tg_width_valid'],
  }
  from recoder_tpu.data import BatchCollator as BC
  coll = BC(batch_size=8, negative_sampling=True,
            num_items=matrix.shape[1])
  in_inter, tg_inter = ds[np.arange(8)]
  staged = tr._stage_batch(coll.collate(in_inter)[0],
                              coll.collate(tg_inter)[0])
  staged = tr._to_device(staged)
  params = tr.model.params
  l_dev = float(tr._forward_loss(params, dev_batch, rng=None,
                                 training=False))
  l_host = float(tr._forward_loss(params, staged, rng=None,
                                  training=False))
  np.testing.assert_allclose(l_dev, l_host, rtol=1e-5)

  # non-blocks target runs keep the host loader (no crash, no fused)
  tr2 = Recoder(model=DynamicAutoencoder(hidden_layers=[16]),
                optimizer_type='adam', loss='mse', seed=5)
  tr2.train(train_dataset=ds, batch_size=8, num_epochs=1,
            negative_sampling=True)  # shuffle='users'
  src2 = getattr(tr2, '_fused_source_cache', (None, None, None))[2]
  assert src2 is None or src2._tg is None


def test_fused_steps_per_call_equivalence(matrix):
  """Scan-batched dispatch (fused_steps_per_call>1) is the same math
  as the single-step loop: identical params after an epoch whose step
  count does not divide the scan length (exercises the remainder
  singles), for both dense and sparse models."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)  # 37 users -> 5 batches of 8

  def run(spc, sparse, shuffle):
    model = DynamicAutoencoder(hidden_layers=[16], sparse=sparse)
    tr = Recoder(model=model, optimizer_type='adam', loss='mse', seed=3)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
             negative_sampling=True, fused_steps_per_call=spc,
             shuffle=shuffle)
    if shuffle == 'blocks':
      assert tr._fused_source_cache[2]._precomputed is not None
    return jax.tree_util.tree_map(np.asarray, tr.model.params)

  for sparse in (False, True):
    for shuffle in ('users', 'blocks'):  # blocks: precomputed unions
      p1 = run(1, sparse, shuffle)
      p4 = run(4, sparse, shuffle)
      jax.tree_util.tree_map(
          lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                  atol=2e-7), p1, p4)


@pytest.mark.parametrize('precomputed', [True, False])
def test_blocks_mode_reconstructs_exact_batches(precomputed):
  """shuffle='blocks': every interaction of the block appears exactly
  once across the mega-batch's slices, with the exact np.unique union
  (same contract as 'users' mode, minus the within-epoch user shuffle).
  Covers both the host-precomputed block tables and the on-device
  sort/unique fallback (used when random negatives refresh the union
  per step or the tables exceed the byte budget)."""
  rng = np.random.default_rng(8)
  df = pd.DataFrame({'u': rng.integers(0, 40, 1500),
                     'i': rng.integers(0, 300, 1500),
                     'v': rng.random(1500).astype(np.float32) + 0.5})
  df = df.drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')

  src = DeviceDataSource(m, batch_size=10, num_sampling_users=20,
                         num_items=m.shape[1], union_width=512,
                         shuffle='blocks')
  if precomputed:
    assert src._precomputed is not None
    assert src.union_width % 128 == 0
  else:
    src._precomputed = None
    src.union_width = 512
  assert src.mega_nnz_budget >= max(
      m.indptr[20] - m.indptr[0], m.indptr[40] - m.indptr[20])

  perm = src.epoch_permutation(jax.random.PRNGKey(0))
  blocks = np.asarray(perm)
  assert sorted(blocks.tolist()) == list(range(src.n_blocks))

  spm = src.slices_per_mega
  for step in range(src.steps_per_epoch):
    b = src.build_batch(jnp.asarray(blocks), jnp.int32(step),
                        negative_sampling=True)
    block = blocks[step // spm]
    s = step % spm
    lo_user = block * 20 + s * 10
    users = np.asarray(b['users'])
    np.testing.assert_array_equal(users, np.arange(lo_user, lo_user + 10))

    # union = np.unique over the BLOCK's items
    block_items = np.unique(
        m.indices[m.indptr[block * 20]:m.indptr[min((block + 1) * 20,
                                                    m.shape[0])]])
    items = np.asarray(b['items'])
    np.testing.assert_array_equal(items[:len(block_items)], block_items)
    assert int(b['width_valid']) == len(block_items)
    np.testing.assert_array_equal(np.asarray(b['overflow']), [0, 0])

    # densify and compare against the real rows
    rows, cols, vals = (np.asarray(b['rows']), np.asarray(b['cols']),
                        np.asarray(b['vals']))
    dense = np.zeros((11, 512), np.float32)
    keep = rows <= 10
    np.add.at(dense, (rows[keep], cols[keep]), vals[keep])
    want = np.zeros((10, len(block_items)), np.float32)
    sub = m[lo_user:lo_user + 10].toarray()[:, block_items]
    want[:, :] = sub
    np.testing.assert_allclose(dense[:10, :len(block_items)], want)
    assert dense[10].sum() == 0 and dense[:, len(block_items):].sum() == 0


def test_blocks_partial_tail_block_covers_all_users():
  """N not a multiple of the mega size with several slices per mega:
  the padded tail block must be pinned LAST in the epoch permutation
  or steps_per_epoch = ceil(N/bs) cuts off real users of whichever
  block is permuted last (silent per-epoch data loss)."""
  rng = np.random.default_rng(13)
  n_users, n_items = 120, 80  # mega=50, bs=10 -> 3 blocks, tail has 20
  df = pd.DataFrame({'u': np.repeat(np.arange(n_users), 4),
                     'i': rng.integers(0, n_items, n_users * 4),
                     'v': 1.0}).drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  src = DeviceDataSource(m, batch_size=10, num_sampling_users=50,
                         num_items=n_items, union_width=256,
                         shuffle='blocks')
  for seed in range(4):
    perm = src.epoch_permutation(jax.random.PRNGKey(seed))
    assert int(np.asarray(perm)[-1]) == src.n_blocks - 1  # tail pinned
    seen = set()
    for step in range(src.steps_per_epoch):
      b = src.build_batch(perm, jnp.int32(step), negative_sampling=True)
      users = np.asarray(b['users'])
      seen.update(int(u) for u in users[:int(b['num_users'])])
    assert seen == set(range(n_users)), (
        f'epoch (seed {seed}) skipped users: '
        f'{sorted(set(range(n_users)) - seen)[:10]}')


def test_second_train_call_applies_new_weight_decay(matrix):
  """Compiled step fns bake the weight-decay tree at trace time; a
  train() call with a different value must retrace, not silently run
  the stale trace."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)

  def final_params(wd_schedule):
    model = DynamicAutoencoder(hidden_layers=[8])
    tr = Recoder(model=model, optimizer_type='adam', loss='mse', seed=2)
    for i, wd in enumerate(wd_schedule, start=1):
      tr.train(train_dataset=ds, batch_size=8, num_epochs=i,
               negative_sampling=True, weight_decay=wd)
    return jax.tree_util.tree_map(np.asarray, tr.model.params)

  with_decay = final_params([0.0, 0.3])
  without = final_params([0.0, 0.0])
  diff = jax.tree_util.tree_map(
      lambda a, b: not np.allclose(a, b), with_decay, without)
  assert any(jax.tree_util.tree_flatten(diff)[0]), (
      'second train() ignored the new weight_decay')


def test_users_epoch_tables_match_general_path(matrix):
  """'users' precompute mode: every step served from the per-epoch
  host-built tables equals the general on-device union build given the
  same permutation (binary and weighted values)."""
  n_users, n_items = matrix.shape
  for binary in (True, False):
    m = matrix.copy()
    if binary:
      m.data[:] = 1.0
    src = DeviceDataSource(m, batch_size=8, num_sampling_users=16,
                           num_items=n_items, union_width=128,
                           shuffle='users')
    assert src.users_precompute
    state = src.epoch_state(3)
    perm = state['perm']
    for step in range(src.steps_per_epoch):
      a = src.build_batch(state, jnp.int32(step), negative_sampling=True)
      b = src.build_batch(perm, jnp.int32(step), negative_sampling=True)
      wv = int(a['width_valid'])
      assert wv == int(b['width_valid']), (binary, step)
      np.testing.assert_array_equal(np.asarray(a['items']),
                                    np.asarray(b['items']))
      np.testing.assert_array_equal(np.asarray(a['users']),
                                    np.asarray(b['users']))
      assert float(a['num_users']) == float(b['num_users'])
      np.testing.assert_array_equal(np.asarray(a['overflow']),
                                    np.asarray(b['overflow']))
      da = densify_device(a, 8, src.union_width)
      db_ = densify_device(b, 8, src.union_width)
      np.testing.assert_allclose(da, db_, rtol=1e-6)


def test_users_epoch_tables_overflow_counts(matrix):
  """A too-small nnz budget truncates the table-path mega exactly like
  the device path and reports the same overflow counters."""
  n_users, n_items = matrix.shape
  m = matrix.copy()
  m.data[:] = 1.0
  src = DeviceDataSource(m, batch_size=8, num_sampling_users=16,
                         num_items=n_items, union_width=128,
                         mega_nnz_budget=64, shuffle='users')
  assert src.users_precompute
  state = src.epoch_state(1)
  saw_overflow = False
  for step in range(src.steps_per_epoch):
    a = src.build_batch(state, jnp.int32(step), negative_sampling=True)
    b = src.build_batch(state['perm'], jnp.int32(step),
                        negative_sampling=True)
    np.testing.assert_array_equal(np.asarray(a['overflow']),
                                  np.asarray(b['overflow']))
    saw_overflow |= int(np.asarray(a['overflow'])[0]) > 0
  assert saw_overflow  # the tiny budget must actually truncate


def test_users_epoch_state_caching_and_distinct_epochs(matrix):
  """epoch_state is cached per epoch (resume re-runs the same epoch)
  and different epochs draw different permutations."""
  m = matrix.copy()
  m.data[:] = 1.0
  src = DeviceDataSource(m, batch_size=8, num_sampling_users=8,
                         num_items=m.shape[1], union_width=128,
                         shuffle='users')
  s1 = src.epoch_state(1)
  s1b = src.epoch_state(1)
  assert s1 is s1b   # same job, not a rebuild
  s2 = src.epoch_state(2)
  assert not np.array_equal(np.asarray(s1['perm']),
                            np.asarray(s2['perm']))
  # both are full permutations of the user space
  n = src.num_users_total
  assert sorted(np.asarray(s2['perm'])[:n].tolist()) == list(range(n))


def test_users_precompute_disabled_paths(matrix):
  """random negatives / blocks mode / target datasets keep the
  existing paths (no users precompute)."""
  m = matrix.copy()
  m.data[:] = 1.0
  src_r = DeviceDataSource(m, batch_size=8, num_sampling_users=8,
                           num_items=m.shape[1], union_width=256,
                           shuffle='users', num_random_negatives=16)
  assert not src_r.users_precompute
  assert src_r.epoch_state(1) is None
  src_b = DeviceDataSource(m, batch_size=8, num_sampling_users=8,
                           num_items=m.shape[1], union_width=128,
                           shuffle='blocks')
  assert not src_b.users_precompute


def test_users_precompute_end_to_end_training(matrix):
  """Trainer integration: users-mode fused training with the per-epoch
  tables converges (loss decreases) and resumes across train() calls."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  m = matrix.copy()
  m.data[:] = 1.0
  ds = RecommendationDataset(m)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                        noise_prob=0.0),
               optimizer_type='adam', loss='mse', seed=3)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=3,
           negative_sampling=True, shuffle='users')
  src = tr._fused_source_cache[2]
  assert src.users_precompute
  tr.train(train_dataset=ds, batch_size=8, num_epochs=5,
           negative_sampling=True, shuffle='users')
  assert tr.current_epoch == 5


@pytest.mark.parametrize('shuffle', ['blocks', 'users'])
def test_full_decode_matches_union_path(matrix, shuffle):
  """full_decode=True trains to the same parameters as the union path
  (identical loss columns and values; only the decode layout differs).
  noise/dropout off so the rng realization cannot differ."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  m = matrix.copy()
  ds = RecommendationDataset(m)

  def run(fd):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=11)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
             negative_sampling=True, shuffle=shuffle, full_decode=fd)
    return tr.model.params

  a, b = run(True), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=2e-5,
                               err_msg=f'{shuffle}: param {k} diverged')


def test_full_decode_random_negatives(matrix):
  """full_decode with num_random_negatives: the random ids join the
  loss mask (same draw as the union path's union join), so training
  matches the union path."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)

  def run(fd):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='logloss', seed=5)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
             negative_sampling=True, shuffle='users',
             num_random_negatives=16, full_decode=fd)
    return tr.model.params

  a, b = run(True), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=2e-5, err_msg=f'param {k}')


def test_full_decode_sparse_model_falls_back(matrix):
  """Sparse models keep the union path (row-sparse Adam needs the
  gathered rows) even when full_decode is requested."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16], sparse=True,
                                        noise_prob=0.0),
               optimizer_type='adam', loss='mse', seed=2)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True, full_decode=True)
  for v in tr.model.params.values():
    assert np.isfinite(np.asarray(v)).all()


def test_epoch_build_takes_arrays_as_args(matrix):
  """The users-mode per-epoch table build must take the resident CSR
  arrays as jit ARGUMENTS, not closure constants: a captured device
  array is baked into the compiled program (duplicate HBM at lowering
  time -- observed OOMing the epoch build at 8M items -- and hundreds
  of serialized MB through the remote-compile tunnel at MSD scale)."""
  n_users, n_items = matrix.shape
  source = DeviceDataSource(matrix, batch_size=8, num_sampling_users=16,
                            num_items=n_items, union_width=128,
                            shuffle='users')
  assert source.users_precompute
  for fd in (False, True):
    state = source.epoch_state(0, full_decode=fd)
    assert state is not None
    arrays = {k: v for k, v in source.device_arrays().items()
              if k in ('d_cs', 'd_cols', 'd_vals')}
    traced = source._epoch_build_fn[fd].trace(state['perm'], arrays)
    const_sizes = [np.asarray(c).size for c in traced.jaxpr.consts]
    assert all(s <= 64 for s in const_sizes), const_sizes


# -- dense-slab cache (full-decode) -------------------------------------


def _slab_source(matrix, shuffle, **kw):
  n_users, n_items = matrix.shape
  return DeviceDataSource(matrix, batch_size=8, num_sampling_users=8,
                          num_items=n_items, union_width=128,
                          shuffle=shuffle, **kw)


@pytest.mark.parametrize('shuffle', ['users', 'blocks'])
def test_slab_cache_batch_matches_scatter(matrix, shuffle):
  """The cached-slab fd payload must reproduce the scatter path's slab
  (same rows, same values) and user metadata for every step."""
  n_users, n_items = matrix.shape
  W = n_items + 6  # a padded catalog width, like num_items_padded
  src_a = _slab_source(matrix, shuffle)
  src_b = _slab_source(matrix, shuffle)
  assert src_a.maybe_cache_slabs(W, request=True)

  if shuffle == 'blocks':
    perm = jnp.arange(src_a.n_blocks, dtype=jnp.int32)
    n_steps = src_a.n_blocks
  else:
    perm = jnp.asarray(np.random.default_rng(3).permutation(
        src_a.n_pad).astype(np.int32))
    n_steps = src_a.n_pad // 8
  for step in range(n_steps):
    a = src_a.build_batch(perm, jnp.int32(step), negative_sampling=True,
                          full_decode=True)
    b = src_b.build_batch(perm, jnp.int32(step), negative_sampling=True,
                          full_decode=True)
    assert 'slab' in a and 'slab' not in b
    dense_b = np.zeros((8, W), np.float32)
    rows = np.asarray(b['rows'])
    cols = np.asarray(b['cols'])
    vals = np.asarray(b['vals'])
    keep = (rows < 8) & (cols < W)
    np.add.at(dense_b, (rows[keep], cols[keep]), vals[keep])
    np.testing.assert_array_equal(
        np.asarray(a['slab']).astype(np.float32), dense_b)
    np.testing.assert_array_equal(np.asarray(a['users']),
                                  np.asarray(b['users']))
    assert float(a['num_users']) == float(b['num_users'])
    assert np.all(np.asarray(a['overflow']) == 0)


@pytest.mark.parametrize('shuffle', ['users', 'blocks'])
def test_slab_cache_training_matches_scatter(matrix, shuffle):
  """slab_cache=True trains to the same parameters as slab_cache=False
  (both full-decode): the cached slab is bit-identical to the
  scattered one, so the gradients are too."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)

  def run(cache):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='logloss', seed=9)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
             negative_sampling=True, shuffle=shuffle,
             full_decode=True, slab_cache=cache)
    return tr.model.params

  a, b = run(True), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-6,
                               err_msg=f'{shuffle}: param {k} diverged')


def test_slab_cache_random_negatives(matrix):
  """Random extra negatives fold the same key in cache mode, so the
  loss mask -- and the trajectory -- matches the scatter path."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)

  def run(cache):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=4)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
             negative_sampling=True, shuffle='users',
             num_random_negatives=16, full_decode=True,
             slab_cache=cache)
    return tr.model.params

  a, b = run(True), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-6, err_msg=f'param {k} diverged')


def test_slab_cache_gating(matrix):
  n_users, n_items = matrix.shape
  W = n_items + 6

  # multi-slice megas: the fd mask must span the whole mega
  src = DeviceDataSource(matrix, batch_size=8, num_sampling_users=16,
                         num_items=n_items, union_width=128)
  assert not src.maybe_cache_slabs(W, request=True)

  # explicit zeros: unrepresentable in a dense slab
  m0 = matrix.copy()
  m0.data[0] = 0.0
  src = _slab_source(m0, 'users')
  assert not src.maybe_cache_slabs(W, request=True)
  assert src._vals_all_nonzero is False  # computed lazily, then gated

  # request=False clears an existing cache
  src = _slab_source(matrix, 'users')
  assert src.maybe_cache_slabs(W, request=True)
  assert src.d_slab is not None
  assert src._slab_request is True  # establishing request recorded
  assert not src.maybe_cache_slabs(W, request=False)
  assert src.d_slab is None
  assert src._slab_request is None

  # a typo'd user-facing value is a ValueError at the boundary, not a
  # strippable assert deep in the pipeline
  with pytest.raises(ValueError, match='slab_cache'):
    src.maybe_cache_slabs(W, request='dense')


def test_rebuild_preserves_forced_slab_request(matrix, monkeypatch):
  """An overflow rebuild re-applies the request that ESTABLISHED the
  slab cache: a user-forced slab_cache=True must not be silently
  downgraded to the budget-checked 'auto'."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8]),
               optimizer_type='adam', loss='mse', seed=1)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True, slab_cache=True)
  src = tr._fused_source_cache[2]
  assert src._slab_request is True
  # make the cache exist only because it was forced: an 'auto'
  # re-request after the rebuild would be declined by the budget
  monkeypatch.setattr(DeviceDataSource, '_slab_cache_budget',
                      lambda self: 0)
  tr._overflow_rebuild = (64, 16)
  rebuilt = tr._rebuild_fused_source(src, ds, 8, 8)
  assert rebuilt._slab_request is True
  assert rebuilt.d_slab is not None  # still forced, still resident


def test_slab_cache_dtype_selection(matrix):
  """Integer-valued data stores bf16 (exact); values that do not
  round-trip bf16 fall back to f32 -- and still train identically to
  the scatter path."""
  n_users, n_items = matrix.shape
  W = n_items + 6
  src = _slab_source(matrix, 'users')  # integer values 1..4
  assert src.maybe_cache_slabs(W, request=True)
  assert src._vals_bf16_exact  # computed lazily by the call above
  assert src.d_slab.dtype == jnp.bfloat16

  m = matrix.copy()
  m.data = m.data + 0.01  # not bf16-representable
  src = _slab_source(m, 'users')
  assert src.maybe_cache_slabs(W, request=True)
  assert not src._vals_bf16_exact
  assert src.d_slab.dtype == jnp.float32

  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder
  ds = RecommendationDataset(m)

  def run(cache):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=6)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
             negative_sampling=True, full_decode=True, slab_cache=cache)
    return tr.model.params

  a, b = run(True), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-6, err_msg=f'param {k} diverged')


def test_slab_cache_dropped_on_non_fd_train(matrix):
  """A later non-full-decode train() on the same cached source must
  drop the slab (dead HBM weight on the union path) and purge fused
  step fns referencing superseded sources."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(matrix)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                        noise_prob=0.0),
               optimizer_type='adam', loss='mse', seed=3)
  tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
           negative_sampling=True, full_decode=True, slab_cache=True)
  src = tr._fused_source_cache[2]
  assert src.d_slab is not None

  tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
           negative_sampling=True, full_decode=False)
  assert src.d_slab is None
  # every fused step fn must reference the CURRENT source only
  cur = tr._fused_source_cache[2]
  for k, v in tr._step_fns.items():
    if k[0] == 'fused':
      assert v[0] is cur


def test_slab_eligibility_stats_lazy(matrix):
  """Non-binary sources defer the full-nnz eligibility passes until a
  cache is actually requested."""
  m = matrix.copy()
  m.data = m.data + 0.25  # non-binary
  src = _slab_source(m, 'users')
  assert src._vals_all_nonzero is None  # not computed at init
  assert src.maybe_cache_slabs(m.shape[1] + 6, request=True)
  assert src._vals_all_nonzero is True  # computed on demand


def _fd_engaged(tr):
  keys = [k for k in tr._step_fns if k[0] == 'fused']
  assert keys, 'no fused step traced'
  flags = {k[4] for k in keys}
  assert len(flags) == 1, flags
  return flags.pop()


def test_full_decode_auto_threshold():
  """'auto' engages full decode up to 4x the union width (break-even
  bracketed by measurement, docs/benchmarks.md: wins at 2.9x, loses
  at 6.3x) and falls back to the union path beyond it."""
  from scipy import sparse as sp

  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  rng = np.random.default_rng(11)

  def run(n_items, items_per_user):
    rows = np.repeat(np.arange(48), items_per_user)
    cols = rng.integers(0, min(60, n_items), rows.shape[0])  # narrow union
    m = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)),
        shape=(48, n_items))
    m.sum_duplicates(); m.data[:] = 1.0
    ds = RecommendationDataset(m)
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=7)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
             negative_sampling=True)
    src = tr._fused_source_cache[2]
    fd = _fd_engaged(tr)
    ratio = tr.model.num_items_padded / src.union_width
    assert fd == (ratio <= 4), (fd, ratio)
    return fd, ratio

  fd_small, r_small = run(n_items=200, items_per_user=12)
  fd_big, r_big = run(n_items=4000, items_per_user=12)
  # the two shapes must actually straddle the threshold
  assert fd_small and r_small <= 4, r_small
  assert not fd_big and r_big > 4, r_big

# -- bit-packed slab cache (binary full-decode) --------------------------


@pytest.fixture
def binary_matrix():
  rng = np.random.default_rng(11)
  df = pd.DataFrame({
      'u': rng.integers(0, 37, 700),
      'i': rng.integers(0, 90, 700),
      'v': 1.0,
  }).drop_duplicates(['u', 'i'])
  m, _, _ = dataframe_to_csr_matrix(df, 'u', 'i', 'v')
  return m


@pytest.mark.parametrize('shuffle', ['users', 'blocks'])
def test_packed_slab_batch_matches_scatter(binary_matrix, shuffle):
  """The packed-tier fd payload must unpack to EXACTLY the scatter
  path's slab on every step -- including zeros at sentinel/padding
  columns (the packed build drops those bits; the dense build zeroes
  their values)."""
  n_users, n_items = binary_matrix.shape
  W = 128  # padded catalog width, multiple of 32, > n_items
  src_a = _slab_source(binary_matrix, shuffle)
  src_b = _slab_source(binary_matrix, shuffle)
  assert src_a.maybe_cache_slabs(W, request='packed')
  assert src_a._slab_packed
  assert src_a.d_slab.dtype == jnp.uint32
  assert src_a.d_slab.shape == (src_a.n_pad, W // 32)

  if shuffle == 'blocks':
    perm = jnp.arange(src_a.n_blocks, dtype=jnp.int32)
    n_steps = src_a.n_blocks
  else:
    perm = jnp.asarray(np.random.default_rng(3).permutation(
        src_a.n_pad).astype(np.int32))
    n_steps = src_a.n_pad // 8
  for step in range(n_steps):
    a = src_a.build_batch(perm, jnp.int32(step), negative_sampling=True,
                          full_decode=True)
    b = src_b.build_batch(perm, jnp.int32(step), negative_sampling=True,
                          full_decode=True)
    assert 'slab' in a
    assert a['slab'].shape == (8, W)
    dense_b = np.zeros((8, W), np.float32)
    rows = np.asarray(b['rows'])
    cols = np.asarray(b['cols'])
    vals = np.asarray(b['vals'])
    keep = (rows < 8) & (cols < W)
    np.add.at(dense_b, (rows[keep], cols[keep]), vals[keep])
    # sentinel col (n_items) slots carry val 0 on the scatter side; the
    # packed side must have DROPPED those bits outright
    assert np.all(dense_b[:, n_items:] == 0)
    np.testing.assert_array_equal(
        np.asarray(a['slab']).astype(np.float32), dense_b)
    np.testing.assert_array_equal(np.asarray(a['users']),
                                  np.asarray(b['users']))
    assert float(a['num_users']) == float(b['num_users'])


@pytest.mark.parametrize('shuffle', ['users', 'blocks'])
def test_packed_slab_training_matches_scatter(binary_matrix, shuffle):
  """slab_cache='packed' trains to the same parameters as the scatter
  path (unpack is exact for 0/1 values, so gradients are identical)."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(binary_matrix)

  def run(cache):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='logloss', seed=9)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=2,
             negative_sampling=True, shuffle=shuffle,
             full_decode=True, slab_cache=cache)
    return tr.model.params

  a, b = run('packed'), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-6,
                               err_msg=f'{shuffle}: param {k} diverged')


def test_packed_slab_gating(binary_matrix, matrix):
  W = 128
  # 'packed' on non-binary values declines
  src = _slab_source(matrix, 'users')
  assert not src.maybe_cache_slabs(W, request='packed')
  assert src.d_slab is None

  # width not a multiple of 32 declines the packed tier
  src = _slab_source(binary_matrix, 'users')
  assert not src.maybe_cache_slabs(W + 6, request='packed')

  # 'auto' falls back to packed when the dense slab is over budget but
  # the 1-bit slab fits (the MSD situation)
  src = _slab_source(binary_matrix, 'users')
  packed_bytes = src.n_pad * (W // 32) * 4
  dense_bytes = src.n_pad * W * 2  # bf16
  src._slab_cache_budget = lambda: (packed_bytes + dense_bytes) // 2
  assert src.maybe_cache_slabs(W, request='auto')
  assert src._slab_packed

  # ... and prefers dense when both fit
  src = _slab_source(binary_matrix, 'users')
  assert src.maybe_cache_slabs(W, request='auto')
  assert not src._slab_packed
  assert src.d_slab.dtype == jnp.bfloat16

  # a forced request for the OTHER tier rebuilds; same-tier reuses
  slab_dense = src.d_slab
  assert src.maybe_cache_slabs(W, request=True)
  assert src.d_slab is slab_dense  # reused
  assert src.maybe_cache_slabs(W, request='packed')
  assert src._slab_packed
  assert src.maybe_cache_slabs(W, request='auto')
  assert src._slab_packed  # auto reuses whatever exists
  assert src.maybe_cache_slabs(W, request=True)
  assert not src._slab_packed  # forced dense rebuilt

  # request=False clears the packed cache too
  assert src.maybe_cache_slabs(W, request='packed')
  assert not src.maybe_cache_slabs(W, request=False)
  assert src.d_slab is None and not src._slab_packed


def test_packed_slab_random_negatives(binary_matrix):
  """Random extra negatives compose with the packed tier (the mask is
  recovered from the unpacked slab plus the drawn ids, same as dense)."""
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  ds = RecommendationDataset(binary_matrix)

  def run(cache):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=4)
    tr.train(train_dataset=ds, batch_size=8, num_epochs=1,
             negative_sampling=True, shuffle='users',
             num_random_negatives=16, full_decode=True,
             slab_cache=cache)
    return tr.model.params

  a, b = run('packed'), run(False)
  for k in a:
    np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                               atol=1e-6, err_msg=f'param {k} diverged')
