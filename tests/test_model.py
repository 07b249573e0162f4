"""End-to-end integration test with metric parity gates, mirroring
reference tests/test_model.py:14-84: train DynamicAutoencoder[200] with
logloss + negative sampling for 30 epochs on the ML-20M-derived fixture,
assert ranking metrics, then checkpoint -> reload into a fresh trainer ->
identical metrics. Parametrized over the dense and sparse optimizer
paths, which must agree.

Gate values are pinned from the ACTUAL torch reference implementation
run on this exact fixture (the reference's own train.csv is not in its
snapshot; fixtures are a deterministic 80/20 per-user split of its
val.csv -- see tools/make_test_data.py). Derivation: load the reference
via tests/reference_shim.py and run its tests/test_model.py protocol
(DynAE[200] tanh noise 0.5, logloss, adam, bs 500, lr 1e-3, wd 2e-5,
30 epochs, negative sampling); 4 runs (3 dense + 1 sparse) gave
Recall@20 in [0.1412, 0.1422], Recall@50 in [0.2391, 0.2396],
NDCG@100 in [0.1681, 0.1687]. Pinned at the midpoints with the
reference's own atol=0.01 (reference tests/test_model.py:60-62);
test_reference_parity.py re-derives these live when /root/reference
is mounted. Reference-style evaluation orientation: input = the 20%
fold-in, ground truth = the 80% training interactions.
"""

import os

import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.metrics import NDCG, Recall
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization
from recoder_tpu.utils import dataframe_to_csr_matrix

DATA_DIR = os.path.join(os.path.dirname(__file__), 'data')


def _load_datasets():
  train_df = pd.read_csv(os.path.join(DATA_DIR, 'train.csv.gz'))
  val_df = pd.read_csv(os.path.join(DATA_DIR, 'val.csv.gz'))
  val_df = val_df[val_df.sid.isin(train_df.sid.unique())]

  train_matrix, item_id_map, user_id_map = dataframe_to_csr_matrix(
      train_df, user_col='uid', item_col='sid', inter_col='watched')
  val_matrix, _, _ = dataframe_to_csr_matrix(
      val_df, user_col='uid', item_col='sid', inter_col='watched',
      item_id_map=item_id_map, user_id_map=user_id_map)

  train_dataset = RecommendationDataset(train_matrix)
  val_dataset = RecommendationDataset(val_matrix, train_matrix)
  return train_dataset, val_dataset


REFERENCE_PINNED = {'recall_20': 0.1417, 'recall_50': 0.2393,
                    'ndcg_100': 0.1684}


@pytest.mark.slow
@pytest.mark.parametrize(
    'sparse,compute_dtype,opt_state_dtype,params_dtype,'
    'exp_recall_20,exp_recall_50,exp_ndcg_100', [
    (False, None, None, None, REFERENCE_PINNED['recall_20'],
     REFERENCE_PINNED['recall_50'], REFERENCE_PINNED['ndcg_100']),
    (True, None, None, None, REFERENCE_PINNED['recall_20'],
     REFERENCE_PINNED['recall_50'], REFERENCE_PINNED['ndcg_100']),
    # bfloat16 matmul compute must reach the same reference-pinned
    # quality (within the reference's own atol): the gate that lets
    # bench.py run the ml20m headline in bf16
    (False, 'bfloat16', None, None, REFERENCE_PINNED['recall_20'],
     REFERENCE_PINNED['recall_50'], REFERENCE_PINNED['ndcg_100']),
    # bf16 Adam moment STORAGE on top of bf16 compute (the full fast
    # configuration): must still hit the reference-pinned quality --
    # the gate that lets bench.py run with opt_state_dtype='bfloat16'
    # (docs/benchmarks.md: the optimizer's full-table m/v traffic is
    # the dominant dense-step stage)
    (False, 'bfloat16', 'bfloat16', None, REFERENCE_PINNED['recall_20'],
     REFERENCE_PINNED['recall_50'], REFERENCE_PINNED['ndcg_100']),
    # bf16 parameter STORAGE on top of both (r4): the opt-in
    # HBM-footprint lever (halves resident param + grad bytes; it was
    # measured SLOWER than f32 params on the small-table headline
    # config and rejected as the bench default -- docs/benchmarks.md).
    # Update math stays f32, storage rounds per step
    # (optim.Optimizer.update) -- this row is the quality gate that
    # lets the mode ship at all
    (False, 'bfloat16', 'bfloat16', 'bfloat16',
     REFERENCE_PINNED['recall_20'],
     REFERENCE_PINNED['recall_50'], REFERENCE_PINNED['ndcg_100']),
])
def test_model(sparse, compute_dtype, opt_state_dtype, params_dtype,
               exp_recall_20, exp_recall_50, exp_ndcg_100, tmp_path):
  train_dataset, val_dataset = _load_datasets()

  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5, sparse=sparse,
                             compute_dtype=compute_dtype,
                             params_dtype=params_dtype)
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss',
                    opt_state_dtype=opt_state_dtype)

  trainer.train(train_dataset=train_dataset, val_dataset=val_dataset,
                batch_size=500, lr=1e-3, weight_decay=2e-5,
                num_epochs=30, negative_sampling=True)

  recall_20 = Recall(k=20, normalize=True)
  recall_50 = Recall(k=50, normalize=True)
  ndcg_100 = NDCG(k=100)
  metrics = [recall_20, recall_50, ndcg_100]

  results = trainer._evaluate(eval_dataset=val_dataset,
                              num_recommendations=100,
                              metrics=metrics, batch_size=500)
  means = {m: np.mean(v) for m, v in results.items()}

  assert np.isclose(means[recall_20], exp_recall_20, atol=0.01, rtol=0)
  assert np.isclose(means[recall_50], exp_recall_50, atol=0.01, rtol=0)
  assert np.isclose(means[ndcg_100], exp_ndcg_100, atol=0.01, rtol=0)

  # checkpoint -> fresh model/trainer -> identical metrics
  state_file = trainer.save_state(str(tmp_path / 'test_model'))

  model2 = DynamicAutoencoder(sparse=sparse)
  trainer2 = Recoder(model=model2, optimizer_type='adam', loss='logloss')
  trainer2.init_from_model_file(state_file)

  results2 = trainer2._evaluate(eval_dataset=val_dataset,
                                num_recommendations=100,
                                metrics=metrics, batch_size=500)
  for m in metrics:
    assert np.isclose(np.mean(results2[m]), means[m], atol=1e-6, rtol=0)

  os.remove(state_file)


@pytest.mark.slow
def test_model_packed_slab_quality(tmp_path):
  """30-epoch quality gate for the bit-packed slab tier at the full
  bf16 bench stack (compute + Adam moments): slab_cache='packed' must
  reach the reference-pinned metrics. The per-step payload and
  training trajectory are separately proven bit-identical to the
  scatter path (tests/test_device_pipeline.py packed rows); this row
  is the protocol-level receipt that lets bench.py's MSD 'auto'
  fall back to the packed tier (the 44 GiB bf16 slab is ineligible
  there; the 1-bit slab is ~2.8 GiB)."""
  train_dataset, val_dataset = _load_datasets()

  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5, compute_dtype='bfloat16')
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss',
                    opt_state_dtype='bfloat16')
  trainer.train(train_dataset=train_dataset, batch_size=500, lr=1e-3,
                weight_decay=2e-5, num_epochs=30, negative_sampling=True,
                slab_cache='packed')
  src = trainer.fused_data_source
  assert src is not None and src._slab_packed  # the tier under test ran

  recall_20 = Recall(k=20, normalize=True)
  recall_50 = Recall(k=50, normalize=True)
  ndcg_100 = NDCG(k=100)
  results = trainer._evaluate(eval_dataset=val_dataset,
                              num_recommendations=100,
                              metrics=[recall_20, recall_50, ndcg_100],
                              batch_size=500)
  means = {m: np.mean(v) for m, v in results.items()}
  assert np.isclose(means[recall_20], REFERENCE_PINNED['recall_20'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[recall_50], REFERENCE_PINNED['recall_50'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[ndcg_100], REFERENCE_PINNED['ndcg_100'],
                    atol=0.01, rtol=0)


@pytest.mark.slow
def test_matrix_factorization_trains():
  """MF + weighted MSE + negative sampling learns better-than-random
  rankings (BASELINE config 1)."""
  train_dataset, val_dataset = _load_datasets()

  model = MatrixFactorization(embedding_size=128, activation_type='tanh',
                              dropout_prob=0.2)
  trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                    loss_params={'confidence': 40})
  trainer.train(train_dataset=train_dataset, batch_size=500, lr=1e-3,
                num_epochs=20, negative_sampling=True)

  recall_20 = Recall(k=20)
  results = trainer._evaluate(eval_dataset=val_dataset,
                              num_recommendations=100,
                              metrics=[recall_20], batch_size=500)
  # random recall@20 on ~7.4k items would be ~20/7418 = 0.003
  assert np.mean(results[recall_20]) > 0.03


def test_checkpoint_resume_continues_epochs(tmp_path):
  """Resume semantics: the epoch loop restarts AT last_epoch (the
  reference re-runs the last completed epoch on resume,
  range(current_epoch, num_epochs+1) at reference model.py:360 with
  current_epoch = last_epoch from model.py:178) with optimizer state
  restored (reference model.py:166-191,327-330). bench.py accounts
  for the extra epoch via current_epoch, not assumptions."""
  rng = np.random.default_rng(0)
  df = pd.DataFrame({'uid': rng.integers(0, 40, 400),
                     'sid': rng.integers(0, 60, 400),
                     'watched': 1.0}).drop_duplicates(['uid', 'sid'])
  m, _, _ = dataframe_to_csr_matrix(df, 'uid', 'sid', 'watched')
  ds = RecommendationDataset(m)

  model = DynamicAutoencoder(hidden_layers=[32])
  tr = Recoder(model=model, optimizer_type='adam', loss='mse')
  tr.train(train_dataset=ds, batch_size=20, num_epochs=3,
           negative_sampling=True,
           model_checkpoint_prefix=str(tmp_path / 'ck'))
  assert tr.current_epoch == 3

  tr2 = Recoder(model=DynamicAutoencoder(), optimizer_type='adam',
                loss='mse')
  tr2.init_from_model_file(str(tmp_path / 'ck_epoch_3.model'))
  assert tr2.current_epoch == 3
  assert int(tr2._pending_opt_arrays[0]['step']) > 0
  tr2.train(train_dataset=ds, batch_size=20, num_epochs=5,
            negative_sampling=True)
  assert tr2.current_epoch == 5
  # optimizer step counter carried across the resume
  assert int(tr2.opt_state['step']) > int(tr.opt_state['step'])


@pytest.mark.slow
def test_blocks_shuffle_reaches_reference_quality():
  """shuffle='blocks' (the fast sampling mode: block-order shuffle,
  fixed co-batch groups) must still converge to the reference-pinned
  quality. Measured r2: 0.1419/0.2391/0.1687 -- indistinguishable from
  full user shuffling on this fixture."""
  train_dataset, val_dataset = _load_datasets()
  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5)
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss')
  trainer.train(train_dataset=train_dataset, batch_size=500, lr=1e-3,
                weight_decay=2e-5, num_epochs=30, negative_sampling=True,
                shuffle='blocks')
  recall_20 = Recall(k=20, normalize=True)
  recall_50 = Recall(k=50, normalize=True)
  ndcg_100 = NDCG(k=100)
  results = trainer._evaluate(eval_dataset=val_dataset,
                              num_recommendations=100,
                              metrics=[recall_20, recall_50, ndcg_100],
                              batch_size=500)
  means = {m: np.mean(v) for m, v in results.items()}
  assert np.isclose(means[recall_20], REFERENCE_PINNED['recall_20'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[recall_50], REFERENCE_PINNED['recall_50'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[ndcg_100], REFERENCE_PINNED['ndcg_100'],
                    atol=0.01, rtol=0)


def test_progress_mode():
  """progress=True paints a per-step bar without changing training
  results (the reporter thread only reads lagging loss handles)."""
  import pandas as pd
  import scipy.sparse as sp

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  rng = np.random.default_rng(0)
  m = sp.csr_matrix((np.ones(400, np.float32),
                     (rng.integers(0, 40, 400),
                      rng.integers(0, 60, 400))), shape=(40, 60))
  m.sum_duplicates()
  ds = RecommendationDataset(m.tocsr())

  def run(progress):
    tr = Recoder(model=DynamicAutoencoder(hidden_layers=[8],
                                          noise_prob=0.0),
                 optimizer_type='adam', loss='mse', seed=7)
    tr.train(train_dataset=ds, batch_size=10, num_epochs=2,
             negative_sampling=True, progress=progress)
    return tr.model.params

  a, b = run(False), run(True)
  for k in a:
    np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


@pytest.mark.slow
def test_bs2000_reaches_reference_quality():
  """The beyond-protocol batch size (VERDICT r3 #7): bs=2000 is the
  framework-ceiling throughput configuration (the bs=500 protocol
  leaves the chip optimizer-bound -- docs/benchmarks.md roofline).
  Adopted through the standard gate: 30 epochs at the protocol's own
  lr=1e-3 must land within the reference's atol of the pinned
  converged metrics. Measured 2026-08-19: 0.1467/0.2441/0.1727 (the
  larger batch is mildly BETTER on this fixture). bs=500 stays the
  default everywhere; bench.py --batch-size 2000 reports the ceiling
  row with vs_baseline=null."""
  train_dataset, val_dataset = _load_datasets()
  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5)
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss')
  trainer.train(train_dataset=train_dataset, batch_size=2000, lr=1e-3,
                weight_decay=2e-5, num_epochs=30, negative_sampling=True)
  recall_20 = Recall(k=20, normalize=True)
  recall_50 = Recall(k=50, normalize=True)
  ndcg_100 = NDCG(k=100)
  results = trainer._evaluate(eval_dataset=val_dataset,
                              num_recommendations=100,
                              metrics=[recall_20, recall_50, ndcg_100],
                              batch_size=500)
  means = {m: np.mean(v) for m, v in results.items()}
  assert np.isclose(means[recall_20], REFERENCE_PINNED['recall_20'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[recall_50], REFERENCE_PINNED['recall_50'],
                    atol=0.01, rtol=0)
  assert np.isclose(means[ndcg_100], REFERENCE_PINNED['ndcg_100'],
                    atol=0.01, rtol=0)
