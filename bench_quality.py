"""North-star benchmark: wall-clock to reference quality.

Two anchors, selected with ``--fixture``:

* ``real`` (default): the ML-20M-derived fixture (tests/data -- a
  deterministic 80/20 per-user split of the reference's own val.csv;
  its train.csv blob is stripped from the snapshot, see
  tools/make_test_data.py). Config = the reference's integration-gate
  protocol (reference tests/test_model.py:40-62: DynAE[200] tanh,
  noise 0.5, loss='logloss', adam, bs 500, lr 1e-3, wd 2e-5, negative
  sampling). Quality bar = 0.99x the CONVERGED metrics the actual
  torch reference reaches after its 30-epoch protocol on this exact
  fixture (pinned from 4 derivation runs, tests/test_model.py:8-22:
  Recall@20 0.1417, Recall@50 0.2393, NDCG@100 0.1684;
  tests/test_reference_parity.py re-derives them live). This is the
  defensible bar: real data, converged quality, all three gate
  metrics.

* ``synthetic``: the ML-20M-shaped synthetic set from bench.py
  (Zipf popularity, no per-user structure), strong-generalization
  split, MSE config; bar = the torch reference's PEAK over its
  10-epoch budget on the same data (it peaks at epoch 1 and declines
  -- kept for continuity with earlier rounds; the absolute bar is
  weak, which is why ``real`` is the default).

Timing protocol (both anchors): compilation is excluded (one warmup
epoch + eval, then parameters/optimizer reset in place -- same shapes,
so the timed run reuses every compiled program; the reference's torch
pays no compile and the K80 claim times training only). Evaluation
runs between timestamps and is excluded. Each epoch is trained exactly
once: ``current_epoch`` is advanced manually between single-epoch
train() calls because ``train(num_epochs=N)`` re-runs the last
completed epoch on resume (deliberate reference parity, reference
model.py:360) -- the per-epoch loop would otherwise train every epoch
twice.

Prints ONE JSON line:
  {"metric": "ml20m_seconds_to_reference_quality", "value": S,
   "unit": "s", "vs_baseline": 60 / S}
"""

import json
import sys
import time

import numpy as np

from bench import BATCH_SIZE, synthesize_ml20m

HELDOUT_USERS = 10_000
TRAIN_SEED = 0

# Synthetic anchor: measured from the torch reference by
# tools/derive_quality_target.py (its PEAK across the 10-epoch <60 s
# K80 budget; the curve peaks at epoch 1 on this data -- derived
# 2026-08-18 on the recalibrated synthesizer (nnz 9.99M), seed 0;
# epoch curve R@20 .04892/.04472/.04122/.0402).
SYNTHETIC_QUALITY = {'recall_20': 0.04892, 'ndcg_100': 0.06875}
SYNTHETIC_FRACTION = 0.97

# Real-fixture anchor: the reference's CONVERGED 30-epoch metrics on
# tests/data (pinned derivation, tests/test_model.py:8-22,54).
REAL_QUALITY = {'recall_20': 0.1417, 'recall_50': 0.2393,
                'ndcg_100': 0.1684}
REAL_FRACTION = 0.99


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def split_heldout(matrix, seed=1234, heldout=HELDOUT_USERS,
                  fold_in=0.8):
  """Strong-generalization split of a CSR matrix.

  Returns (train_matrix, val_fold_in, val_fold_out): the last
  ``heldout`` users leave the training matrix; a deterministic 80/20
  per-user split of their interactions forms eval input/truth
  (reference scripts/ml-20m/preprocess.py:71-96 semantics).
  """
  from scipy.sparse import csr_matrix
  rng = np.random.default_rng(seed)
  n_users, n_items = matrix.shape
  n_train = n_users - heldout
  train_m = matrix[:n_train]

  held = matrix[n_train:].tocsr()
  rows_in, cols_in, rows_out, cols_out = [], [], [], []
  for u in range(held.shape[0]):
    items = held.indices[held.indptr[u]:held.indptr[u + 1]]
    if len(items) < 2:
      continue
    perm = rng.permutation(len(items))
    k = max(1, int(len(items) * fold_in))
    k = min(k, len(items) - 1)  # always >=1 target item
    cols_in.append(items[perm[:k]])
    rows_in.append(np.full(k, u))
    cols_out.append(items[perm[k:]])
    rows_out.append(np.full(len(items) - k, u))

  def build(rows, cols):
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    return csr_matrix((np.ones(len(r), np.float32), (r, c)),
                      shape=(heldout, n_items))

  return train_m, build(rows_in, cols_in), build(rows_out, cols_out)


def load_real_fixture():
  """tests/data fixture with the gate's evaluation orientation
  (tests/test_model.py::_load_datasets)."""
  import os

  import pandas as pd

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.utils import dataframe_to_csr_matrix

  # anchor on this file, not the CWD (tests/test_model.py does the
  # same with its own __file__)
  data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'tests', 'data')
  train_df = pd.read_csv(os.path.join(data_dir, 'train.csv.gz'))
  val_df = pd.read_csv(os.path.join(data_dir, 'val.csv.gz'))
  val_df = val_df[val_df.sid.isin(train_df.sid.unique())]
  train_m, imap, umap = dataframe_to_csr_matrix(
      train_df, user_col='uid', item_col='sid', inter_col='watched')
  val_m, _, _ = dataframe_to_csr_matrix(
      val_df, user_col='uid', item_col='sid', inter_col='watched',
      item_id_map=imap, user_id_map=umap)
  return (RecommendationDataset(train_m),
          RecommendationDataset(val_m, train_m))


def time_to_quality(trainer, val_ds, metrics, targets, common,
                    max_epochs, eval_batch=BATCH_SIZE):
  """Train epoch-by-epoch (each epoch exactly once), evaluating
  between timestamps; returns (seconds_to_hit_or_None, history)."""
  train_clock = 0.0
  hit_at = None
  history = []
  for epoch in range(1, max_epochs + 1):
    if epoch > 1:
      # advance past the resume-re-runs-last-epoch parity quirk so
      # this call trains exactly epoch `epoch` (see module docstring)
      trainer.current_epoch = epoch
    t0 = time.time()
    trainer.train(num_epochs=epoch, **common)
    train_clock += time.time() - t0
    res = trainer._evaluate(val_ds, num_recommendations=100,
                            metrics=metrics, batch_size=eval_batch)
    vals = {name: float(np.mean(res[m]))
            for name, m in metrics_by_name(metrics).items()}
    history.append({'epoch': epoch, 'train_s': round(train_clock, 2),
                    **{k: round(v, 4) for k, v in vals.items()}})
    log(f'epoch {epoch}: train_clock={train_clock:.2f}s '
        + ' '.join(f'{k}={v:.4f}' for k, v in vals.items()))
    if all(vals[k] >= t for k, t in targets.items()):
      hit_at = train_clock
      break
  return hit_at, history


def metrics_by_name(metrics):
  names = {}
  for m in metrics:
    key = type(m).__name__.lower() + '_' + str(m.k)
    names[key] = m
  return names


def main():
  import argparse
  ap = argparse.ArgumentParser()
  ap.add_argument('--fixture', choices=['real', 'synthetic'],
                  default='real',
                  help='quality anchor (see module docstring)')
  ap.add_argument('--shuffle', choices=['users', 'blocks'],
                  default='blocks',
                  help="sampling mode (blocks: faster step, fixed "
                       "co-batch groups, quality gate-tested; users: "
                       "reference semantics)")
  ap.add_argument('--dtype', choices=['float32', 'bfloat16'],
                  default='float32',
                  help='matmul compute dtype: the quality run is the '
                       'gate for adopting bfloat16 in bench.py')
  ap.add_argument('--opt-state-dtype', choices=['float32', 'bfloat16'],
                  default='float32',
                  help='Adam moment storage dtype: the quality run is '
                       'the gate for adopting bfloat16 optimizer state '
                       'in bench.py (update math stays f32)')
  ap.add_argument('--model', choices=['autoencoder', 'multvae'],
                  default='autoencoder',
                  help="real fixture only: 'autoencoder' is the "
                       "apples-to-apples reference config; 'multvae' "
                       "measures the beyond-parity model against the "
                       "SAME reference-converged quality bar (it "
                       "converges in far fewer epochs)")
  ap.add_argument('--seeds', type=int, default=1,
                  help="number of seeded runs in ONE process (seed = "
                       "42 + i: 42 is the single-run default, so seed "
                       "0 of a sweep reproduces historical quotes). "
                       "The flagship metric is epoch-quantized -- the "
                       "clock stops at the first epoch BOUNDARY whose "
                       "eval clears the bar, so run-to-run noise "
                       "appears as a quantized distribution, not a "
                       "continuum. >1 reports the median and range "
                       "instead of a one-shot number; compilation "
                       "amortizes across runs via the compile cache")
  args = ap.parse_args()

  import jax
  jax.config.update('jax_default_prng_impl', 'rbg')
  from recoder_tpu.metrics import NDCG, Recall
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  cd = None if args.dtype == 'float32' else args.dtype
  osd = (None if args.opt_state_dtype == 'float32'
         else args.opt_state_dtype)
  if args.model == 'multvae' and args.fixture != 'real':
    ap.error('--model multvae is defined for the real fixture only')
  if args.fixture == 'real':
    train_ds, val_ds = load_real_fixture()

    def make_trainer(seed):
      if args.model == 'multvae':
        from recoder_tpu.models import MultVAE
        # fixture-scale shape; KL anneal caps within the expected
        # convergence window (vae_cf schedule: cap at 0.2 * 2000 steps)
        model = MultVAE(hidden_dim=200, latent_dim=64, dropout_prob=0.5,
                        anneal_cap=0.2, total_anneal_steps=2000,
                        compute_dtype=cd)
      else:
        model = DynamicAutoencoder(hidden_layers=[200],
                                   activation_type='tanh',
                                   noise_prob=0.5, compute_dtype=cd)
      return Recoder(model=model, optimizer_type='adam',
                     loss='logloss', opt_state_dtype=osd, seed=seed)

    metrics = [Recall(k=20, normalize=True), Recall(k=50, normalize=True),
               NDCG(k=100)]
    quality, fraction = REAL_QUALITY, REAL_FRACTION
    max_epochs = 40   # headroom past the reference's 30-epoch protocol
  else:
    from recoder_tpu.data import RecommendationDataset
    train_m, val_tr_m, val_te_m = split_heldout(
        synthesize_ml20m(seed=TRAIN_SEED))
    train_ds = RecommendationDataset(train_m)
    val_ds = RecommendationDataset(val_tr_m, val_te_m)

    def make_trainer(seed):
      model = DynamicAutoencoder(hidden_layers=[200],
                                 activation_type='tanh', noise_prob=0.5,
                                 compute_dtype=cd)
      return Recoder(model=model, optimizer_type='adam', loss='mse',
                     loss_params={'confidence': 3}, opt_state_dtype=osd,
                     seed=seed)

    metrics = [Recall(k=20, normalize=True), NDCG(k=100)]
    quality, fraction = SYNTHETIC_QUALITY, SYNTHETIC_FRACTION
    max_epochs = 14

  targets = {}
  for name in metrics_by_name(metrics):
    if name in quality:
      targets[name] = quality[name] * fraction
  log(f'targets ({fraction:.0%} of reference, fixture={args.fixture}, '
      f'shuffle={args.shuffle}): '
      + ' '.join(f'{k} >= {v:.4f}' for k, v in targets.items()))

  common = dict(train_dataset=train_ds, batch_size=BATCH_SIZE, lr=1e-3,
                weight_decay=2e-5, negative_sampling=True,
                shuffle=args.shuffle)

  hits = []
  for i in range(args.seeds):
    seed = 42 + i  # 42 = the Recoder default, so run 0 reproduces
    trainer = make_trainer(seed)
    # compile outside the clock (the reference's torch pays no
    # compile; the K80 claim times training): warm up one epoch +
    # one eval, then reset params/optimizer in place -- same shapes,
    # so the timed run reuses every compiled program. The first
    # warmup pays tracing+compile; later seeds' trainers re-trace but
    # hit the persistent compile cache (seconds). Cost is logged.
    t0 = time.time()
    trainer.train(num_epochs=1, **common)
    trainer._evaluate(val_ds, num_recommendations=100, metrics=metrics,
                      batch_size=BATCH_SIZE)
    log(f'seed {seed}: warmup (compilation) took '
        f'{time.time() - t0:.1f}s; resetting state and starting the '
        f'clock')
    trainer.reset_training_state()

    hit_at, history = time_to_quality(trainer, val_ds, metrics,
                                      targets, common, max_epochs)
    log(f'seed {seed} history: ' + json.dumps(history))
    if hit_at is None:
      log(f'seed {seed}: did NOT reach reference quality within '
          f'{max_epochs} epochs')
      sys.exit(1)
    hits.append(hit_at)
    del trainer

  value = float(np.median(hits))
  out = {
      'metric': 'ml20m_seconds_to_reference_quality',
      'value': round(value, 2),
      'unit': 's',
      'vs_baseline': round(60.0 / value, 3),
  }
  if args.seeds > 1:
    out['seeds'] = args.seeds
    out['runs_s'] = [round(h, 2) for h in sorted(hits)]
  if args.model != 'autoencoder':
    out['model'] = args.model
  print(json.dumps(out))


if __name__ == '__main__':
  main()
