"""Headline benchmark: ML-20M-scale training throughput on one chip.

Workload (BASELINE.json config 2 / reference README.md:26-27 claim):
DynamicAutoencoder[200], MSE loss, mini-batch negative sampling,
batch_size=500 -- the config the reference "fully trains in less than a
minute" on an Nvidia Tesla K80. ML-20M itself is not vendored here, so
the benchmark synthesizes a dataset with ML-20M's published post-filter
shape (116,677 train users, 20,108 items, ~9.99M interactions; vae_cf
split, scripts/ml-20m/preprocess.py) and Zipf item popularity, which
reproduces the batch item-union statistics that drive the compute.

Baseline derivation: "fully trained < 60 s" on K80 at batch 500 over
117k users ~= 10 epochs x 234 user-batches / 60 s = 39 user-batches/s.
vs_baseline is measured steady-state user-batches/s over that number.

Prints ONE JSON line:
  {"metric": "ml20m_user_batches_per_sec", "value": N,
   "unit": "batches/s", "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


K80_BASELINE_BATCHES_PER_SEC = 39.0

NUM_USERS = 116_677
NUM_ITEMS = 20_108
MEAN_ITEMS_PER_USER = 86
BATCH_SIZE = 500

# MSD post-vae_cf-filter shape (reference scripts/msd/preprocess.py
# protocol; Liang et al. 2018 report 571,355 users x 41,140 items)
MSD_USERS = 571_355
MSD_ITEMS = 41_140
MSD_MEAN_ITEMS_PER_USER = 59


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def synthesize(num_users, num_items, mean_items, seed=0,
               mean_factor=0.683):
  """CSR matrix with the given shape and a Zipf popularity profile.

  ``mean_factor`` calibrates the lognormal location so the POST-dedup
  nnz matches ``mean_items`` per user (a lognormal with sigma=0.9 has
  mean e^{sigma^2/2} ~= 1.5x its median, and duplicate (user, item)
  draws collapse): 0.683 lands ML-20M at 9,988,862 nnz / 85.6
  items-per-user (target ~9.99M) and 0.68 lands MSD at 59.2
  (measured; an uncalibrated 0.6 ran ~12% light).
  """
  from scipy.sparse import csr_matrix
  rng = np.random.default_rng(seed)
  # per-user interaction counts: lognormal, clipped to [5, 1000]
  counts = np.clip(rng.lognormal(mean=np.log(mean_items * mean_factor),
                                 sigma=0.9, size=num_users),
                   5, 1000).astype(np.int64)
  total = int(counts.sum())
  log(f'synthesizing {total:,} interactions for {num_users:,} users '
      f'x {num_items:,} items')
  users = np.repeat(np.arange(num_users, dtype=np.int64), counts)
  # Zipf-ish item popularity via the inverse-CDF of a power law
  u = rng.random(total)
  items = np.floor(num_items * u ** 2.2).astype(np.int64)
  items = np.minimum(items, num_items - 1)
  vals = np.ones(total, dtype=np.float32)
  m = csr_matrix((vals, (users, items)), shape=(num_users, num_items))
  m.sum_duplicates()
  m.data[:] = 1.0
  log(f'matrix built: nnz={m.nnz:,}')
  return m


def synthesize_ml20m(seed=0):
  """CSR matrix with ML-20M's shape (see :func:`synthesize`)."""
  return synthesize(NUM_USERS, NUM_ITEMS, MEAN_ITEMS_PER_USER, seed)


def main():
  import argparse
  ap = argparse.ArgumentParser()
  # blocks is the default: convergence to reference quality is
  # gate-tested (tests/test_model.py::test_blocks_shuffle_reaches_
  # reference_quality) and it removes the flat-CSR gather floor
  ap.add_argument('--shuffle', choices=['users', 'blocks'],
                  default='blocks',
                  help="sampling mode (users: reference semantics, "
                       "fresh co-batch groups each epoch; blocks: "
                       "faster step, measured quality-neutral)")
  ap.add_argument('--dtype', choices=['auto', 'float32', 'bfloat16'],
                  default='auto',
                  help="matmul compute dtype. 'auto' = bfloat16 for "
                       "dense models (quality gate-tested at the "
                       "reference-pinned metrics: tests/test_model.py "
                       "bf16 row + bench_quality.py --dtype bfloat16) "
                       "and float32 for --sparse (sparse path not "
                       "quality-gated at bf16; measured neutral "
                       "anyway, docs/benchmarks.md)")
  ap.add_argument('--opt-state-dtype',
                  choices=['auto', 'float32', 'bfloat16'], default='auto',
                  help="Adam moment storage dtype. 'auto' = bfloat16 "
                       "for dense models (quality gate-tested: "
                       "tests/test_model.py bf16 opt-state row; the "
                       "optimizer's full-table m/v traffic is the "
                       "dominant dense-step stage per the "
                       "docs/benchmarks.md roofline) and float32 for "
                       "--sparse (not gated there)")
  ap.add_argument('--params-dtype',
                  choices=['auto', 'float32', 'bfloat16'], default='auto',
                  help="parameter STORAGE dtype for training "
                       "(quality-gated, tests/test_model.py bf16 "
                       "params row; update math stays f32 -- "
                       "optim.Optimizer.update). 'auto' = float32: "
                       "measured and REJECTED as the throughput "
                       "default (docs/benchmarks.md r4 -- the [W, d] "
                       "tables are small next to the bf16 slab "
                       "traffic and the f32-anchor casts cost more "
                       "than the halved param bytes save). bf16 "
                       "params remain the opt-in HBM-footprint lever "
                       "for catalog-ceiling configs")
  ap.add_argument('--sparse', action='store_true',
                  help="msd only: use sparse embedding tables "
                       "(row-sparse Adam over gathered unions), the "
                       "reference script's configuration. Default is "
                       "dense + full-decode, measured 2.1x faster at "
                       "MSD shape (docs/benchmarks.md) with the same "
                       "gate-tested quality")
  ap.add_argument('--batch-size', type=int, default=BATCH_SIZE,
                  help="users per step. 500 is the reference protocol "
                       "and the ONLY value vs_baseline is quoted for; "
                       "other values (e.g. 2000) measure the framework "
                       "ceiling beyond the protocol (quality-gated at "
                       "30 epochs like every adoption, tests/"
                       "test_model.py bs-2000 row) and report "
                       "vs_baseline=null plus a batch_size tag")
  ap.add_argument('--slab-cache', choices=['auto', 'off', 'dense', 'packed'],
                  default='auto',
                  help="resident slab cache tier for full-decode steps "
                       "(device_pipeline.maybe_cache_slabs). 'auto' "
                       "prefers dense within the HBM budget and falls "
                       "back to bit-packed for binary data (MSD's 44 "
                       "GiB bf16 slab is ineligible; the 1-bit slab is "
                       "~2.8 GiB); 'off' measures the per-step triplet "
                       "scatter (the A/B control)")
  ap.add_argument('--dataset', choices=['ml20m', 'msd'], default='ml20m',
                  help="workload shape: ml20m (MSE headline config) or "
                       "msd (BASELINE config 3: multinomial NLL "
                       "'logloss', sparse tables, 571k users x 41k "
                       "items -- reference scripts/msd/train.py:42-49)")
  args = ap.parse_args()

  import jax
  # rbg is ~3% faster than threefry for the per-step dropout masks and
  # hardware-friendly on TPU; streams only affect dropout realization
  jax.config.update('jax_default_prng_impl', 'rbg')
  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  if args.sparse and args.dataset != 'msd':
    ap.error('--sparse applies to --dataset msd only (the ml20m MSE '
             'headline config is dense in the reference script too, '
             'scripts/ml-20m/train.py)')
  sparse = args.sparse
  if args.dtype == 'auto':
    args.dtype = 'float32' if sparse else 'bfloat16'
  cd = None if args.dtype == 'float32' else args.dtype
  if args.opt_state_dtype == 'auto':
    args.opt_state_dtype = 'float32' if sparse else 'bfloat16'
  osd = None if args.opt_state_dtype == 'float32' else args.opt_state_dtype
  if args.params_dtype == 'auto':
    # rejected as the default on measurement: two interleaved A/B
    # pairs, bf16 1800.9/1723.9 vs f32 1810.1/1810.0 b/s
    # (docs/benchmarks.md r4 bf16-params section)
    args.params_dtype = 'float32'
  pd = None if args.params_dtype == 'float32' else args.params_dtype
  if pd is not None and cd is None:
    # the model defaults compute_dtype to params_dtype when compute is
    # unspecified; the resolved --dtype float32 must WIN over that
    # default, so pass it explicitly (f32 matmuls over bf16 storage)
    cd = args.dtype
  if args.dataset == 'msd':
    matrix = synthesize(MSD_USERS, MSD_ITEMS, MSD_MEAN_ITEMS_PER_USER,
                        mean_factor=0.68)
    num_users = MSD_USERS
    # default dense: at MSD's catalog/union ratio (~2.9x) the
    # full-decode dense step beats the sparse union path 2.1x (the
    # row-scatters cost full-table passes anyway, docs/benchmarks.md);
    # --sparse measures the reference script's sparse=True config
    model = DynamicAutoencoder(hidden_layers=[200],
                               activation_type='tanh', noise_prob=0.5,
                               sparse=sparse, compute_dtype=cd,
                               params_dtype=pd)
    trainer = Recoder(model=model, optimizer_type='adam',
                      loss='logloss', opt_state_dtype=osd)
    metric_name = 'msd_user_batches_per_sec'
  else:
    matrix = synthesize_ml20m()
    num_users = NUM_USERS
    model = DynamicAutoencoder(hidden_layers=[200],
                               activation_type='tanh', noise_prob=0.5,
                               compute_dtype=cd, params_dtype=pd)
    trainer = Recoder(model=model, optimizer_type='adam', loss='mse',
                      loss_params={'confidence': 3}, opt_state_dtype=osd)
    metric_name = 'ml20m_user_batches_per_sec'
  dataset = RecommendationDataset(matrix)

  num_batches = int(np.ceil(num_users / args.batch_size))

  # the fused on-device pipeline serves this workload: host loader
  # workers are never consumed, and their processes contend with the
  # dispatch thread on small hosts -- keep them off
  slab_cache = {'auto': 'auto', 'off': False, 'dense': True,
                'packed': 'packed'}[args.slab_cache]
  common = dict(train_dataset=dataset, batch_size=args.batch_size, lr=1e-3,
                weight_decay=2e-5, negative_sampling=True,
                num_data_workers=0, shuffle=args.shuffle,
                slab_cache=slab_cache)

  # warmup epoch: jit compiles for every shape bucket
  log('warmup epoch (compilation)...')
  trainer.train(num_epochs=1, **common)

  # train(num_epochs=N) resumes from current_epoch INCLUSIVE (reference
  # model.py:360 semantics: the last completed epoch re-runs), so count
  # the epochs the timed call actually executes
  target_epochs = 4
  timed_epochs = target_epochs - trainer.current_epoch + 1
  log(f'timing {timed_epochs} epochs...')
  t0 = time.time()
  trainer.train(num_epochs=target_epochs, **common)
  dt = time.time() - t0

  batches_per_sec = timed_epochs * num_batches / dt
  epoch_time = dt / timed_epochs
  log(f'epoch_time={epoch_time:.2f}s  users/s='
      f'{timed_epochs * num_users / dt:,.0f}  '
      f'full-train(10ep) projection={10 * epoch_time:.1f}s')

  # the K80 baseline is derived from the reference's ML-20M "<60 s"
  # claim only; no published MSD baseline exists (BASELINE.json
  # 'published' is empty), so an MSD ratio against it would be
  # meaningless accounting -- emit null instead. The baseline is also
  # defined at the protocol's bs=500 only: a bs-2000 "batch" is 4x the
  # users, so its batches/s is not commensurable with the K80 number.
  vs_baseline = (round(batches_per_sec / K80_BASELINE_BATCHES_PER_SEC, 3)
                 if args.dataset == 'ml20m'
                 and args.batch_size == BATCH_SIZE else None)
  out = {
      'metric': metric_name,
      'value': round(batches_per_sec, 2),
      'unit': 'batches/s',
      'vs_baseline': vs_baseline,
  }
  if args.batch_size != BATCH_SIZE:
    out['batch_size'] = args.batch_size
    # actual users served, not num_batches * bs: the final partial
    # batch would otherwise overstate users/s by up to bs/num_users
    out['users_per_sec'] = round(timed_epochs * num_users / dt, 1)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
