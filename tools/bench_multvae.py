"""Measure Mult-VAE training throughput at the paper shape on ML-20M.

The Mult-VAE paper (Liang et al. WWW'18) trains [600 hidden, 200
latent] with full-softmax multinomial NLL at batch 500 on ML-20M.
This script measures user-batches/s on the synthetic ML-20M-shape
workload (bench.py's generator) for:

  * f32 vs bfloat16 compute — the first model family here wide enough
    (d=600) for bf16 MXU savings to plausibly beat the convert traffic
    (the d=200 DynAE headline measured bf16 LOSING before the slab
    cache landed, then winning +9.9% on top of it; ROADMAP item 18
    said re-open at d>=512);
  * negative-sampling (union/full-decode) vs the paper's full-softmax
    (negative_sampling=False) configuration.

  * optionally ``MultVAE(sparse=True)`` (--sparse) at a custom catalog
    shape (--items/--users), the receipt for when the row-sparse
    optimizer trade pays for this family (VERDICT r3: >= 100k items).

Usage: python tools/bench_multvae.py [--epochs 3] [--mode ns|fs|both]
Prints one JSON line per configuration on stdout; progress on stderr.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')
from bench import BATCH_SIZE, NUM_USERS, synthesize_ml20m, log  # noqa: E402


def run(matrix, compute_dtype, negative_sampling, epochs, sparse=False):
  import jax
  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import MultVAE

  model = MultVAE(hidden_dim=600, latent_dim=200, dropout_prob=0.5,
                  anneal_cap=0.2, total_anneal_steps=200000,
                  sparse=sparse, compute_dtype=compute_dtype)
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss')
  dataset = RecommendationDataset(matrix)
  num_users = matrix.shape[0]
  common = dict(train_dataset=dataset, batch_size=BATCH_SIZE, lr=1e-3,
                negative_sampling=negative_sampling,
                num_data_workers=0, shuffle='blocks')
  num_batches = int(np.ceil(num_users / BATCH_SIZE))

  log(f'[{compute_dtype or "float32"} ns={negative_sampling}] warmup...')
  trainer.train(num_epochs=1, **common)
  timed = epochs - trainer.current_epoch + 1
  t0 = time.time()
  trainer.train(num_epochs=epochs, **common)
  dt = time.time() - t0
  bps = timed * num_batches / dt
  log(f'  {bps:.1f} batches/s ({dt / timed:.2f}s/epoch x {timed})')
  return bps


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--epochs', type=int, default=3)
  ap.add_argument('--mode', choices=['ns', 'fs', 'both'], default='ns')
  ap.add_argument('--dtypes', default='float32,bfloat16')
  ap.add_argument('--sparse', choices=['dense', 'sparse', 'both'],
                  default='dense',
                  help="also/only measure MultVAE(sparse=True) "
                       "(row-sparse Adam over the union; ns modes only)")
  ap.add_argument('--items', type=int, default=0,
                  help='custom catalog size (default: ML-20M shape); '
                       'use >= 100k to measure where the sparse trade '
                       'pays')
  ap.add_argument('--users', type=int, default=0)
  ap.add_argument('--mean-items', type=int, default=0)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_default_prng_impl', 'rbg')

  if args.items:
    from bench import synthesize
    matrix = synthesize(args.users or NUM_USERS, args.items,
                        args.mean_items or 60, mean_factor=0.68)
    shape_tag = f'{matrix.shape[0]}x{args.items}'
  else:
    matrix = synthesize_ml20m()
    shape_tag = 'ml20m'
  modes = {'ns': [True], 'fs': [False], 'both': [True, False]}[args.mode]
  sparsities = {'dense': [False], 'sparse': [True],
                'both': [False, True]}[args.sparse]
  for negative_sampling in modes:
    for sparse in sparsities:
      if sparse and not negative_sampling:
        continue  # the sparse path is the union path by construction
      for dt in args.dtypes.split(','):
        cd = None if dt == 'float32' else dt
        bps = run(matrix, cd, negative_sampling, args.epochs,
                  sparse=sparse)
        print(json.dumps({
            'metric': f'multvae_{shape_tag}_user_batches_per_sec',
            'value': round(bps, 2), 'unit': 'batches/s',
            'compute_dtype': dt,
            'negative_sampling': negative_sampling,
            'sparse': sparse,
        }), flush=True)


if __name__ == '__main__':
  main()
