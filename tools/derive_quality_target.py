"""Derive the reference's ranking quality on the synthetic ML-20M-class
benchmark dataset (the time-to-quality target for bench_quality.py).

Runs the ACTUAL torch reference (loaded via tests/reference_shim.py)
with the README headline config (DynamicAutoencoder[200], MSE,
negative sampling, batch 500 -- reference README.md:26-27, "fully
trained in less than a minute" on a K80 = 10 epochs at its batch rate)
on the exact dataset bench.py synthesizes, with a vae_cf-style
strong-generalization split (10k held-out users, 80/20 fold-in), and
prints the Recall@20 / NDCG@100 it reaches. bench_quality.py pins these
numbers as the quality bar our TPU implementation must reach, and
measures the wall-clock to reach it.

Run: PYTHONPATH=/root/repo python tools/derive_quality_target.py
(CPU-only; ~15 min. Re-run whenever bench.py's synthesizer changes.)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

from bench import BATCH_SIZE, synthesize_ml20m
from bench_quality import (HELDOUT_USERS, NUM_EPOCHS, TRAIN_SEED,
                           split_heldout)


def main():
  from reference_shim import load_reference
  load_reference()
  from recoder.data import RecommendationDataset
  from recoder.metrics import NDCG, Recall
  from recoder.model import Recoder
  from recoder.nn import DynamicAutoencoder

  train_m, val_tr_m, val_te_m = split_heldout(synthesize_ml20m())

  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5, sparse=False)
  trainer = Recoder(model=model, use_cuda=False, optimizer_type='adam',
                    loss='mse', loss_params={'confidence': 3})
  t0 = time.time()
  trainer.train(train_dataset=RecommendationDataset(train_m),
                batch_size=BATCH_SIZE, lr=1e-3, weight_decay=2e-5,
                num_epochs=NUM_EPOCHS, negative_sampling=True)
  train_s = time.time() - t0

  val_ds = RecommendationDataset(val_tr_m, val_te_m)
  res = trainer._evaluate(eval_dataset=val_ds, num_recommendations=100,
                          metrics=[Recall(k=20, normalize=True),
                                   NDCG(k=100)],
                          batch_size=BATCH_SIZE)
  out = {str(k): round(float(np.mean(v)), 5) for k, v in res.items()}
  out['train_seconds_cpu'] = round(train_s, 1)
  out['epochs'] = NUM_EPOCHS
  out['seed'] = TRAIN_SEED
  out['heldout_users'] = HELDOUT_USERS
  print(json.dumps(out))
  # NOTE: bench_quality pins the reference's PEAK quality across the
  # budget, not this endpoint -- on the synthetic data the reference
  # peaks at epoch 1 and declines; re-derive the per-epoch curve
  # (train num_epochs=e incrementally, evaluating each e) when the
  # synthesizer changes.


if __name__ == '__main__':
  main()
