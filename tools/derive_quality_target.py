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
  val_ds = RecommendationDataset(val_tr_m, val_te_m)
  train_ds = RecommendationDataset(train_m)

  # bench_quality pins the reference's PEAK quality across the budget,
  # not the endpoint (on this synthetic data the curve peaks at epoch 1
  # and declines) -- evaluate after EVERY epoch and report the curve.
  peak = {}
  for e in range(1, NUM_EPOCHS + 1):
    t0 = time.time()
    trainer.train(train_dataset=train_ds, batch_size=BATCH_SIZE, lr=1e-3,
                  weight_decay=2e-5, num_epochs=e, negative_sampling=True)
    # the reference re-runs the last completed epoch on resume
    # (reference model.py:360); advance past it so each epoch trains
    # exactly once
    trainer.current_epoch = e + 1
    train_s = time.time() - t0
    res = trainer._evaluate(eval_dataset=val_ds, num_recommendations=100,
                            metrics=[Recall(k=20, normalize=True),
                                     NDCG(k=100)],
                            batch_size=BATCH_SIZE)
    out = {str(k): round(float(np.mean(v)), 5) for k, v in res.items()}
    for k, v in out.items():
      peak[k] = max(peak.get(k, 0.0), v)
    out.update(epoch=e, epoch_seconds=round(train_s, 1))
    print(json.dumps(out), flush=True)
    # the curves on this data decline monotonically after their peak;
    # stop once both metrics have fallen 10% off it (saves most of the
    # 10-epoch budget on a 1-core host)
    if all(out[k] < 0.9 * peak[k] for k in ('Recall@20', 'NDCG@100')):
      break
  print(json.dumps({'peak': peak, 'seed': TRAIN_SEED,
                    'heldout_users': HELDOUT_USERS}))


if __name__ == '__main__':
  main()
