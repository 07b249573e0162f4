"""Regenerate tests/data fixtures.

The reference's integration test (tests/test_model.py) ships a
train.csv/val.csv pair derived from ML-20M; its train.csv is not
available in the snapshot (stripped large blob). This script rebuilds
an equivalent pair from the available val.csv: a deterministic per-user
80/20 split where the 80% side becomes train.csv (training data AND
eval ground-truth) and the 20% side becomes val.csv (eval fold-in
input), matching the reference test's evaluation orientation
(`RecommendationDataset(val_matrix, train_matrix)`).

Usage: python tools/make_test_data.py [source_csv] [out_dir]
"""

import sys

import numpy as np
import pandas as pd


def main(source='/root/reference/tests/data/val.csv', out_dir='tests/data'):
  df = pd.read_csv(source)
  rng = np.random.default_rng(98765)

  tr_parts, te_parts = [], []
  for _, group in df.groupby('uid'):
    n = len(group)
    if n >= 5:
      k = max(1, int(0.2 * n))
      idx = rng.choice(n, size=k, replace=False)
      mask = np.zeros(n, dtype=bool)
      mask[idx] = True
      tr_parts.append(group[~mask])
      te_parts.append(group[mask])
    else:
      tr_parts.append(group)

  train = pd.concat(tr_parts)
  val = pd.concat(te_parts)
  # eval fold-in items must exist in the training item set
  val = val[val.sid.isin(train.sid.unique())]

  train.to_csv(f'{out_dir}/train.csv.gz', index=False, compression='gzip')
  val.to_csv(f'{out_dir}/val.csv.gz', index=False, compression='gzip')
  print(f'train: {len(train)} rows, {train.uid.nunique()} users, '
        f'{train.sid.nunique()} items')
  print(f'val:   {len(val)} rows, {val.uid.nunique()} users, '
        f'{val.sid.nunique()} items')


if __name__ == '__main__':
  main(*sys.argv[1:])
