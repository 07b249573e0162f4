"""MSD-big preprocessing: binarize playcounts, filter
min_uc=20 / min_sc=50, hold out 50k users (reference
scripts/msd-big/preprocess.py semantics)."""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..', '..'))


import argparse
import os

import numpy as np
import pandas as pd

from recoder_tpu.preprocessing import strong_generalization_split


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--data-dir', default='data/msd-big/',
                 help='directory containing train_triplets.txt')
  p.add_argument('--out-dir', default=None)
  p.add_argument('--min-uc', type=int, default=20)
  p.add_argument('--min-sc', type=int, default=50)
  p.add_argument('--heldout-users', type=int, default=50000)
  args = p.parse_args()

  out_dir = args.out_dir or os.path.join(args.data_dir, 'pro_sg')
  raw = pd.read_table(os.path.join(args.data_dir, 'train_triplets.txt'),
                      header=None, names=['userId', 'movieId', 'count'])
  raw['count'] = (raw['count'] > 0).astype(np.int8)

  strong_generalization_split(raw, out_dir, user_col='userId',
                              item_col='movieId',
                              n_heldout_users=args.heldout_users,
                              min_uc=args.min_uc, min_sc=args.min_sc)


if __name__ == '__main__':
  main()
