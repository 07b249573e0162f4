"""ML-20M preprocessing: binarize (rating > 3.5), vae-cf strong
generalization split with 10k held-out users (reference
scripts/ml-20m/preprocess.py semantics, argparse instead of hard-coded
paths)."""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..', '..'))


import argparse
import os

import pandas as pd

from recoder_tpu.preprocessing import strong_generalization_split


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--data-dir', default='data/ml-20m/',
                 help='directory containing ratings.csv')
  p.add_argument('--out-dir', default=None,
                 help='output dir (default: <data-dir>/pro_sg)')
  p.add_argument('--min-rating', type=float, default=3.5)
  p.add_argument('--min-uc', type=int, default=5)
  p.add_argument('--heldout-users', type=int, default=10000)
  args = p.parse_args()

  out_dir = args.out_dir or os.path.join(args.data_dir, 'pro_sg')
  raw = pd.read_csv(os.path.join(args.data_dir, 'ratings.csv'), header=0)
  raw = raw[raw['rating'] > args.min_rating]

  strong_generalization_split(raw, out_dir, user_col='userId',
                              item_col='movieId',
                              n_heldout_users=args.heldout_users,
                              min_uc=args.min_uc, min_sc=0)


if __name__ == '__main__':
  main()
