"""vae-cf strong-generalization split tests (the protocol the
reference's three preprocess scripts share)."""

import numpy as np
import pandas as pd
import pytest

from recoder_tpu.preprocessing import (filter_triplets,
                                       split_train_test_proportion,
                                       strong_generalization_split)


@pytest.fixture
def raw():
  rng = np.random.default_rng(0)
  n = 20000
  return pd.DataFrame({
      'userId': rng.integers(0, 400, n),
      'movieId': rng.zipf(1.6, n) % 300,
  }).drop_duplicates()


def test_filter_triplets(raw):
  tp, usercount, itemcount = filter_triplets(raw, min_uc=10, min_sc=15)
  # every surviving item had >= min_sc users at filter time; user floor
  # holds exactly (users filtered after items)
  assert usercount.min() >= 10
  assert set(tp.userId) == set(usercount.index)
  assert set(tp.movieId) == set(itemcount.index)


def test_split_proportion(raw):
  tr, te = split_train_test_proportion(raw, test_prop=0.2, min_items=5)
  # disjoint, union = input (for users with >= 5 items)
  merged = pd.concat([tr, te])
  assert len(merged) == len(raw)
  assert len(pd.merge(tr, te, on=['userId', 'movieId'])) == 0
  sizes = raw.groupby('userId').size()
  te_sizes = te.groupby('userId').size()
  for uid, n in sizes.items():
    if n >= 5:
      assert te_sizes.get(uid, 0) == int(0.2 * n)


def test_strong_generalization_split(raw, tmp_path):
  out = str(tmp_path)
  strong_generalization_split(raw, out, n_heldout_users=50,
                              min_uc=5, min_sc=0)
  train = pd.read_csv(f'{out}/train.csv')
  vtr = pd.read_csv(f'{out}/validation_tr.csv')
  vte = pd.read_csv(f'{out}/validation_te.csv')
  ttr = pd.read_csv(f'{out}/test_tr.csv')
  tte = pd.read_csv(f'{out}/test_te.csv')

  # user sets are disjoint across the three groups
  tr_u, v_u, t_u = set(train.uid), set(vtr.uid) | set(vte.uid), \
      set(ttr.uid) | set(tte.uid)
  assert not (tr_u & v_u) and not (tr_u & t_u) and not (v_u & t_u)
  assert len(v_u) <= 50 and len(t_u) <= 50

  # held-out items only from the training item vocabulary
  sids = set(train.sid)
  for df in (vtr, vte, ttr, tte):
    assert set(df.sid) <= sids
    assert (df.watched == 1).all()

  # fold-in and held-out are per-user disjoint
  assert len(pd.merge(vtr, vte, on=['uid', 'sid'])) == 0
