"""Mult-VAE protocol helpers: ranking + held-out multinomial NLL."""

import numpy as np
import pandas as pd
import pytest

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder
from recoder_tpu.protocols import (evaluate_vae_protocol,
                                   heldout_multinomial_nll)
from recoder_tpu.utils import dataframe_to_csr_matrix


@pytest.fixture
def trained():
  rng = np.random.default_rng(0)
  n_users, n_items = 50, 80

  def frame(per_user):
    rows = np.repeat(np.arange(n_users), per_user)
    cols = rng.integers(0, n_items, len(rows))
    return pd.DataFrame({'u': rows, 'i': cols,
                         'v': 1.0}).drop_duplicates(['u', 'i'])

  tm, imap, umap = dataframe_to_csr_matrix(frame(8), 'u', 'i', 'v')
  vin, _, _ = dataframe_to_csr_matrix(frame(5), 'u', 'i', 'v',
                                      item_id_map=imap, user_id_map=umap)
  vout, _, _ = dataframe_to_csr_matrix(frame(4), 'u', 'i', 'v',
                                       item_id_map=imap, user_id_map=umap)
  tr = Recoder(model=DynamicAutoencoder(hidden_layers=[16], noise_prob=0.0),
               optimizer_type='adam', loss='logloss')
  tr.train(train_dataset=RecommendationDataset(tm), batch_size=25,
           num_epochs=3, negative_sampling=True)
  return tr, RecommendationDataset(vin, vout)


def test_heldout_nll_matches_manual(trained):
  tr, val_ds = trained
  nll = heldout_multinomial_nll(tr, val_ds, batch_size=17)
  assert len(nll) > 0 and np.all(np.isfinite(nll)) and np.all(nll > 0)

  # manual check on user 0
  from recoder_tpu.data import UsersInteractions
  ui = UsersInteractions(users=np.arange(1),
                         interactions_matrix=val_ds.interactions_matrix[:1])
  scores = np.asarray(tr.predict(ui))[0, :tr.num_items].astype(np.float64)
  log_probs = scores - np.log(np.exp(scores - scores.max()).sum()) \
      - scores.max()
  tgt = val_ds.target_interactions_matrix
  held = tgt.indices[tgt.indptr[0]:tgt.indptr[1]]
  want = -log_probs[held].mean()
  np.testing.assert_allclose(nll[0], want, rtol=1e-4)


def test_evaluate_vae_protocol_summary(trained):
  tr, val_ds = trained
  summary = evaluate_vae_protocol(tr, val_ds, recall_ks=(10,),
                                  ndcg_ks=(20,), batch_size=25)
  assert set(summary) == {'Recall@10', 'NDCG@20', 'HeldoutMultinomialNLL'}
  assert 0 <= summary['Recall@10'] <= 1
  assert 0 <= summary['NDCG@20'] <= 1
  assert summary['HeldoutMultinomialNLL'] > 0
