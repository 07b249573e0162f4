"""MultVAE tests: forward/aux contracts, beta annealing, trainer
integration with the aux-loss hook, checkpoint roundtrip, and a
slow-tier quality gate on the real fixture.

MultVAE is a beyond-parity addition: the canonical model (Liang et
al., WWW'18) for the vae_cf protocol this package's preprocessing
implements. Measured 2026-08-18 on the fixture: 8 epochs reach
Recall@20 0.1454 / NDCG@100 0.1726 -- above the 30-epoch DynAE
reference-pinned values (0.1417/0.1684, tests/test_model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.sparse import csr_matrix

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.model import Recoder
from recoder_tpu.models import MultVAE


def _matrix(users=48, items=90, seed=0):
  rng = np.random.default_rng(seed)
  m = (rng.random((users, items)) < 0.12).astype(np.float32)
  m[:, 0] = 1.0
  return csr_matrix(m)


def _model(**kw):
  kw.setdefault('hidden_dim', 32)
  kw.setdefault('latent_dim', 8)
  kw.setdefault('dropout_prob', 0.5)
  return MultVAE(**kw)


def test_multvae_train_returns_scores_and_kl_aux():
  model = _model(anneal_cap=0.2, total_anneal_steps=0)
  model.init_model(num_items=90, seed=0)
  x = np.asarray(_matrix().todense())[:8]
  out = model.apply(model.params, jnp.asarray(x), rng=jax.random.PRNGKey(0),
                    training=True)
  assert isinstance(out, tuple) and len(out) == 2
  scores, aux = out
  assert scores.shape == (8, model.num_items_padded)
  assert aux.shape == (8,)
  # aux = beta * KL >= 0 (KL of a gaussian vs the standard normal)
  assert np.all(np.asarray(aux) >= 0)


def test_multvae_eval_is_deterministic_plain_scores():
  model = _model()
  model.init_model(num_items=90, seed=0)
  x = jnp.asarray(np.asarray(_matrix().todense())[:4])
  s1 = model.apply(model.params, x, training=False)
  s2 = model.apply(model.params, x, training=False)
  assert not isinstance(s1, tuple)  # eval: no aux, unchanged contract
  np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_multvae_beta_anneals_with_step():
  model = _model(anneal_cap=0.2, total_anneal_steps=100)
  model.init_model(num_items=90, seed=0)
  x = jnp.asarray(np.asarray(_matrix().todense())[:4])
  rng = jax.random.PRNGKey(1)

  def aux_at(step):
    _, aux = model.apply(model.params, x, rng=rng, training=True,
                         step=jnp.int32(step))
    return np.asarray(aux)

  a0, a50, a100, a500 = aux_at(0), aux_at(50), aux_at(100), aux_at(500)
  np.testing.assert_array_equal(a0, 0.0)           # beta(0) = 0
  np.testing.assert_allclose(a50 * 2, a100, rtol=1e-5)  # linear ramp
  np.testing.assert_allclose(a100, a500, rtol=1e-6)     # capped


def test_multvae_trains_and_checkpoint_roundtrips(tmp_path):
  from recoder_tpu.metrics import Recall

  m = _matrix(users=60, items=80, seed=2)
  ds = RecommendationDataset(m)
  model = _model(total_anneal_steps=50)
  tr = Recoder(model=model, optimizer_type='adam', loss='logloss', seed=0)
  tr.train(train_dataset=ds, batch_size=20, lr=1e-3, num_epochs=3,
           negative_sampling=True)

  val_ds = RecommendationDataset(m, m)  # smoke eval orientation
  res = tr._evaluate(val_ds, num_recommendations=20,
                     metrics=[Recall(k=10)], batch_size=20)
  base = float(np.mean(res[Recall(k=10)]))

  prefix = str(tmp_path / 'vae')
  saved = tr.save_state(prefix)
  model2 = MultVAE()
  tr2 = Recoder(model=model2, optimizer_type='adam', loss='logloss')
  tr2.init_from_model_file(saved)
  assert model2.hidden_dim == 32 and model2.latent_dim == 8
  assert model2.total_anneal_steps == 50
  res2 = tr2._evaluate(val_ds, num_recommendations=20,
                       metrics=[Recall(k=10)], batch_size=20)
  assert float(np.mean(res2[Recall(k=10)])) == base

  # resume training continues (the KL annealing step counter persists)
  assert tr2._global_step == tr._global_step
  tr2.train(train_dataset=ds, batch_size=20, lr=1e-3, num_epochs=4,
            negative_sampling=True)


def test_multvae_aux_ignores_padded_user_rows():
  """The trainer adds sum(aux * row_mask): padded user rows must not
  contribute KL. Train a batch whose mega is smaller than batch_size
  and check the loss is finite and padding-independent by comparing
  two paddings of the same users."""
  m = _matrix(users=10, items=40, seed=3)
  ds = RecommendationDataset(m)
  losses = {}
  for bs in (10, 16):  # 16 pads 6 phantom rows
    model = _model(dropout_prob=0.0, total_anneal_steps=0)
    tr = Recoder(model=model, optimizer_type='adam', loss='logloss',
                 seed=0)
    tr.train(train_dataset=ds, batch_size=bs, lr=0.0, num_epochs=1,
             negative_sampling=False, shuffle='blocks')
    # lr=0: params unchanged; recover the loss by recomputing it
    x = np.asarray(m.todense(), np.float32)
    scores = model.apply(model.params, jnp.asarray(x), training=False)
    from recoder_tpu.ops.losses import multinomial_nll_loss
    col_mask = (jnp.arange(scores.shape[1]) < 40).astype(jnp.float32)
    loss = jnp.sum(multinomial_nll_loss(scores, jnp.asarray(
        np.pad(x, ((0, 0), (0, scores.shape[1] - 40)))),
        col_mask=col_mask)) / 10
    losses[bs] = float(loss)
  assert np.isfinite(losses[10]) and np.isfinite(losses[16])
  np.testing.assert_allclose(losses[10], losses[16], rtol=1e-6)


@pytest.mark.slow
def test_multvae_fixture_quality():
  """8-epoch MultVAE beats the 30-epoch DynAE reference-pinned metrics
  on the real fixture (floors set with seed-noise margin below the
  measured 0.1454/0.1726)."""
  import pandas as pd

  from recoder_tpu.metrics import NDCG, Recall
  from recoder_tpu.utils import dataframe_to_csr_matrix

  train_df = pd.read_csv('tests/data/train.csv.gz')
  val_df = pd.read_csv('tests/data/val.csv.gz')
  train_m, imap, umap = dataframe_to_csr_matrix(train_df, 'uid', 'sid',
                                                'watched')
  val_m, _, _ = dataframe_to_csr_matrix(val_df, 'uid', 'sid', 'watched',
                                        item_id_map=imap, user_id_map=umap)
  model = MultVAE(hidden_dim=200, latent_dim=64, dropout_prob=0.5,
                  anneal_cap=0.2, total_anneal_steps=2000)
  tr = Recoder(model=model, optimizer_type='adam', loss='logloss', seed=0)
  tr.train(train_dataset=RecommendationDataset(train_m), batch_size=500,
           lr=1e-3, num_epochs=8, negative_sampling=True)
  res = tr._evaluate(RecommendationDataset(val_m, train_m),
                     num_recommendations=100,
                     metrics=[Recall(k=20), NDCG(k=100)], batch_size=500)
  means = {str(k): float(np.mean(v)) for k, v in res.items()}
  assert means['Recall@20'] > 0.135, means
  assert means['NDCG@100'] > 0.160, means
