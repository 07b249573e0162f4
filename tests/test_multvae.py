"""MultVAE tests: forward/aux contracts, beta annealing, trainer
integration with the aux-loss hook, checkpoint roundtrip, and a
slow-tier quality gate on the real fixture.

MultVAE is a beyond-parity addition: the canonical model (Liang et
al., WWW'18) for the vae_cf protocol this package's preprocessing
implements. Measured 2026-08-18 on the fixture: 8 epochs reach
Recall@20 0.1440 / NDCG@100 0.1703 -- above the 30-epoch DynAE
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
  """vae_cf schedule: beta = min(anneal_cap, step / total_anneal_steps)
  -- the cap is reached after anneal_cap * total steps (Liang et al.'s
  code), NOT after total steps."""
  model = _model(anneal_cap=0.2, total_anneal_steps=100)
  model.init_model(num_items=90, seed=0)
  x = jnp.asarray(np.asarray(_matrix().todense())[:4])
  rng = jax.random.PRNGKey(1)

  def aux_at(step):
    _, aux = model.apply(model.params, x, rng=rng, training=True,
                         step=jnp.int32(step))
    return np.asarray(aux)

  a0, a5, a10, a20, a500 = (aux_at(0), aux_at(5), aux_at(10), aux_at(20),
                            aux_at(500))
  np.testing.assert_array_equal(a0, 0.0)           # beta(0) = 0
  np.testing.assert_allclose(a5 * 2, a10, rtol=1e-5)  # linear ramp
  np.testing.assert_allclose(a20, a500, rtol=1e-6)    # capped at 20 steps


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
  """_forward_loss adds sum(aux * row_mask): phantom (padded) user rows
  must contribute zero KL. At init phantom KL is exactly 0 (zero input
  -> zero activations -> mu = logvar = 0), which would hide a dropped
  row_mask — so first train one epoch to move the biases, assert the
  phantom rows' KL is genuinely nonzero at those params, then check the
  trainer's loss equals the manual valid-rows-only expectation."""
  m = _matrix(users=10, items=40, seed=3)
  ds = RecommendationDataset(m)
  model = _model(dropout_prob=0.0, total_anneal_steps=0, anneal_cap=0.2)
  tr = Recoder(model=model, optimizer_type='adam', loss='logloss', seed=0)
  tr.train(train_dataset=ds, batch_size=10, lr=1e-2, num_epochs=1,
           negative_sampling=False)
  params = model.params

  coo = m.tocoo()
  B, valid = 16, 10  # 6 phantom rows
  staged = {
      'in_rows': jnp.asarray(coo.row, jnp.int32),
      'in_cols': jnp.asarray(coo.col, jnp.int32),
      'in_vals': jnp.asarray(coo.data, jnp.float32),
      'in_users': jnp.arange(B, dtype=jnp.int32),
      'in_items': None,
      'in_valid_users': np.float32(valid),
      'in_valid_width': np.int32(40),
  }
  rng = jax.random.PRNGKey(7)
  step = jnp.int32(3)
  loss = float(tr._forward_loss(params, staged, rng, training=True,
                                step=step))

  # manual expectation over the identical dense input / rng / step
  dense = tr._densify(staged['in_rows'], staged['in_cols'],
                      staged['in_vals'], B, model.num_items_padded)
  out, aux = model.apply(params, dense, input_users=staged['in_users'],
                         rng=rng, training=True, step=step,
                         **tr._apply_extra_kwargs())
  aux = np.asarray(aux)
  assert aux[valid:].sum() > 1e-4, 'phantom KL is zero: test is vacuous'
  row_mask = (jnp.arange(B) < valid).astype(jnp.float32)
  col_mask = (jnp.arange(model.num_items_padded) < 40) \
      .astype(jnp.float32)
  data = float(tr.loss_module(out, dense, row_mask=row_mask,
                              col_mask=col_mask))
  expected = (data + aux[:valid].sum()) / valid
  np.testing.assert_allclose(loss, expected, rtol=1e-6)


def test_multvae_apply_gathered_matches_apply():
  """The sparse path's pre-gathered forward must equal the table-gather
  forward bit-for-bit (same params, ids, rng, step)."""
  model = _model(total_anneal_steps=0)
  model.init_model(num_items=90, seed=1)
  params = model.params
  ids = jnp.asarray([3, 7, 20, 41, 88], jnp.int32)
  x = jnp.asarray(np.asarray(_matrix().todense())[:6, :5], jnp.float32)
  rng = jax.random.PRNGKey(2)

  s1, a1 = model.apply(params, x, input_items=ids, target_items=ids,
                       rng=rng, training=True, step=jnp.int32(4))
  gathered = {'en_rows': params['en_embedding'][ids],
              'de_rows': params['de_embedding'][ids]}
  s2, a2 = model.apply_gathered(params, gathered, x, input_items=ids,
                                target_items=ids, rng=rng, training=True,
                                step=jnp.int32(4))
  np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
  np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
  # eval mode too (plain scores, no aux)
  e1 = model.apply(params, x, input_items=ids, target_items=ids)
  e2 = model.apply_gathered(params, gathered, x, input_items=ids,
                            target_items=ids)
  np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_multvae_sparse_trains():
  """sparse=True routes the tables through row-sparse Adam; training
  must run end-to-end and beat random ranking."""
  from recoder_tpu.metrics import Recall

  m = _matrix(users=60, items=80, seed=4)
  # disjoint fold-in/fold-out: even item columns train, odd evaluate
  # (the evaluator masks fold-in items from the recommendations)
  fold_in = m.multiply(np.arange(80) % 2 == 0).tocsr()
  fold_out = m.multiply(np.arange(80) % 2 == 1).tocsr()
  ds = RecommendationDataset(fold_in)
  model = _model(sparse=True, total_anneal_steps=50)
  assert model.sparse_param_paths() == ('en_embedding', 'de_embedding')
  tr = Recoder(model=model, optimizer_type='adam', loss='logloss', seed=0)
  tr.train(train_dataset=ds, batch_size=20, lr=1e-2, num_epochs=5,
           negative_sampling=True)
  res = tr._evaluate(RecommendationDataset(fold_out, fold_in),
                     num_recommendations=20,
                     metrics=[Recall(k=10)], batch_size=20)
  assert float(np.mean(res[Recall(k=10)])) > 0.15  # random ~ 10/80


def test_multvae_compute_dtype_roundtrips_through_checkpoint(tmp_path):
  """A bfloat16-trained checkpoint must reload with bfloat16 numerics
  (CLAUDE.md invariant; construction arg wins)."""
  m = _matrix(users=20, items=40, seed=5)
  ds = RecommendationDataset(m)
  model = _model(compute_dtype='bfloat16')
  tr = Recoder(model=model, optimizer_type='adam', loss='logloss', seed=0)
  tr.train(train_dataset=ds, batch_size=20, lr=1e-3, num_epochs=1,
           negative_sampling=True)
  saved = tr.save_state(str(tmp_path / 'vae'))

  model2 = MultVAE()
  Recoder(model=model2, optimizer_type='adam',
          loss='logloss').init_from_model_file(saved)
  assert model2.compute_dtype == jnp.bfloat16

  model3 = MultVAE(compute_dtype='float32')  # construction arg wins
  Recoder(model=model3, optimizer_type='adam',
          loss='logloss').init_from_model_file(saved)
  assert model3.compute_dtype == jnp.float32


def test_multvae_bias_params_exempt_from_weight_decay():
  """Every bias param (incl. the mu/logvar/decoder heads) must carry
  zero weight decay, matching the reference's "'bias' in name" rule."""
  from recoder_tpu.optim import make_weight_decay_tree

  model = _model()
  model.init_model(num_items=40, seed=0)
  tree = make_weight_decay_tree(model.params, 0.01)
  for name in ('en_bias', 'de_bias', 'mu_bias', 'logvar_bias',
               'dec_bias'):
    assert float(np.max(np.asarray(tree[name]))) == 0.0, name
  for name in ('en_embedding', 'de_embedding', 'w_mu', 'w_logvar',
               'w_dec'):
    assert float(np.min(np.asarray(tree[name]))) == 0.01, name


@pytest.mark.slow
def test_multvae_fixture_quality():
  """8-epoch MultVAE beats the 30-epoch DynAE reference-pinned metrics
  on the real fixture (floors set with seed-noise margin below the
  measured 0.1440/0.1703)."""
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


@pytest.mark.slow
def test_multvae_full_softmax_paper_protocol():
  """The published Mult-VAE protocol end-to-end (VERDICT r3 #5): the
  paper shape [600, 200] trained with the FULL softmax
  (negative_sampling=False -- the exact multinomial likelihood) vs the
  union-sampled path, both evaluated through
  protocols.evaluate_vae_protocol (ranking metrics + held-out
  multinomial NLL, the paper's model-selection score).

  Pinned relationship, measured 2026-08-19 on the fixture (10 epochs,
  vae_cf anneal cap 0.2 / 2000 steps):
    full softmax: R@20 0.1444 / R@50 0.2431 / NDCG@100 0.1728 / NLL 7.132
    union path:   R@20 0.1377 / R@50 0.2415 / NDCG@100 0.1685 / NLL 7.436
  Full softmax optimizes the true likelihood, so it must win on NLL by
  a clear margin and not lose on ranking; it must also clear the 0.99x
  reference-converged bar (REFERENCE_PINNED in tests/test_model.py)."""
  import pandas as pd

  from recoder_tpu.protocols import evaluate_vae_protocol
  from recoder_tpu.utils import dataframe_to_csr_matrix

  train_df = pd.read_csv('tests/data/train.csv.gz')
  val_df = pd.read_csv('tests/data/val.csv.gz')
  val_df = val_df[val_df.sid.isin(train_df.sid.unique())]
  train_m, imap, umap = dataframe_to_csr_matrix(train_df, 'uid', 'sid',
                                                'watched')
  val_m, _, _ = dataframe_to_csr_matrix(val_df, 'uid', 'sid', 'watched',
                                        item_id_map=imap, user_id_map=umap)
  train_ds = RecommendationDataset(train_m)
  val_ds = RecommendationDataset(val_m, train_m)

  summaries = {}
  for ns in (True, False):
    model = MultVAE(hidden_dim=600, latent_dim=200, dropout_prob=0.5,
                    anneal_cap=0.2, total_anneal_steps=2000)
    tr = Recoder(model=model, optimizer_type='adam', loss='logloss',
                 seed=0)
    tr.train(train_dataset=train_ds, batch_size=500, lr=1e-3,
             num_epochs=10, negative_sampling=ns)
    summaries[ns] = evaluate_vae_protocol(tr, val_ds, batch_size=500)

  fs, ns_ = summaries[False], summaries[True]
  # full softmax trains the exact multinomial likelihood: clear NLL win
  assert fs['HeldoutMultinomialNLL'] < ns_['HeldoutMultinomialNLL'] - 0.1, \
      (fs, ns_)
  # ...without losing ranking quality (seed-noise tolerance)
  assert fs['Recall@20'] > ns_['Recall@20'] - 0.005, (fs, ns_)
  # and it clears the 0.99x reference-converged bar
  assert fs['Recall@20'] > 0.99 * 0.1417, fs
  assert fs['NDCG@100'] > 0.99 * 0.1684, fs
