"""Optimizer parity vs torch.optim (the reference's optimizers,
model.py:133-156): identical trajectories on a shared random problem,
including SparseAdam vs the row-sparse Adam scatter update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from recoder_tpu.optim import Optimizer, SparseRowAdam, make_weight_decay_tree


def _problem(seed=0):
  rng = np.random.default_rng(seed)
  w = rng.normal(size=(6, 4)).astype(np.float32)
  bias = rng.normal(size=(4,)).astype(np.float32)
  grads = [(rng.normal(size=(6, 4)).astype(np.float32),
            rng.normal(size=(4,)).astype(np.float32)) for _ in range(5)]
  return w, bias, grads


def _torch_run(opt_name, w, bias, grads, lr, wd, **kw):
  wt = torch.tensor(w, requires_grad=True)
  bt = torch.tensor(bias, requires_grad=True)
  groups = [{'params': [wt], 'weight_decay': wd},
            {'params': [bt], 'weight_decay': 0.0}]
  if opt_name == 'sgd':
    opt = torch.optim.SGD(groups, lr=lr, momentum=0.9)
  elif opt_name == 'adam':
    opt = torch.optim.Adam(groups, lr=lr)
  elif opt_name == 'adagrad':
    opt = torch.optim.Adagrad(groups, lr=lr)
  elif opt_name == 'rmsprop':
    opt = torch.optim.RMSprop(groups, lr=lr, momentum=0.9)
  for gw, gb in grads:
    opt.zero_grad()
    wt.grad = torch.tensor(gw)
    bt.grad = torch.tensor(gb)
    opt.step()
  return wt.detach().numpy(), bt.detach().numpy()


@pytest.mark.parametrize('opt_name', ['sgd', 'adam', 'adagrad', 'rmsprop'])
def test_dense_optimizers_match_torch(opt_name):
  w, bias, grads = _problem()
  lr, wd = 0.05, 0.01

  params = {'weight': jnp.asarray(w), 'de_bias': jnp.asarray(bias)}
  wd_tree = make_weight_decay_tree(params, wd)
  assert wd_tree['de_bias'] == 0.0 and wd_tree['weight'] == wd

  opt = Optimizer(opt_name, weight_decay=wd_tree)
  state = opt.init(params)
  for gw, gb in grads:
    g = {'weight': jnp.asarray(gw), 'de_bias': jnp.asarray(gb)}
    params, state = opt.update(g, state, params, jnp.float32(lr))

  ref_w, ref_b = _torch_run(opt_name, w, bias, grads, lr, wd)
  np.testing.assert_allclose(np.asarray(params['weight']), ref_w,
                             rtol=2e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(params['de_bias']), ref_b,
                             rtol=2e-5, atol=1e-6)


def test_sparse_row_adam_matches_torch_sparseadam():
  rng = np.random.default_rng(1)
  N, d = 20, 8
  table = rng.normal(size=(N, d)).astype(np.float32)
  lr = 0.01
  steps = [(np.sort(rng.choice(N, size=5, replace=False)),
            rng.normal(size=(5, d)).astype(np.float32)) for _ in range(6)]

  # torch
  wt = torch.tensor(table, requires_grad=True)
  opt = torch.optim.SparseAdam([wt], lr=lr)
  for ids, g in steps:
    opt.zero_grad()
    i = torch.tensor(ids, dtype=torch.long).unsqueeze(0)
    wt.grad = torch.sparse_coo_tensor(i, torch.tensor(g), wt.shape)
    opt.step()

  # ours
  sra = SparseRowAdam()
  t = jnp.asarray(table)
  state = sra.init(t)
  for ids, g in steps:
    t, state = sra.update_rows(t, state, jnp.asarray(ids), jnp.asarray(g),
                               jnp.float32(lr))

  np.testing.assert_allclose(np.asarray(t), wt.detach().numpy(),
                             rtol=2e-5, atol=1e-6)


def test_sparse_row_adam_untouched_rows_stay_put():
  rng = np.random.default_rng(2)
  table = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
  sra = SparseRowAdam()
  state = sra.init(table)
  ids = jnp.asarray([1, 3])
  g = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
  new_table, _ = sra.update_rows(table, state, ids, g, jnp.float32(0.1))
  mask = np.ones(10, bool)
  mask[[1, 3]] = False
  np.testing.assert_array_equal(np.asarray(new_table)[mask],
                                np.asarray(table)[mask])
  assert not np.allclose(np.asarray(new_table)[[1, 3]],
                         np.asarray(table)[[1, 3]])


def test_multistep_lr_schedule():
  from recoder_tpu.model import _multistep_lr
  # reference stepping: during epoch e the decay counts milestones <= e-1
  lrs = [_multistep_lr(1.0, [60, 80], e) for e in [1, 59, 60, 61, 80, 81, 100]]
  assert lrs == [1.0, 1.0, 1.0, 0.1, 0.1,
                 pytest.approx(0.01), pytest.approx(0.01)]


def test_weight_decay_tree_exempts_all_bias_params():
  """ADVICE r1: multi-layer DynAE hidden biases must get zero decay.

  Reference exempts every torch param whose name contains 'bias'
  (reference model.py:121-124); our hidden-layer biases are named
  encode_bias_{i}/decode_bias_{i} so the default predicate catches them.
  """
  from recoder_tpu.models.autoencoder import DynamicAutoencoder
  ae = DynamicAutoencoder(hidden_layers=[32, 16])
  ae.init_model(num_items=50, num_users=10)
  wd_tree = make_weight_decay_tree(ae.params, 2e-5)
  flat = jax.tree_util.tree_flatten_with_path(wd_tree)[0]
  for path, wd in flat:
    name = '/'.join(str(getattr(k, 'key', k)) for k in path)
    if 'bias' in name:
      assert wd == 0.0, f'{name} should be decay-exempt'
    else:
      assert wd == 2e-5, f'{name} should be decayed'
  names = ['/'.join(str(getattr(k, 'key', k)) for k in path)
           for path, _ in flat]
  assert any('encode_bias_' in n for n in names)
  assert any('decode_bias_' in n for n in names)


def test_weight_decay_tree_bias_free_paths():
  """Explicitly named paths are exempt from decay (the parameter was
  previously accepted and silently ignored)."""
  import jax.numpy as jnp

  from recoder_tpu.optim import make_weight_decay_tree
  params = {'w': jnp.zeros((2, 2)), 'scale': jnp.zeros((2,)),
            'de_bias': jnp.zeros((2,))}
  tree = make_weight_decay_tree(params, 1e-2,
                                bias_free_paths=['scale'])
  assert tree['w'] == 1e-2
  assert tree['scale'] == 0.0
  assert tree['de_bias'] == 0.0


@pytest.mark.parametrize('overlap', ['none', 'partial', 'full'])
def test_fold_dual_union_matches_dense_coalesced_step(overlap):
  """fold_dual_union + one update_rows call must equal a dense
  scatter-add of BOTH grad sets followed by ONE Adam step over the
  touched rows -- exactly torch's coalesced sparse grad of a tied
  parameter used twice. Covers sentinel tail padding (duplicate ids
  with zero grads) and every overlap regime."""
  from recoder_tpu.optim import fold_dual_union

  rng = np.random.default_rng(hash(overlap) % 2**32)
  N, d, sent = 12, 4, 9  # logical rows 0..8, sentinel 9, spare N-1
  table0 = rng.normal(size=(N, d)).astype(np.float32)
  m0 = rng.normal(size=(N, d)).astype(np.float32) * 0.1
  v0 = np.abs(rng.normal(size=(N, d))).astype(np.float32) * 0.1
  adam = SparseRowAdam()
  state = {'step': jnp.asarray(3, jnp.int32),
           'm': jnp.asarray(m0), 'v': jnp.asarray(v0)}

  reals2 = {'none': [5, 7], 'partial': [2, 5], 'full': [1, 2]}[overlap]
  ids1 = np.array([1, 2, 4, sent, sent], np.int32)   # sorted + tail pads
  ids2 = np.array(sorted(reals2) + [sent], np.int32)
  g1 = rng.normal(size=(len(ids1), d)).astype(np.float32)
  g2 = rng.normal(size=(len(ids2), d)).astype(np.float32)
  g1[ids1 == sent] = 0.0  # padding slots carry exactly-zero grads
  g2[ids2 == sent] = 0.0

  ids_cat, grads_cat = fold_dual_union(
      jnp.asarray(ids1), jnp.asarray(g1), jnp.asarray(ids2),
      jnp.asarray(g2), spare=N - 1)
  new_table, new_state = adam.update_rows(jnp.asarray(table0), state,
                                          ids_cat, grads_cat, lr=0.01)

  # dense reference: accumulate both grad sets, one Adam step on the
  # touched rows (incl. zero-grad sentinel/spare slots: moments decay)
  G = np.zeros((N, d), np.float32)
  np.add.at(G, ids1, g1)
  np.add.at(G, ids2, g2)
  touched = sorted(set(ids1.tolist()) | set(ids2.tolist()) | {N - 1})
  b1, b2, eps, lr, step = 0.9, 0.999, 1e-8, 0.01, 4
  exp_t, exp_m, exp_v = table0.copy(), m0.copy(), v0.copy()
  for r in touched:
    exp_m[r] = b1 * m0[r] + (1 - b1) * G[r]
    exp_v[r] = b2 * v0[r] + (1 - b2) * G[r] * G[r]
    ss = lr * np.sqrt(1 - b2 ** step) / (1 - b1 ** step)
    exp_t[r] = table0[r] - ss * exp_m[r] / (np.sqrt(exp_v[r]) + eps)

  assert int(new_state['step']) == 4  # ONE step, not two
  np.testing.assert_allclose(np.asarray(new_table), exp_t,
                             rtol=2e-6, atol=2e-7)
  np.testing.assert_allclose(np.asarray(new_state['m']), exp_m,
                             rtol=2e-6, atol=2e-7)
  np.testing.assert_allclose(np.asarray(new_state['v']), exp_v,
                             rtol=2e-6, atol=2e-7)


# ---------------------------------------------------------------------
# bf16 optimizer state (state_dtype='bfloat16'): storage rounds, math
# stays f32. The end-to-end quality gate is the opt_state_dtype row in
# tests/test_model.py; these pin the mechanical contract.
# ---------------------------------------------------------------------


def test_bf16_state_allocation_and_first_step_exact():
  """From zero moments the f32 update math is unaffected by the state
  STORAGE dtype, so step-1 params must be bit-identical to the f32
  path; the stored moments are the bf16 rounding of the f32 ones."""
  w, bias, grads = _problem(seed=3)
  params = {'weight': jnp.asarray(w), 'de_bias': jnp.asarray(bias)}
  g = {'weight': jnp.asarray(grads[0][0]), 'de_bias': jnp.asarray(grads[0][1])}

  opt32 = Optimizer('adam')
  opt16 = Optimizer('adam', state_dtype='bfloat16')
  s16 = opt16.init(params)
  assert s16['m']['weight'].dtype == jnp.bfloat16
  assert s16['v']['de_bias'].dtype == jnp.bfloat16
  assert s16['step'].dtype == jnp.int32

  p32, st32 = opt32.update(g, opt32.init(params), params, jnp.float32(0.05))
  p16, st16 = opt16.update(g, s16, params, jnp.float32(0.05))
  for k in params:
    np.testing.assert_array_equal(np.asarray(p32[k]), np.asarray(p16[k]))
    np.testing.assert_array_equal(
        np.asarray(st32['m'][k]).astype(jnp.bfloat16),
        np.asarray(st16['m'][k]))


def test_bf16_state_multistep_tracks_f32():
  """Over several steps the bf16-state trajectory stays within bf16
  rounding of the f32 one on a smooth problem (no divergence blowup)."""
  w, bias, grads = _problem(seed=4)
  lr = jnp.float32(0.05)
  runs = {}
  for sd in (None, 'bfloat16'):
    params = {'weight': jnp.asarray(w), 'de_bias': jnp.asarray(bias)}
    opt = Optimizer('adam', state_dtype=sd)
    state = opt.init(params)
    for gw, gb in grads:
      g = {'weight': jnp.asarray(gw), 'de_bias': jnp.asarray(gb)}
      params, state = opt.update(g, state, params, lr)
    runs[sd] = params
  for k in runs[None]:
    np.testing.assert_allclose(np.asarray(runs[None][k]),
                               np.asarray(runs['bfloat16'][k]),
                               rtol=0, atol=5e-3)


def test_sparse_row_adam_bf16_state():
  rng = np.random.default_rng(5)
  N, d = 16, 4
  table = jnp.asarray(rng.normal(size=(N, d)).astype(np.float32))
  sra16 = SparseRowAdam(state_dtype='bfloat16')
  sra32 = SparseRowAdam()
  st16, st32 = sra16.init(table), sra32.init(table)
  assert st16['m'].dtype == jnp.bfloat16 and st16['v'].dtype == jnp.bfloat16
  t16, t32 = table, table
  for _ in range(4):
    ids = jnp.asarray(np.sort(rng.choice(N, size=5, replace=False)))
    g = jnp.asarray(rng.normal(size=(5, d)).astype(np.float32))
    t16, st16 = sra16.update_rows(t16, st16, ids, g, jnp.float32(0.05))
    t32, st32 = sra32.update_rows(t32, st32, ids, g, jnp.float32(0.05))
  assert st16['m'].dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(t16), np.asarray(t32),
                             rtol=0, atol=5e-3)


def test_bf16_params_dense_update_tracks_f32():
  """bf16 parameter STORAGE (r4): the dense optimizer anchors math at
  f32 and rounds params back per step; a short bf16-params trajectory
  must track the f32 one within bf16 rounding and preserve dtypes."""
  rng = np.random.default_rng(7)
  w = rng.normal(scale=0.1, size=(8, 6)).astype(np.float32)
  bias = rng.normal(scale=0.1, size=(6,)).astype(np.float32)
  grads = [(rng.normal(scale=0.01, size=w.shape).astype(np.float32),
            rng.normal(scale=0.01, size=bias.shape).astype(np.float32))
           for _ in range(6)]
  lr = jnp.float32(0.01)

  runs = {}
  for pd in (jnp.float32, jnp.bfloat16):
    params = {'weight': jnp.asarray(w, pd), 'de_bias': jnp.asarray(bias, pd)}
    opt = Optimizer('adam', weight_decay=2e-5)
    state = opt.init(params)
    for gw, gb in grads:
      # autodiff yields grads in the params' dtype
      g = {'weight': jnp.asarray(gw, pd), 'de_bias': jnp.asarray(gb, pd)}
      params, state = opt.update(g, state, params, lr)
      assert params['weight'].dtype == pd
      # state_dtype=None = f32 moments (the documented default), even
      # when the params store bf16
      assert state['m']['weight'].dtype == jnp.float32
    runs[pd] = params
  for k in runs[jnp.float32]:
    np.testing.assert_allclose(
        np.asarray(runs[jnp.float32][k]),
        np.asarray(runs[jnp.bfloat16][k], dtype=np.float32),
        rtol=0, atol=5e-3)


def test_sparse_row_adam_bf16_table():
  """Row-sparse Adam over a bf16-stored table: f32 math, bf16 storage
  round-trip, untouched rows stay bit-identical."""
  rng = np.random.default_rng(11)
  N, d = 16, 4
  t32 = jnp.asarray(rng.normal(scale=0.1, size=(N, d)).astype(np.float32))
  t16 = t32.astype(jnp.bfloat16)
  t16_init = np.asarray(t16, dtype=np.float32)
  sra32, sra16 = SparseRowAdam(), SparseRowAdam(state_dtype='bfloat16')
  st32, st16 = sra32.init(t32), sra16.init(t16)
  touched = set()
  for _ in range(4):
    ids_np = np.sort(rng.choice(N, size=5, replace=False))
    touched.update(ids_np.tolist())
    ids = jnp.asarray(ids_np)
    g = rng.normal(scale=0.01, size=(5, d)).astype(np.float32)
    t32, st32 = sra32.update_rows(t32, st32, ids, jnp.asarray(g),
                                  jnp.float32(0.05))
    t16, st16 = sra16.update_rows(t16, st16, ids,
                                  jnp.asarray(g, jnp.bfloat16),
                                  jnp.float32(0.05))
  assert t16.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(t32),
                             np.asarray(t16, dtype=np.float32),
                             rtol=0, atol=5e-3)
  untouched = sorted(set(range(N)) - touched)
  if untouched:
    # untouched rows must be bit-identical to their initial bf16 value
    np.testing.assert_array_equal(
        np.asarray(t16[np.array(untouched)], dtype=np.float32),
        t16_init[np.array(untouched)])


@pytest.mark.parametrize('kind', ['sgd', 'adagrad', 'rmsprop'])
def test_bf16_state_refused_for_ungated_kinds(kind):
  """Only adam's bf16 state storage passed the 30-epoch quality gate;
  the other kinds must refuse rather than silently run ungated
  numerics (adagrad's monotone 'sum' accumulator would freeze the
  effective LR once increments drop below the bf16 quantum —
  ADVICE r4). Explicit f32 stays legal everywhere."""
  with pytest.raises(ValueError, match='quality-gated'):
    Optimizer(kind, state_dtype='bfloat16')
  Optimizer(kind, state_dtype='float32')  # no-op storage: fine
  Optimizer('adam', state_dtype='bfloat16')  # the gated kind
