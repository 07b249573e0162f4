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
