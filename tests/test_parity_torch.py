"""Forward-pass numerics parity against a torch composition of the
reference architecture (same weights injected into both), pinning the
compute path beyond the loss/optimizer parity tests: normalize ->
encoder gather matmul -> tanh -> hidden layers -> decoder gather
matmul with per-item bias (reference nn.py:228-362)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization


def torch_dynae_forward(params, x, input_items, target_items,
                        hidden_layers, constrained=False):
  """The reference's forward math, composed from torch primitives."""
  t = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
  d0 = hidden_layers[0]
  # our tables carry zero lane-pad columns (models/base.pad_features);
  # the torch composition works on the logical view
  z = F.normalize(torch.tensor(x), p=2, dim=1)
  en = t['en_embedding'][torch.tensor(input_items)][:, :d0]
  z = F.linear(z, en.t(), t['en_bias'])
  z = torch.tanh(z)
  n = len(hidden_layers)
  for i in range(1, n):
    z = torch.tanh(F.linear(z, t[f'encode_w_{i}'].t(), t[f'encode_bias_{i}']))
  for i in range(1, n):
    if constrained:
      # decoder layer i = transpose of encoder layer (n - i)
      z = F.linear(z, t[f'encode_w_{n - i}'], t[f'decode_bias_{i}'])
    else:
      z = F.linear(z, t[f'decode_w_{i}'].t(), t[f'decode_bias_{i}'])
    z = torch.tanh(z)
  de_table = t['en_embedding'] if constrained else t['de_embedding']
  de = de_table[torch.tensor(target_items)][:, :d0]
  bias = t['de_bias'][torch.tensor(target_items)]
  return F.linear(z, de, bias).numpy()


@pytest.mark.parametrize('hidden_layers,constrained', [
    ([64], False), ([64, 32], False), ([64, 32], True)])
def test_dynae_forward_matches_torch(hidden_layers, constrained):
  rng = np.random.default_rng(0)
  num_items = 300
  ae = DynamicAutoencoder(hidden_layers=hidden_layers,
                          activation_type='tanh',
                          is_constrained=constrained)
  ae.init_model(num_items=num_items, seed=0)

  input_items = rng.choice(num_items, size=40, replace=False)
  target_items = rng.choice(num_items, size=25, replace=False)
  x = rng.random((8, 40)).astype(np.float32)

  ours = np.asarray(ae(jnp.asarray(x),
                       input_items=jnp.asarray(input_items),
                       target_items=jnp.asarray(target_items)))
  theirs = torch_dynae_forward(ae.params, x, input_items, target_items,
                               hidden_layers, constrained)
  np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-6)


def test_mf_forward_matches_torch():
  rng = np.random.default_rng(1)
  mf = MatrixFactorization(embedding_size=32, activation_type='tanh')
  mf.init_model(num_items=200, num_users=50, seed=0)
  users = rng.choice(50, size=6, replace=False)
  items = rng.choice(200, size=17, replace=False)

  ours = np.asarray(mf.apply(mf.params, None,
                             input_users=jnp.asarray(users),
                             target_items=jnp.asarray(items)))

  t = {k: torch.tensor(np.asarray(v)) for k, v in mf.params.items()}
  d = mf.embedding_size
  u = torch.tanh(t['user_embedding'][torch.tensor(users)][:, :d])
  v = t['item_embedding'][torch.tensor(items)][:, :d]
  b = t['bias'][torch.tensor(items)]
  theirs = F.linear(u, v, b).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=1e-6)


def test_normalize_zero_row_matches_torch():
  """F.normalize's eps clamp on all-zero rows (nn.py:235)."""
  from recoder_tpu.models.base import l2_normalize_rows
  x = np.zeros((2, 5), np.float32)
  x[1] = [1, 2, 3, 4, 5]
  ours = np.asarray(l2_normalize_rows(jnp.asarray(x)))
  theirs = F.normalize(torch.tensor(x), p=2, dim=1).numpy()
  np.testing.assert_allclose(ours, theirs, rtol=1e-6)
