"""Model tests, mirroring reference tests/test_nn.py (shape/property
checks for the three forward modes) plus functional invariants the
reference can't express: subset-vs-full consistency and weight tying."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization


@pytest.fixture
def autoencoder():
  ae = DynamicAutoencoder([300, 200])
  ae.init_model(num_items=500, seed=0)
  return ae


def test_DynamicAutoencoder_shapes(autoencoder):
  p = autoencoder.params
  assert p['en_embedding'].shape[1] == 300
  assert p['de_embedding'].shape[1] == 300
  assert p['en_embedding'].shape[0] >= 501  # sentinel row exists
  assert p['encode_w_1'].shape == (300, 200)
  assert p['decode_w_1'].shape == (200, 300)
  assert p['de_bias'].shape[0] == p['de_embedding'].shape[0]

  batch_size = 32
  key = jax.random.PRNGKey(1)
  input = jax.random.uniform(key, (batch_size, 5))
  input_items = jnp.array([10, 126, 452, 29, 34])

  out = autoencoder(input, input_items=input_items, target_items=input_items)
  assert out.shape == (batch_size, 5)

  target_items = jnp.array([31, 14, 95, 49, 10, 36, 239])
  out = autoencoder(input, input_items=input_items, target_items=target_items)
  assert out.shape == (batch_size, 7)

  out = autoencoder(input, input_items=input_items)
  assert out.shape == (batch_size, autoencoder.num_items_padded)


def test_subset_scores_match_full_forward(autoencoder):
  """Decoding a subset must produce exactly the matching columns of the
  full-catalog decode (the dynamic-decoder contract, nn.py:74-77)."""
  key = jax.random.PRNGKey(2)
  input = jax.random.uniform(key, (4, 500))
  full = autoencoder(input)  # full in, full out
  target_items = jnp.array([3, 77, 400, 499])
  sub = autoencoder(input, target_items=target_items)
  np.testing.assert_allclose(np.asarray(sub),
                             np.asarray(full[:, target_items]),
                             rtol=5e-5, atol=1e-7)


def test_constrained_ties_weights():
  ae = DynamicAutoencoder([64, 32], is_constrained=True)
  ae.init_model(num_items=100, seed=0)
  assert 'de_embedding' not in ae.params
  assert 'decode_w_1' not in ae.params
  assert 'decode_bias_1' in ae.params

  x = jax.random.uniform(jax.random.PRNGKey(0), (3, 100))
  out = ae(x)
  assert out.shape == (3, ae.num_items_padded)

  # moving the encoder table must move the decoder output (tied)
  p2 = dict(ae.params)
  p2['en_embedding'] = p2['en_embedding'] + 0.1
  out2 = ae.apply(p2, x)
  assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_autoencoder_hidden_single_layer():
  ae = DynamicAutoencoder([200])
  ae.init_model(num_items=300, seed=0)
  assert 'encode_w_1' not in ae.params
  x = jax.random.uniform(jax.random.PRNGKey(0), (2, 300))
  assert ae(x).shape == (2, ae.num_items_padded)


def test_noise_and_dropout_only_when_training():
  ae = DynamicAutoencoder([100], noise_prob=0.5, dropout_prob=0.5)
  ae.init_model(num_items=50, seed=0)
  x = jax.random.uniform(jax.random.PRNGKey(0), (4, 50))
  out_eval1 = ae(x, training=False)
  out_eval2 = ae(x, training=False)
  np.testing.assert_array_equal(np.asarray(out_eval1), np.asarray(out_eval2))
  out_tr1 = ae(x, rng=jax.random.PRNGKey(1), training=True)
  out_tr2 = ae(x, rng=jax.random.PRNGKey(2), training=True)
  assert not np.allclose(np.asarray(out_tr1), np.asarray(out_tr2))


def test_gathered_path_matches_apply():
  """apply_gathered (sparse-optimizer path) == apply (dense path)."""
  ae = DynamicAutoencoder([128, 64])
  ae.init_model(num_items=400, seed=0)
  items = jnp.array([5, 9, 200, 399, 17])
  x = jax.random.uniform(jax.random.PRNGKey(3), (6, 5))

  ref = ae(x, input_items=items, target_items=items)
  entries = ae.sparse_entries(input_items=items, target_items=items)
  gathered = {name: ae.params[path][ids] for name, path, ids in entries}
  got = ae.apply_gathered(ae.params, gathered, x, input_items=items,
                          target_items=items)
  np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-6)

  # constrained + same ids: one shared entry
  aec = DynamicAutoencoder([64], is_constrained=True)
  aec.init_model(num_items=100, seed=0)
  entries = aec.sparse_entries(input_items=items, target_items=items)
  assert len(entries) == 1


def test_matrix_factorization():
  mf = MatrixFactorization(embedding_size=32, activation_type='tanh')
  mf.init_model(num_items=200, num_users=50, seed=0)
  users = jnp.array([0, 3, 49])
  items = jnp.array([10, 20, 30, 199])

  out = mf.apply(mf.params, None, input_users=users, target_items=items)
  assert out.shape == (3, 4)

  full = mf.apply(mf.params, None, input_users=users)
  assert full.shape == (3, mf.num_items_padded)
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(full[:, items]), rtol=1e-5)

  # gathered path parity
  entries = mf.sparse_entries(input_users=users, target_items=items)
  gathered = {name: mf.params[path][ids] for name, path, ids in entries}
  got = mf.apply_gathered(mf.params, gathered, None, input_users=users,
                          target_items=items)
  np.testing.assert_allclose(np.asarray(out), np.asarray(got), rtol=1e-6)


def test_xavier_init_statistics():
  """init matches torch xavier_uniform_ bounds (nn.py:186-187)."""
  ae = DynamicAutoencoder([200])
  ae.init_model(num_items=1000, seed=0)
  w = np.asarray(ae.params['en_embedding'])[:1000]
  limit = np.sqrt(6.0 / (1000 + 200))
  assert np.abs(w).max() <= limit + 1e-6
  assert np.abs(w).max() > limit * 0.98  # actually fills the range
  assert np.abs(np.asarray(ae.params['de_bias'])).max() == 0


def test_sparse_model_pads_feature_axis():
  """sparse=True lane-pads the table feature axis (zeros beyond the
  logical width) so per-step row-scatters keep the default layout and
  donation aliasing; the logical weights are identical to dense init."""
  dense = DynamicAutoencoder([300, 200])
  dense.init_model(num_items=500, seed=0)
  sparse = DynamicAutoencoder([300, 200], sparse=True)
  sparse.init_model(num_items=500, seed=0)
  assert sparse.params['en_embedding'].shape[1] == 384  # pad_features(300)
  np.testing.assert_array_equal(
      np.asarray(sparse.params['en_embedding'])[:, :300],
      np.asarray(dense.params['en_embedding']))
  assert np.all(np.asarray(sparse.params['en_embedding'])[:, 300:] == 0)

  # identical forward outputs (padding is numerically invisible)
  import jax
  x = jax.random.uniform(jax.random.PRNGKey(0), (4, 500))
  items = jnp.arange(500)
  a = dense.apply(dense.params, jnp.pad(x, ((0, 0), (0, dense.num_items_padded - 500))),
                  input_items=None, target_items=items)
  b = sparse.apply(sparse.params, jnp.pad(x, ((0, 0), (0, sparse.num_items_padded - 500))),
                   input_items=None, target_items=items)
  np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                             rtol=5e-5, atol=1e-6)
