"""Matrix-factorization model.

Parity with reference recoder/nn.py:283-362: user/item embedding tables
plus a per-item bias; ``scores = act(U[users]) @ V[items].T + b[items]``
with optional dropout on the user factors. The item axis gathers only
the batch's target items (negative sampling), same as the autoencoder's
decoder.
"""

import jax
import jax.numpy as jnp

from recoder_tpu.models.base import (FactorizationModel, activation, dropout,
                                     pad_dim, pad_features, xavier_uniform)
from recoder_tpu.ops.gather_matmul import decode_gather_matmul, take_rows


class MatrixFactorization(FactorizationModel):
  """Latent-factor MF for collaborative filtering.

  Args:
    embedding_size (int): rank of the factorization.
    activation_type (str): activation applied to user embeddings.
    dropout_prob (float): dropout on user embeddings.
    sparse (bool): request sparse row-wise optimizer updates for the
      embedding tables.
    compute_dtype (str, optional): matmul compute dtype.
    params_dtype (str, optional): parameter storage dtype
      ('bfloat16' halves table HBM bytes). Inference-only; see
      DynamicAutoencoder.
  """

  def __init__(self, embedding_size, activation_type='none',
               dropout_prob=0, sparse=False, compute_dtype=None,
               params_dtype=None):
    self.embedding_size = embedding_size
    self.activation_type = activation_type
    self.dropout_prob = dropout_prob
    self.sparse = sparse
    self.params_dtype = (jnp.dtype(params_dtype)
                         if params_dtype is not None else jnp.float32)
    if compute_dtype is None and params_dtype is not None:
      compute_dtype = params_dtype
    self.compute_dtype = (jnp.dtype(compute_dtype)
                          if compute_dtype is not None else None)

    self.num_users = None
    self.num_items = None
    self.num_users_padded = None
    self.num_items_padded = None
    self.params = None

  def init_model(self, num_items=None, num_users=None, seed=0):
    self.num_items = int(num_items)
    self.num_users = int(num_users)
    self.num_items_padded = pad_dim(self.num_items)
    self.num_users_padded = pad_dim(self.num_users)

    key = jax.random.PRNGKey(seed)
    k_user, k_item = jax.random.split(key)
    d = self.embedding_size
    # lane-aligned feature axis on the sparse path only (see
    # models/base.pad_features and autoencoder.init_model)
    dp = pad_features(d) if self.sparse else d

    def feature_pad(table):
      return jnp.pad(table, ((0, 0), (0, dp - d)))

    pd = self.params_dtype
    self.params = {
        'user_embedding': feature_pad(xavier_uniform(
            k_user, (self.num_users_padded, d),
            fan_in=d, fan_out=self.num_users, dtype=pd)),
        'item_embedding': feature_pad(xavier_uniform(
            k_item, (self.num_items_padded, d),
            fan_in=d, fan_out=self.num_items, dtype=pd)),
        'bias': jnp.zeros((self.num_items_padded,), pd),
    }
    return self.params

  def model_params(self):
    p = {
        'embedding_size': self.embedding_size,
        'activation_type': self.activation_type,
        'dropout_prob': self.dropout_prob,
    }
    if self.compute_dtype is not None:
      p['compute_dtype'] = jnp.dtype(self.compute_dtype).name
    return p

  def load_model_params(self, model_params):
    self.embedding_size = model_params['embedding_size']
    self.activation_type = model_params['activation_type']
    self.dropout_prob = model_params['dropout_prob']
    # restore the checkpoint's compute dtype unless the user chose one
    # at construction (see DynamicAutoencoder.load_model_params)
    if self.compute_dtype is None and 'compute_dtype' in model_params:
      self.compute_dtype = jnp.dtype(model_params['compute_dtype'])

  def param_axes(self):
    return {'user_embedding': ('user', 'embed'),
            'item_embedding': ('item', 'embed'),
            'bias': ('item',)}

  def sparse_param_paths(self):
    return ('user_embedding', 'item_embedding') if self.sparse else ()

  def _forward_core(self, params, user_rows, item_operand, item_ids,
                    bias, rng, training, items_sorted_unique=False,
                    compute_dtype=None):
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    # drop the zero pad columns BEFORE the nonlinearity (activation(0)
    # need not be 0, which would leak gradient into the pad columns);
    # decode_gather_matmul re-pads with zeros after
    u = user_rows[:, :self.embedding_size]
    u = activation(u, self.activation_type)
    if training and self.dropout_prob > 0:
      assert rng is not None, 'training with dropout requires rng'
      u = dropout(u, self.dropout_prob, rng)
    out = decode_gather_matmul(u, item_operand, item_ids, bias,
                               compute_dtype=cd,
                               sorted_unique=items_sorted_unique)
    if cd is not None:
      out = out.astype(cd)
    return out

  def apply(self, params, input, input_users=None, input_items=None,
            target_users=None, target_items=None, rng=None, training=False,
            items_sorted_unique=False, compute_dtype=None):
    del input, input_items, target_users  # interactions enter via users/items
    u = take_rows(params['user_embedding'], input_users)
    return self._forward_core(params, u, params['item_embedding'],
                              target_items, params['bias'], rng, training,
                              items_sorted_unique=items_sorted_unique,
                              compute_dtype=compute_dtype)

  # compute dtype is applied inside decode_gather_matmul

  # -- chunked full-catalog inference --------------------------------------

  def encode_coo(self, params, rows, cols, vals, num_rows, input_users=None,
                 compute_dtype=None):
    """Inference user factors ``h [num_rows, d]`` for chunked scoring.

    MF scores depend on user ids only, so the COO interactions are
    unused here (they still drive seen-item masking in the caller)."""
    del rows, cols, vals, num_rows, compute_dtype
    u = take_rows(params['user_embedding'], input_users)
    u = u[:, :self.embedding_size]
    return activation(u, self.activation_type)

  def decode_slice(self, params, h, start, width, compute_dtype=None):
    """Scores ``h @ V[start:start+width].T + b[start:...]`` for a
    contiguous catalog slice (chunked full-catalog top-k)."""
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    rows = jax.lax.dynamic_slice_in_dim(params['item_embedding'],
                                        start, width, 0)
    bias = jax.lax.dynamic_slice_in_dim(params['bias'], start, width, 0)
    return decode_gather_matmul(h, rows, None, bias, compute_dtype=cd)

  # -- sparse (row-gathered) path -----------------------------------------

  def sparse_entries(self, input_users=None, input_items=None,
                     target_users=None, target_items=None):
    return [('user_rows', 'user_embedding', input_users),
            ('item_rows', 'item_embedding', target_items)]

  def apply_gathered(self, params, gathered, input, input_users=None,
                     input_items=None, target_users=None, target_items=None,
                     rng=None, training=False, items_sorted_unique=False):
    del input, input_items, input_users, target_users
    bias = take_rows(params['bias'], target_items, items_sorted_unique)
    return self._forward_core(params, gathered['user_rows'],
                              gathered['item_rows'], None, bias,
                              rng, training)
