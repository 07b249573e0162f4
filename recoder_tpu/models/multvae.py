"""Mult-VAE: variational autoencoder with a multinomial likelihood.

A beyond-parity addition (the reference ships only the two SGD models,
reference nn.py:68,283): Mult-VAE (Liang et al., WWW'18,
arXiv:1802.05814) is the canonical neural model for the vae_cf
strong-generalization protocol that this package's preprocessing
(recoder_tpu/preprocessing.py) and the reference's dataset scripts
implement. Trained with ``Recoder(loss='logloss')``: the trainer's
summed multinomial NLL / valid-users is exactly the protocol's
``neg_ll`` term, and the model contributes the KL term through the
aux-loss hook (``has_aux``; see Recoder._forward_loss).

Architecture (the paper's standard shape): L2-normalized (optionally
dropped-out) input -> gathered encode layer [union -> hidden] -> tanh
-> mu/logvar heads [hidden -> latent] -> reparameterized sample ->
decode layer [latent -> hidden] -> tanh -> gathered output layer
[hidden -> union]. Per-user KL(q(z|x) || N(0, I)) is scaled by the
annealed beta (vae_cf's ``min(anneal_cap, step / total_anneal_steps)``)
and returned as the aux vector.

Like the DynamicAutoencoder, the first/last layers gather only the
batch's item-union rows, so Mult-VAE trains with mini-batch negative
sampling at union cost — the paper's full-softmax training is the
``negative_sampling=False`` / full_decode configuration.
"""

import jax
import jax.numpy as jnp

from recoder_tpu.models.base import (FactorizationModel, activation,
                                     dropout, l2_normalize_rows, pad_dim,
                                     xavier_uniform)
from recoder_tpu.ops.gather_matmul import (decode_gather_matmul,
                                           encode_gather_matmul, take_rows)


class MultVAE(FactorizationModel):
  """Variational autoencoder with multinomial likelihood (Mult-VAE).

  Args:
    hidden_dim (int): width of the encoder/decoder hidden layer.
    latent_dim (int): dimensionality of the latent z.
    activation_type (str): hidden activation ('tanh' in the paper).
    dropout_prob (float): input dropout rate (the paper uses 0.5).
    anneal_cap (float): final KL weight beta (paper sweet spot 0.2).
    total_anneal_steps (int): anneal denominator, vae_cf semantics:
      ``beta = min(anneal_cap, step / total_anneal_steps)``, i.e. the
      cap is reached after ``anneal_cap * total_anneal_steps`` global
      steps (40k at the defaults, matching the paper's code); 0 =
      constant ``anneal_cap``.
    sparse (bool): update the encoder/decoder item tables with
      row-sparse Adam over the batch union (for catalogs where dense
      Adam's full-table moment passes dominate; same trade as
      ``DynamicAutoencoder(sparse=True)``).
    compute_dtype (str, optional): matmul compute dtype.
  """

  #: trainer hook: apply(..., training=True) returns (scores, aux [B])
  #: where aux is the beta-scaled per-user KL (Recoder adds
  #: sum(aux * row_mask) to the reduced data loss)
  has_aux = True

  def __init__(self, hidden_dim=600, latent_dim=200,
               activation_type='tanh', dropout_prob=0.5,
               anneal_cap=0.2, total_anneal_steps=200000,
               sparse=False, compute_dtype=None):
    self.hidden_dim = int(hidden_dim)
    self.latent_dim = int(latent_dim)
    self.activation_type = activation_type
    self.dropout_prob = dropout_prob
    self.anneal_cap = float(anneal_cap)
    self.total_anneal_steps = int(total_anneal_steps)
    self.sparse = bool(sparse)
    self.compute_dtype = (jnp.dtype(compute_dtype)
                          if compute_dtype is not None else None)

    self.num_items = None
    self.num_items_padded = None
    self.params = None

  # -- init / hyperparams ------------------------------------------------

  def init_model(self, num_items=None, num_users=None, seed=0):
    self.num_items = int(num_items)
    self.num_items_padded = pad_dim(self.num_items)
    h, d = self.hidden_dim, self.latent_dim

    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 6))
    params = {
        # gathered encode layer [items -> h]; logical fans for init
        'en_embedding': xavier_uniform(
            next(keys), (self.num_items_padded, h),
            fan_in=h, fan_out=self.num_items),
        'en_bias': jnp.zeros((h,), jnp.float32),
        'w_mu': xavier_uniform(next(keys), (h, d), fan_in=h, fan_out=d),
        'mu_bias': jnp.zeros((d,), jnp.float32),
        'w_logvar': xavier_uniform(next(keys), (h, d),
                                   fan_in=h, fan_out=d),
        'logvar_bias': jnp.zeros((d,), jnp.float32),
        'w_dec': xavier_uniform(next(keys), (d, h), fan_in=d, fan_out=h),
        'dec_bias': jnp.zeros((h,), jnp.float32),
        # gathered output layer [h -> items]
        'de_embedding': xavier_uniform(
            next(keys), (self.num_items_padded, h),
            fan_in=h, fan_out=self.num_items),
        'de_bias': jnp.zeros((self.num_items_padded,), jnp.float32),
    }
    self.params = params
    return params

  def model_params(self):
    p = {
        'hidden_dim': self.hidden_dim,
        'latent_dim': self.latent_dim,
        'activation_type': self.activation_type,
        'dropout_prob': self.dropout_prob,
        'anneal_cap': self.anneal_cap,
        'total_anneal_steps': self.total_anneal_steps,
    }
    if self.compute_dtype is not None:
      p['compute_dtype'] = jnp.dtype(self.compute_dtype).name
    return p

  def load_model_params(self, model_params):
    self.hidden_dim = int(model_params['hidden_dim'])
    self.latent_dim = int(model_params['latent_dim'])
    self.activation_type = model_params['activation_type']
    self.dropout_prob = model_params['dropout_prob']
    self.anneal_cap = float(model_params['anneal_cap'])
    self.total_anneal_steps = int(model_params['total_anneal_steps'])
    # restore the checkpoint's compute dtype unless the user chose one
    # at construction (same rule as DynamicAutoencoder)
    if self.compute_dtype is None and 'compute_dtype' in model_params:
      self.compute_dtype = jnp.dtype(model_params['compute_dtype'])

  def param_axes(self):
    return {'en_embedding': ('item', 'embed'), 'en_bias': ('embed',),
            'w_mu': (None, None), 'mu_bias': (None,),
            'w_logvar': (None, None), 'logvar_bias': (None,),
            'w_dec': (None, None), 'dec_bias': (None,),
            'de_embedding': ('item', 'embed'), 'de_bias': ('item',)}

  # -- forward -----------------------------------------------------------

  def _beta(self, step):
    # vae_cf's schedule: min(cap, step/total) -- the cap is hit at
    # cap * total steps, NOT at total steps
    if self.total_anneal_steps <= 0 or step is None:
      return jnp.float32(self.anneal_cap)
    frac = step.astype(jnp.float32) / self.total_anneal_steps
    return jnp.minimum(jnp.float32(self.anneal_cap), frac)

  def _encode_mu_logvar(self, params, z, cd):
    z = activation(z, self.activation_type)
    if cd is not None:
      z32 = lambda a, w: (a.astype(cd) @ w.astype(cd)).astype(jnp.float32)
    else:
      z32 = lambda a, w: a @ w
    mu = z32(z, params['w_mu']) + params['mu_bias']
    logvar = z32(z, params['w_logvar']) + params['logvar_bias']
    return mu, logvar

  def _decode_hidden(self, params, zlat, cd):
    if cd is not None:
      h = (zlat.astype(cd) @ params['w_dec'].astype(cd)) \
          .astype(jnp.float32) + params['dec_bias']
    else:
      h = zlat @ params['w_dec'] + params['dec_bias']
    return activation(h, self.activation_type)

  def _forward_core(self, params, input, en_operand, en_ids, de_operand,
                    de_ids, de_bias, rng, training,
                    items_sorted_unique=False, compute_dtype=None,
                    step=None):
    """Shared forward; operands may be full tables (+ids) or
    pre-gathered row matrices (ids=None), same split as
    DynamicAutoencoder._forward_core."""
    cd = self.compute_dtype if compute_dtype is None else compute_dtype

    z = l2_normalize_rows(input)
    if training and self.dropout_prob > 0:
      assert rng is not None, 'training with dropout requires rng'
      rng, drop_rng = jax.random.split(rng)
      z = dropout(z, self.dropout_prob, drop_rng)

    z = encode_gather_matmul(z, en_operand, en_ids, params['en_bias'],
                             compute_dtype=cd,
                             sorted_unique=items_sorted_unique)
    mu, logvar = self._encode_mu_logvar(params, z, cd)

    if training:
      assert rng is not None, 'training the VAE requires rng (eps sample)'
      eps = jax.random.normal(rng, mu.shape, jnp.float32)
      zlat = mu + jnp.exp(0.5 * logvar) * eps
    else:
      zlat = mu  # the paper's deterministic eval: z = E[q(z|x)]

    h = self._decode_hidden(params, zlat, cd)
    scores = decode_gather_matmul(h, de_operand, de_ids, de_bias,
                                  compute_dtype=cd,
                                  sorted_unique=items_sorted_unique)
    if cd is not None:
      scores = scores.astype(cd)
    if not training:
      return scores

    kl = -0.5 * jnp.sum(1.0 + logvar - mu * mu - jnp.exp(logvar), axis=1)
    return scores, self._beta(step) * kl

  def apply(self, params, input, input_users=None, input_items=None,
            target_users=None, target_items=None, rng=None, training=False,
            items_sorted_unique=False, compute_dtype=None, step=None):
    del input_users, target_users  # item-based model
    if input_items is None and input.shape[1] < self.num_items_padded:
      input = jnp.pad(input,
                      ((0, 0), (0, self.num_items_padded - input.shape[1])))
    return self._forward_core(params, input,
                              en_operand=params['en_embedding'],
                              en_ids=input_items,
                              de_operand=params['de_embedding'],
                              de_ids=target_items,
                              de_bias=params['de_bias'],
                              rng=rng, training=training,
                              items_sorted_unique=items_sorted_unique,
                              compute_dtype=compute_dtype, step=step)

  # -- sparse (row-gathered) path -----------------------------------------

  def sparse_param_paths(self):
    return ('en_embedding', 'de_embedding') if self.sparse else ()

  def sparse_entries(self, input_users=None, input_items=None,
                     target_users=None, target_items=None):
    """Row-gather plan for the sparse optimizer path (encoder and
    decoder tables are untied, so two independent entries)."""
    return [('en_rows', 'en_embedding', input_items),
            ('de_rows', 'de_embedding', target_items)]

  def apply_gathered(self, params, gathered, input, input_users=None,
                     input_items=None, target_users=None, target_items=None,
                     rng=None, training=False, items_sorted_unique=False,
                     step=None):
    """Forward where embedding-table rows arrive pre-gathered (the
    differentiable leaves of the sparse path)."""
    del input_users, target_users, input_items
    de_bias = take_rows(params['de_bias'], target_items,
                        items_sorted_unique)
    return self._forward_core(params, input,
                              en_operand=gathered['en_rows'], en_ids=None,
                              de_operand=gathered['de_rows'], de_ids=None,
                              de_bias=de_bias, rng=rng, training=training,
                              step=step)

  # -- chunked full-catalog inference --------------------------------------

  def encode_coo(self, params, rows, cols, vals, num_rows, input_users=None,
                 compute_dtype=None):
    """Inference hidden state (decoder input) from COO interactions,
    never densifying the catalog (same contract as
    DynamicAutoencoder.encode_coo)."""
    del input_users
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    vals = vals.astype(jnp.float32)
    sq = jax.ops.segment_sum(vals * vals, rows, num_segments=num_rows + 1)
    norm = jnp.maximum(jnp.sqrt(sq), 1e-12)
    zv = vals / norm[rows]
    en_rows = take_rows(params['en_embedding'], cols)
    if cd is not None:
      en_rows = en_rows.astype(cd)
      zv = zv.astype(cd)
    z = jax.ops.segment_sum((en_rows * zv[:, None]).astype(jnp.float32),
                            rows, num_segments=num_rows + 1)[:num_rows]
    z = z + params['en_bias']
    mu, _ = self._encode_mu_logvar(params, z, cd)
    return self._decode_hidden(params, mu, cd)

  def decode_slice(self, params, h, start, width, compute_dtype=None):
    """Scores for a contiguous catalog slice given encode_coo's state."""
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    rows = jax.lax.dynamic_slice_in_dim(params['de_embedding'], start,
                                        width, 0)
    bias = jax.lax.dynamic_slice_in_dim(params['de_bias'], start, width, 0)
    return decode_gather_matmul(h, rows, None, bias, compute_dtype=cd)
