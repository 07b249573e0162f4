"""Dynamic (item-union) autoencoder.

Parity with reference recoder/nn.py:68-280 (DynamicAutoencoder +
LinearEmbedding): an autoencoder whose first and last layers gather
only the mini-batch's item rows from the embedding tables, so encode
and decode cost scale with the batch item-union instead of the catalog.

Compute-path mapping (reference -> here):
  F.normalize(input, 2, 1)        nn.py:235  -> l2_normalize_rows
  noise dropout                   nn.py:236  -> dropout(rate=noise_prob)
  encode LinearEmbedding          nn.py:239  -> z @ E_en[items] + b_en
  hidden encode/decode Linears    nn.py:242-249
  bottleneck dropout              nn.py:245
  decode LinearEmbedding          nn.py:251  -> h @ E_de[items].T + b_de[items]
  weight tying (is_constrained)   nn.py:224-232 -> decode reuses encode arrays

The gather+matmul pairs route through recoder_tpu.ops.gather_matmul,
which lowers to XLA's native gather + dot (a fused Pallas variant was
prototyped, measured slower than XLA's fusion on v5e, and retired to
recoder_tpu/experiments/ with the numbers -- see the
ops/gather_matmul.py module docstring).
"""

import jax
import jax.numpy as jnp

from recoder_tpu.models.base import (FactorizationModel, activation, dropout,
                                     l2_normalize_rows, pad_dim,
                                     pad_features, xavier_uniform)
from recoder_tpu.ops.gather_matmul import (encode_gather_matmul,
                                           decode_gather_matmul, take_rows)


class DynamicAutoencoder(FactorizationModel):
  """Autoencoder over variable item subsets (negative sampling friendly).

  Args:
    hidden_layers (list): encoder layer sizes; the first entry is the
      embedding dim, later entries are hidden encoder Linear widths.
      The decoder mirrors them.
    activation_type (str): activation name ('tanh', 'relu', ..., 'none').
    is_constrained (bool): tie decoder weights to encoder transposes.
    dropout_prob (float): bottleneck dropout.
    noise_prob (float): input (denoising) dropout.
    sparse (bool): request sparse row-wise optimizer updates for the
      embedding tables (semantics of torch SparseAdam; see
      recoder_tpu.optim).
    compute_dtype (str, optional): matmul compute dtype ('bfloat16' for
      MXU speed; params stay float32, accumulation is float32). None
      keeps float32 compute end to end.
    params_dtype (str, optional): storage dtype for the parameters
      ('bfloat16' halves the table HBM bytes that bound large-catalog
      inference, and the resident param+grad+update footprint during
      training). Serving: construct with it and load a float32
      checkpoint via ``init_from_model_file`` (arrays are cast on
      load). Training with bf16 params is quality-gated (r4): the
      optimizer's math stays f32 and rounds storage per step
      (optim.Optimizer.update); a 30-epoch gate row pins
      reference-level quality (tests/test_model.py). NOTE it is a
      memory lever, not a speed lever -- on the small-table headline
      config it measured slightly SLOWER than f32 params and is not
      the bench default (docs/benchmarks.md r4). Checkpoints store
      params upcast to f32 (exact); the construction arg restores the
      storage dtype on reload. Defaults ``compute_dtype`` to the same
      dtype so gathers/matmuls don't upcast the tables back to f32.
  """

  def __init__(self, hidden_layers=None, activation_type='tanh',
               is_constrained=False, dropout_prob=0.0,
               noise_prob=0.0, sparse=False, compute_dtype=None,
               params_dtype=None):
    self.hidden_layers = hidden_layers
    self.activation_type = activation_type
    self.is_constrained = is_constrained
    self.dropout_prob = dropout_prob
    self.noise_prob = noise_prob
    self.sparse = sparse
    self.params_dtype = (jnp.dtype(params_dtype)
                         if params_dtype is not None else jnp.float32)
    if compute_dtype is None and params_dtype is not None:
      compute_dtype = params_dtype
    self.compute_dtype = (jnp.dtype(compute_dtype)
                          if compute_dtype is not None else None)

    self.num_items = None
    self.num_items_padded = None
    self.params = None

  # -- init / hyperparams ------------------------------------------------

  def init_model(self, num_items=None, num_users=None, seed=0):
    assert self.hidden_layers, 'hidden_layers must be a non-empty list'
    self.num_items = int(num_items)
    self.num_items_padded = pad_dim(self.num_items)
    d0 = self.hidden_layers[0]

    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, 4 + 4 * len(self.hidden_layers)))

    # lane-align the feature axis ONLY on the sparse path: the per-step
    # row-scatters it runs hit XLA's transposed-layout copies on
    # lane-ragged tables (see pad_features). The dense path never
    # scatters tables, and padding costs ~17% step time at d=200.
    d0p = pad_features(d0) if self.sparse else d0

    def feature_pad(table):
      return jnp.pad(table, ((0, 0), (0, d0p - d0)))

    pd = self.params_dtype
    params = {}
    # encoder embedding table [num_items_padded, d0 -> d0p]; logical
    # fans + logical columns for init so trajectories match unpadded
    params['en_embedding'] = feature_pad(xavier_uniform(
        next(keys), (self.num_items_padded, d0),
        fan_in=d0, fan_out=self.num_items, dtype=pd))
    params['en_bias'] = jnp.zeros((d0,), pd)

    # hidden encoder linears: sizes hidden_layers[i-1] -> hidden_layers[i]
    for i, width in enumerate(self.hidden_layers[1:], 1):
      prev = self.hidden_layers[i - 1]
      params[f'encode_w_{i}'] = xavier_uniform(
          next(keys), (prev, width), fan_in=prev, fan_out=width, dtype=pd)
      params[f'encode_bias_{i}'] = jnp.zeros((width,), pd)

    # hidden decoder linears mirror the encoder (reversed sizes); when
    # constrained only biases are parameters (weights = encoder.T)
    rev = list(reversed(self.hidden_layers))
    for i, width in enumerate(rev[1:], 1):
      prev = rev[i - 1]
      if not self.is_constrained:
        params[f'decode_w_{i}'] = xavier_uniform(
            next(keys), (prev, width), fan_in=prev, fan_out=width, dtype=pd)
      params[f'decode_bias_{i}'] = jnp.zeros((width,), pd)

    if not self.is_constrained:
      params['de_embedding'] = feature_pad(xavier_uniform(
          next(keys), (self.num_items_padded, d0),
          fan_in=d0, fan_out=self.num_items, dtype=pd))
    params['de_bias'] = jnp.zeros((self.num_items_padded,), pd)

    self.params = params
    return params

  def model_params(self):
    # the 5 reference keys (reference autoencoder.py:81-88) plus the
    # compute dtype, so a checkpoint reloads with the numerics it was
    # trained/evaluated with
    p = {
        'hidden_layers': self.hidden_layers,
        'activation_type': self.activation_type,
        'is_constrained': self.is_constrained,
        'dropout_prob': self.dropout_prob,
        'noise_prob': self.noise_prob,
    }
    if self.compute_dtype is not None:
      p['compute_dtype'] = jnp.dtype(self.compute_dtype).name
    return p

  def load_model_params(self, model_params):
    self.hidden_layers = model_params['hidden_layers']
    self.activation_type = model_params['activation_type']
    self.is_constrained = model_params['is_constrained']
    self.dropout_prob = model_params['dropout_prob']
    self.noise_prob = model_params['noise_prob']
    # restore the checkpoint's compute dtype unless the user chose one
    # at construction (params_dtype inference configs set their own);
    # absent key = older checkpoint or f32 run
    if self.compute_dtype is None and 'compute_dtype' in model_params:
      self.compute_dtype = jnp.dtype(model_params['compute_dtype'])

  def param_axes(self):
    axes = {'en_embedding': ('item', 'embed'), 'en_bias': ('embed',),
            'de_bias': ('item',)}
    if not self.is_constrained:
      axes['de_embedding'] = ('item', 'embed')
    for i in range(1, len(self.hidden_layers)):
      axes[f'encode_w_{i}'] = (None, None)
      axes[f'encode_bias_{i}'] = (None,)
      if not self.is_constrained:
        axes[f'decode_w_{i}'] = (None, None)
      axes[f'decode_bias_{i}'] = (None,)
    return axes

  def sparse_param_paths(self):
    if not self.sparse:
      return ()
    paths = ['en_embedding']
    if not self.is_constrained:
      paths.append('de_embedding')
    return tuple(paths)

  # -- forward -----------------------------------------------------------

  def _hidden_stack(self, params, z, cd, training=False, drop_rng=None):
    """Post-encode activation through the hidden encoder/decoder
    Linears, returning the bottleneck output ``h [B, d0]`` that feeds
    the final decode. ``z`` is the encode-gather output (pre-activation
    + bias already applied)."""
    z = activation(z, self.activation_type)

    for i in range(1, len(self.hidden_layers)):
      w = params[f'encode_w_{i}']
      if cd is not None:
        z = (z.astype(cd) @ w.astype(cd)).astype(jnp.float32)
        z = z + params[f'encode_bias_{i}']
      else:
        z = z @ w + params[f'encode_bias_{i}']
      z = activation(z, self.activation_type)

    if training and self.dropout_prob > 0:
      z = dropout(z, self.dropout_prob, drop_rng)

    n_dec = len(self.hidden_layers) - 1
    for i in range(1, n_dec + 1):
      if self.is_constrained:
        # decoder layer i mirrors encoder layer (n_dec - i + 1), transposed
        w = params[f'encode_w_{n_dec - i + 1}'].T
      else:
        w = params[f'decode_w_{i}']
      if cd is not None:
        z = (z.astype(cd) @ w.astype(cd)).astype(jnp.float32)
        z = z + params[f'decode_bias_{i}']
      else:
        z = z @ w + params[f'decode_bias_{i}']
      z = activation(z, self.activation_type)
    return z

  def _forward_core(self, params, input, en_operand, en_ids,
                    de_operand, de_ids, de_bias, rng, training,
                    items_sorted_unique=False, compute_dtype=None):
    """Shared forward; operands may be full tables (+ids) or
    pre-gathered row matrices (ids=None)."""
    noise_rng = drop_rng = None
    if training and (self.noise_prob > 0 or self.dropout_prob > 0):
      assert rng is not None, 'training with dropout requires rng'
      noise_rng, drop_rng = jax.random.split(rng)

    z = l2_normalize_rows(input)
    if training and self.noise_prob > 0:
      z = dropout(z, self.noise_prob, noise_rng)

    cd = self.compute_dtype if compute_dtype is None else compute_dtype

    # encode: z[B, U] @ E_en[items][U, d0] + b_en
    z = encode_gather_matmul(z, en_operand, en_ids, params['en_bias'],
                             compute_dtype=cd,
                             sorted_unique=items_sorted_unique)
    z = self._hidden_stack(params, z, cd, training=training,
                           drop_rng=drop_rng)

    # decode: h[B, d0] @ E_de[items].T + b_de[items]
    z = decode_gather_matmul(z, de_operand, de_ids, de_bias,
                             compute_dtype=cd,
                             sorted_unique=items_sorted_unique)
    if cd is not None:
      # scores travel in the compute dtype; losses re-accumulate in f32
      z = z.astype(cd)
    return z

  def apply(self, params, input, input_users=None, input_items=None,
            target_users=None, target_items=None, rng=None, training=False,
            items_sorted_unique=False, compute_dtype=None):
    del input_users, target_users  # item-based model
    if input_items is None and input.shape[1] < self.num_items_padded:
      # full-catalog input given at logical width: pad to the table
      input = jnp.pad(input,
                      ((0, 0), (0, self.num_items_padded - input.shape[1])))
    de_table = (params['en_embedding'] if self.is_constrained
                else params['de_embedding'])
    return self._forward_core(params, input,
                              en_operand=params['en_embedding'],
                              en_ids=input_items,
                              de_operand=de_table, de_ids=target_items,
                              de_bias=params['de_bias'],
                              rng=rng, training=training,
                              items_sorted_unique=items_sorted_unique,
                              compute_dtype=compute_dtype)

  # -- chunked full-catalog inference --------------------------------------

  def encode_coo(self, params, rows, cols, vals, num_rows, input_users=None,
                 compute_dtype=None):
    """Inference bottleneck ``h [num_rows, d0]`` straight from COO
    interactions, never materializing the ``[B, num_items]`` dense slab
    (the memory wall for multi-million-item catalogs; the reference
    densifies the full catalog per eval batch, model.py:508-510).

    Equivalent to ``l2-normalize -> encode -> hidden stack`` of the
    dense path: the row L2 norm is a segment-sum of squares over the
    COO values, and the encode matmul becomes
    ``segment_sum(vals_norm * E_en[cols])`` -- the zero columns a dense
    row would contribute are exactly zero in both.

    Padded COO slots carry row index ``num_rows`` (the batch sentinel)
    and are dropped by the segment sums.
    """
    del input_users  # item-based model
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    vals = vals.astype(jnp.float32)
    sq = jax.ops.segment_sum(vals * vals, rows, num_segments=num_rows + 1)
    norm = jnp.maximum(jnp.sqrt(sq), 1e-12)  # matches l2_normalize_rows
    zv = vals / norm[rows]
    en_rows = take_rows(params['en_embedding'], cols)
    if cd is not None:
      en_rows = en_rows.astype(cd)
      zv = zv.astype(cd)
    contrib = en_rows * zv[:, None]
    z = jax.ops.segment_sum(contrib.astype(jnp.float32), rows,
                            num_segments=num_rows + 1)[:num_rows]
    d0 = params['en_bias'].shape[0]
    z = z[:, :d0] + params['en_bias']
    return self._hidden_stack(params, z, cd)

  def decode_slice(self, params, h, start, width, compute_dtype=None):
    """Scores ``h @ E_de[start:start+width].T + b_de[start:...]`` for a
    contiguous catalog slice (chunked full-catalog top-k)."""
    cd = self.compute_dtype if compute_dtype is None else compute_dtype
    table = (params['en_embedding'] if self.is_constrained
             else params['de_embedding'])
    rows = jax.lax.dynamic_slice_in_dim(table, start, width, 0)
    bias = jax.lax.dynamic_slice_in_dim(params['de_bias'], start, width, 0)
    return decode_gather_matmul(h, rows, None, bias, compute_dtype=cd)

  # -- sparse (row-gathered) path -----------------------------------------

  def sparse_entries(self, input_users=None, input_items=None,
                     target_users=None, target_items=None):
    """Row-gather plan for the sparse optimizer path.

    Returns a list of ``(name, table_path, ids)``. When the decoder is
    tied to the encoder and decodes the same item union, the single
    'en_rows' entry serves both uses so gradients accumulate into one
    row-sparse update (matching torch's coalesced sparse grad).
    """
    entries = [('en_rows', 'en_embedding', input_items)]
    de_table = 'en_embedding' if self.is_constrained else 'de_embedding'
    shared = (de_table == 'en_embedding') and (target_items is input_items)
    if not shared:
      entries.append(('de_rows', de_table, target_items))
    return entries

  def apply_gathered(self, params, gathered, input, input_users=None,
                     input_items=None, target_users=None, target_items=None,
                     rng=None, training=False, items_sorted_unique=False):
    """Forward where embedding-table rows arrive pre-gathered (the
    differentiable leaves of the sparse path)."""
    del input_users, target_users, input_items
    de_rows = gathered.get('de_rows', gathered['en_rows'])
    de_bias = take_rows(params['de_bias'], target_items,
                        items_sorted_unique)
    return self._forward_core(params, input,
                              en_operand=gathered['en_rows'], en_ids=None,
                              de_operand=de_rows, de_ids=None,
                              de_bias=de_bias, rng=rng, training=training)
