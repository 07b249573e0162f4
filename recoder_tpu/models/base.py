"""Base factorization-model interface and init/shape helpers.

Parity with reference recoder/nn.py:12-65 (FactorizationModel ABC,
``activation`` at nn.py:6). TPU-first additions: every model pads its
item (and user) axis to a lane-aligned size with one extra sentinel row
(index ``num_items``) so padded union slots have a VALID row to gather
-- the sentinel/pad rows are xavier-initialized like real rows, NOT
zero; correctness comes from masking (loss row/col masks zero padded
contributions, recommend masks pad columns with -inf), the CLAUDE.md
"padding must contribute exactly zero" contract. ``param_axes()``
names which parameter axes carry the item/user dimension -- the
contract the mesh-sharding layer builds on.
"""

import jax
import jax.numpy as jnp
import numpy as np


LANE_ALIGN = 256
FEATURE_ALIGN = 128


def pad_dim(n, align=LANE_ALIGN):
  """Smallest multiple of ``align`` strictly greater than ``n``.

  Strictly greater so index ``n`` is always a valid sentinel row.
  """
  return ((int(n) + 1 + align - 1) // align) * align


def pad_features(d, align=FEATURE_ALIGN):
  """Smallest multiple of ``align`` >= d (feature axis, no sentinel).

  Embedding tables pad their feature axis to the 128-lane tile: XLA
  assigns a transposed ({0,1}) layout to row-scatters on tables whose
  minor dim is lane-ragged, which breaks donation aliasing and inserts
  two full-table copies per scatter per step (measured ~28 ms each at
  1M x 200 on v5e -- the whole sparse-path advantage). Lane-aligned
  tables keep the default layout and update in place. Pad columns are
  zero-initialized, sliced off before every nonlinearity, and receive
  exactly-zero gradients, so numerics are bit-identical to unpadded.
  """
  return (int(d) + align - 1) // align * align


def activation(x, act):
  """Apply activation by name ('none' | any jax.nn / jnp function name).

  Mirrors reference nn.py:6-9 (``getattr(torch, act)``).
  """
  if act == 'none':
    return x
  if hasattr(jax.nn, act):
    return getattr(jax.nn, act)(x)
  return getattr(jnp, act)(x)


def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
  """torch-style xavier_uniform_ (gain=1): U(-a, a), a = sqrt(6/(fi+fo)).

  ``fan_in/fan_out`` are passed explicitly because padded tables must
  use the *logical* dims for numerical parity with the reference init
  (nn.py:186-187,211,328-330).
  """
  limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
  return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def l2_normalize_rows(x, eps=1e-12):
  """Row-wise L2 normalize, matching torch F.normalize(p=2, dim=1).

  The squared-sum accumulates in float32 even for bf16 inputs (the cast
  fuses into the reduction).
  """
  sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True)
  norm = jnp.maximum(jnp.sqrt(sq), eps)
  return x / norm.astype(x.dtype)


def dropout(x, rate, rng):
  """Inverted dropout matching torch.nn.Dropout train-mode scaling."""
  keep = 1.0 - rate
  mask = jax.random.bernoulli(rng, keep, x.shape)
  return jnp.where(mask, x / keep, 0.0)


class FactorizationModel:
  """Base class for factorization models.

  Subclasses implement ``init_model``, ``model_params``,
  ``load_model_params``, and the pure ``apply`` compute path.
  """

  #: populated by init_model: pytree of jnp arrays
  params = None

  def init_model(self, num_items=None, num_users=None, seed=0):
    """Create ``self.params`` for a catalog of ``num_items``/``num_users``."""
    raise NotImplementedError

  def model_params(self):
    """Hyper-parameters dict, stored in checkpoints."""
    raise NotImplementedError

  def load_model_params(self, model_params):
    """Restore hyper-parameters from a checkpoint dict."""
    raise NotImplementedError

  def apply(self, params, input, input_users=None, input_items=None,
            target_users=None, target_items=None, rng=None, training=False):
    """Pure forward pass.

    Args:
      params: params pytree.
      input (jnp.ndarray [B, W]): dense interactions in the (compressed
        or full) column space.
      input_users / input_items / target_users / target_items: int32 id
        vectors selecting embedding rows, or None for the full table.
      rng: PRNG key for dropout noise (training only).
      training (bool): static flag enabling dropout.

    The built-in models additionally accept an optional
    ``compute_dtype`` keyword (inference dtype override); the trainer
    only passes it when ``eval_compute_dtype`` is set, so custom
    models implementing exactly this signature keep working.
    """
    raise NotImplementedError

  def param_axes(self):
    """Map param-path -> axis-name tuple (e.g. ('item', 'embed')).

    Used by recoder_tpu.parallel to assign mesh shardings and by the
    sparse-row optimizer to find item/user-indexed tables.
    """
    raise NotImplementedError

  def sparse_param_paths(self):
    """Param paths updated with sparse row-wise semantics when
    ``sparse=True`` (reference nn.py:87-89, model.py:109-138)."""
    return ()

  def encode_coo(self, params, rows, cols, vals, num_rows, input_users=None,
                 compute_dtype=None):
    """Optional: inference hidden state from COO interactions without
    densifying the full catalog. Required for chunked full-catalog
    top-k (``Recoder(eval_item_chunk=...)``), which scales evaluation
    to catalogs whose ``[B, num_items]`` slab exceeds HBM."""
    raise NotImplementedError(
        f'{type(self).__name__} does not support chunked inference')

  def decode_slice(self, params, h, start, width, compute_dtype=None):
    """Optional: scores for the contiguous catalog slice
    ``[start, start+width)`` given ``encode_coo``'s hidden state."""
    raise NotImplementedError(
        f'{type(self).__name__} does not support chunked inference')

  def __call__(self, input, **kw):
    return self.apply(self.params, input, **kw)
