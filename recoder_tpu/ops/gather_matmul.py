"""Gather+matmul primitives for dynamic (item-union) encode/decode.

These are the two hot ops of the framework (reference nn.py:269-280,
the LinearEmbedding gather + F.linear pair): encoding multiplies the
dense batch slab by the gathered item rows of the encoder table, and
decoding scores the bottleneck against the gathered rows of the decoder
table.

Lowering: ``table.at[ids].get`` + ``jnp.dot`` (XLA). A fused Pallas
gather+matmul variant was prototyped and measured, but single-row DMA
from an HBM-resident f32 table is not expressible on the current
Mosaic toolchain (arrays are (8, 128)-tiled in HBM, and both DMA slice
shapes and starts must be 8-row aligned along the sublane dim), so the
row gather stays with XLA's native lowering, which profiling shows is
not the step bottleneck at ML-20M scale. A block-aligned fused
score+loss Pallas kernel was also built and swept across shapes/dtypes
(B up to 2048, d up to 1024, f32/bf16) -- XLA's fusion beat it 1.7-2.8x
everywhere on v5e, so it lives unwired in
recoder_tpu/experiments/pallas_loss.py with the measurements.

Indices are guaranteed in-bounds by the data pipeline (padded slots use
the sentinel row ``num_items`` of a table padded to > num_items rows),
so gathers use mode='promise_in_bounds'.
"""

import jax.numpy as jnp


def take_rows(table, ids, sorted_unique=False):
  """Gather rows of ``table`` by int ids (in-bounds guaranteed).

  ``sorted_unique=True`` promises the ids are ascending and the valid
  (non-sentinel) ids are unique -- true for item-union id vectors
  (np.unique order + sentinel tail). The promise speeds up both the
  gather and its scatter-add transpose (measured ~7% of the train
  step); the sentinel-tail duplicates are safe because their cotangents
  are exactly zero (masked loss / zero input columns), so racing +0
  updates cannot change the row.
  """
  if ids is None:
    return table
  return table.at[ids].get(mode='promise_in_bounds',
                           unique_indices=sorted_unique,
                           indices_are_sorted=sorted_unique)


def encode_gather_matmul(z, table, ids, bias, compute_dtype=None,
                         sorted_unique=False):
  """``z[B, U] @ table[ids][U, d] + bias[d]`` (full table if ids None).

  Tables may carry zero pad columns beyond ``len(bias)`` (lane-aligned
  feature axis, models/base.pad_features); they are sliced off here --
  before any nonlinearity -- so they contribute nothing and receive
  exactly-zero gradients.
  """
  rows = take_rows(table, ids, sorted_unique)
  if compute_dtype is not None:
    z = z.astype(compute_dtype)
    rows = rows.astype(compute_dtype)
  out = jnp.dot(z, rows, preferred_element_type=jnp.float32)
  d = bias.shape[0]
  if out.shape[-1] != d:
    out = out[:, :d]
  return out + bias


def decode_gather_matmul(h, table, ids, bias, compute_dtype=None,
                         sorted_unique=False):
  """``h[B, d] @ table[ids].T[d, U] + bias[ids]`` (full table if ids None).

  When the table's feature axis is lane-padded (models/base.pad_features)
  ``h`` is zero-padded to match: zero activations x pad columns = 0, and
  the pad columns' gradients are exactly zero.
  """
  rows = take_rows(table, ids, sorted_unique)
  b = bias if ids is None else take_rows(bias, ids, sorted_unique)
  if h.shape[-1] != rows.shape[-1]:
    h = jnp.pad(h, ((0, 0), (0, rows.shape[-1] - h.shape[-1])))
  if compute_dtype is not None:
    h = h.astype(compute_dtype)
    rows = rows.astype(compute_dtype)
  out = jnp.dot(h, rows.T, preferred_element_type=jnp.float32)
  return out + b
