"""Gather+matmul primitives for dynamic (item-union) encode/decode.

These are the two hot ops of the framework (reference nn.py:269-280,
the LinearEmbedding gather + F.linear pair): encoding multiplies the
dense batch slab by the gathered item rows of the encoder table, and
decoding scores the bottleneck against the gathered rows of the decoder
table.

Two lowerings:
  * XLA path (default, works on CPU/TPU): ``table.at[ids].get`` +
    ``jnp.dot``. XLA fuses the gather into the matmul operand read on
    TPU in most cases.
  * Pallas path (TPU): a fused kernel that DMAs the indexed table rows
    HBM->VMEM per output tile and feeds the MXU directly, never
    materializing the gathered [union, d] matrix in HBM. Enabled via
    :func:`set_impl` ('pallas') once the kernels are registered.

Indices are guaranteed in-bounds by the data pipeline (padded slots use
the sentinel row ``num_items`` of a table padded to > num_items rows),
so gathers use mode='promise_in_bounds'.
"""

import jax.numpy as jnp


_IMPL = 'xla'


def set_impl(impl):
  """Select lowering: 'xla' or 'pallas'."""
  global _IMPL
  assert impl in ('xla', 'pallas')
  _IMPL = impl


def get_impl():
  return _IMPL


def take_rows(table, ids):
  """Gather rows of ``table`` by int ids (in-bounds guaranteed)."""
  if ids is None:
    return table
  return table.at[ids].get(mode='promise_in_bounds',
                           unique_indices=False, indices_are_sorted=False)


def encode_gather_matmul(z, table, ids, bias, compute_dtype=None):
  """``z[B, U] @ table[ids][U, d] + bias[d]`` (full table if ids None)."""
  if _IMPL == 'pallas' and ids is not None:
    from recoder_tpu.ops import pallas_gather_matmul as pgm
    return pgm.encode(z, table, ids, bias, compute_dtype=compute_dtype)
  rows = take_rows(table, ids)
  if compute_dtype is not None:
    z = z.astype(compute_dtype)
    rows = rows.astype(compute_dtype)
  out = jnp.dot(z, rows, preferred_element_type=jnp.float32)
  return out + bias


def decode_gather_matmul(h, table, ids, bias, compute_dtype=None):
  """``h[B, d] @ table[ids].T[d, U] + bias[ids]`` (full table if ids None)."""
  if _IMPL == 'pallas' and ids is not None:
    from recoder_tpu.ops import pallas_gather_matmul as pgm
    return pgm.decode(h, table, ids, bias, compute_dtype=compute_dtype)
  rows = take_rows(table, ids)
  b = bias if ids is None else take_rows(bias, ids)
  if compute_dtype is not None:
    h = h.astype(compute_dtype)
    rows = rows.astype(compute_dtype)
  out = jnp.dot(h, rows.T, preferred_element_type=jnp.float32)
  return out + b
