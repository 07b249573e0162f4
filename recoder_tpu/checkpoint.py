"""Single-file checkpointing for params / optimizer state / metadata.

Parity with reference model.py:193-224 (save_state) and :166-191
(init_from_model_file): one file per checkpoint holding model
hyper-parameters, weights, optimizer state, the seen item/user id sets,
and the library version. Format: a numpy ``.npz`` archive -- arrays are
stored under '/'-joined pytree paths, metadata as a JSON string -- so
checkpoints are torch-free, mmap-friendly and endian-stable.
"""

import json
import os

import jax
import numpy as np


def flatten_tree(tree, prefix=''):
  """Flatten a nested dict pytree of arrays into {'a/b/c': array}."""
  out = {}
  if isinstance(tree, dict):
    for k, v in tree.items():
      if '/' in str(k):
        # '/' is the path separator; a key containing it would
        # round-trip into a DIFFERENT nested structure on load
        raise ValueError(f'checkpoint keys must not contain "/": {k!r}')
      out.update(flatten_tree(v, f'{prefix}{k}/'))
  elif tree is None:
    pass
  else:
    out[prefix[:-1]] = np.asarray(tree)
  return out


def unflatten_tree(flat):
  """Inverse of :func:`flatten_tree`."""
  tree = {}
  for path, value in flat.items():
    parts = path.split('/')
    node = tree
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = value
  return tree


def save_checkpoint(path, arrays_tree, metadata):
  """Write arrays (nested dict pytree) + JSON-able metadata to ``path``.

  Crash-safe overwrite: the archive is written to a same-directory
  temp file and atomically swapped into place with ``os.replace`` — a
  crash mid-write leaves any existing checkpoint at ``path`` intact
  (the reference's ``torch.save`` overwrites in place,
  reference model.py:193-224; production runs overwrite the same
  epoch path on resume, so in-place is a data-loss hazard)."""
  def _to_np(x):
    if (isinstance(x, jax.Array) and not x.is_fully_addressable
        and not x.is_fully_replicated):
      # multi-host mesh leaf (e.g. params sharded over an axis that
      # crosses processes): np.asarray would raise. All processes call
      # save_checkpoint (it contains this collective); each gets the
      # assembled global value.
      from jax.experimental import multihost_utils
      x = multihost_utils.process_allgather(x, tiled=True)
    x = np.asarray(x)
    if x.dtype.kind not in 'biufc':
      # npz has no bfloat16: it would round-trip as a void dtype.
      # Upcast to f32 (exact for bf16); the loader's construction-arg
      # cast restores the storage dtype bit-exactly (model._adapt_array)
      return x.astype(np.float32)
    return x

  arrays_tree = jax.tree_util.tree_map(_to_np, arrays_tree)
  flat = flatten_tree(arrays_tree)
  payload = {f'arr::{k}': v for k, v in flat.items()}
  payload['meta::json'] = np.frombuffer(
      json.dumps(metadata).encode('utf-8'), dtype=np.uint8)
  # pid-unique temp: multi-process runs on a shared filesystem all call
  # save_checkpoint (the allgather above is collective); concurrent
  # writers must not clobber each other's temp before the atomic swap
  tmp = f'{path}.tmp-save-{os.getpid()}'
  try:
    with open(tmp, 'wb') as f:
      np.savez(f, **payload)
      f.flush()
      os.fsync(f.fileno())
    os.replace(tmp, path)
  finally:
    if os.path.exists(tmp):
      os.unlink(tmp)


def load_checkpoint(path):
  """Returns (arrays_tree, metadata)."""
  with np.load(path, allow_pickle=False) as z:
    meta = json.loads(bytes(z['meta::json']).decode('utf-8'))
    flat = {k[len('arr::'):]: z[k] for k in z.files if k.startswith('arr::')}
  return unflatten_tree(flat), meta
