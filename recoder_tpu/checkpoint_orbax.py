"""Orbax-backed checkpoint backend: async, atomic, tensorstore-sharded.

The default ``.npz`` single-file format (recoder_tpu.checkpoint) keeps
the reference's one-file-per-checkpoint ergonomics (reference
model.py:193-224). This backend is the pod-scale option: Orbax writes
each array as a tensorstore (sharded, parallel IO), commits the
checkpoint atomically, and -- with ``async_save`` -- returns while the
device-to-host fetch and the write proceed in the background, so the
training loop is blocked only for the on-device copy, not the IO.

A checkpoint is a DIRECTORY: ``{prefix}_epoch_{N}.orbax/`` containing
the Orbax pytree plus a ``recoder_meta.json`` sidecar with the same
metadata the npz format stores. ``Recoder.init_from_model_file``
auto-detects the format (directory -> orbax, file -> npz).
"""

import json
import os

import jax
import numpy as np

_ASYNC_CHECKPOINTER = None


def _checkpointer(async_save):
  import orbax.checkpoint as ocp
  if not async_save:
    return ocp.StandardCheckpointer(), False
  # one long-lived async checkpointer: it owns a background thread pool
  # and serializes successive saves (wait_until_finished between them)
  global _ASYNC_CHECKPOINTER
  if _ASYNC_CHECKPOINTER is None:
    _ASYNC_CHECKPOINTER = ocp.AsyncCheckpointer(
        ocp.StandardCheckpointHandler())
  return _ASYNC_CHECKPOINTER, True


def save_checkpoint_orbax(path, arrays_tree, metadata, async_save=True):
  """Write a pytree + metadata to the directory ``path``.

  With ``async_save`` the call returns once arrays are snapshotted;
  serialization and the atomic rename happen on Orbax's background
  threads (call :func:`wait_for_pending_saves` before reading it back
  in the same process).
  """
  path = os.path.abspath(path)
  ckptr, is_async = _checkpointer(async_save)
  if is_async:
    ckptr.wait_until_finished()  # at most one in-flight save
  if os.path.exists(path):
    import shutil
    shutil.rmtree(path)
  ckptr.save(path, arrays_tree)
  # the sidecar is tiny; write it synchronously next to the tree.
  # Orbax renames the tmp dir into place at commit; the sidecar lives
  # one level up so it never races the atomic rename.
  with open(path + '.meta.json', 'w') as f:
    json.dump(metadata, f)


def wait_for_pending_saves():
  """Block until every async orbax save has committed."""
  if _ASYNC_CHECKPOINTER is not None:
    _ASYNC_CHECKPOINTER.wait_until_finished()


def load_checkpoint_orbax(path):
  """Returns (arrays_tree, metadata) from :func:`save_checkpoint_orbax`."""
  import orbax.checkpoint as ocp
  path = os.path.abspath(path)
  wait_for_pending_saves()
  with open(path + '.meta.json') as f:
    meta = json.load(f)
  ckptr = ocp.StandardCheckpointer()
  tree = ckptr.restore(path)
  tree = jax.tree_util.tree_map(np.asarray, tree)
  return tree, meta


def is_orbax_checkpoint(path):
  return os.path.isdir(path) and os.path.exists(path + '.meta.json')
