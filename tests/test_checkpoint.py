"""Checkpoint container tests: nested pytree + metadata round-trip,
dtype preservation, torch-free single-file format."""

import numpy as np
import pytest

from recoder_tpu.checkpoint import (flatten_tree, load_checkpoint,
                                    save_checkpoint, unflatten_tree)


def test_flatten_unflatten_roundtrip():
  tree = {'a': np.arange(3), 'b': {'c': np.ones((2, 2)),
                                   'd': {'e': np.float32(7)}}}
  flat = flatten_tree(tree)
  assert set(flat) == {'a', 'b/c', 'b/d/e'}
  back = unflatten_tree(flat)
  np.testing.assert_array_equal(back['a'], tree['a'])
  np.testing.assert_array_equal(back['b']['c'], tree['b']['c'])


def test_save_load_checkpoint(tmp_path):
  path = str(tmp_path / 'ck.model')
  arrays = {
      'model': {'w': np.random.rand(4, 5).astype(np.float32),
                'b': np.zeros(5, np.float32)},
      'optimizer': {'step': np.int32(17),
                    'm': {'w': np.random.rand(4, 5).astype(np.float32)}},
      'items': np.arange(100, dtype=np.int64),
  }
  meta = {'version': '0.1.0', 'model_params': {'hidden_layers': [200]},
          'last_epoch': 30, 'loss': 'logloss'}
  save_checkpoint(path, arrays, meta)

  arrays2, meta2 = load_checkpoint(path)
  assert meta2 == meta
  np.testing.assert_array_equal(arrays2['model']['w'],
                                arrays['model']['w'])
  assert arrays2['model']['w'].dtype == np.float32
  assert int(arrays2['optimizer']['step']) == 17
  assert arrays2['items'].dtype == np.int64
  np.testing.assert_array_equal(arrays2['optimizer']['m']['w'],
                                arrays['optimizer']['m']['w'])


def test_checkpoint_is_pickle_free(tmp_path):
  """allow_pickle=False on load: the format must not need object
  arrays (safety property the torch format lacks)."""
  path = str(tmp_path / 'ck.model')
  save_checkpoint(path, {'x': np.ones(3)}, {'k': [1, 2, {'nested': 'ok'}]})
  arrays, meta = load_checkpoint(path)  # would raise if pickled objects
  assert meta['k'][2]['nested'] == 'ok'
