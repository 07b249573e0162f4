import numpy as np
import pandas as pd
import pytest

from recoder_tpu.utils import dataframe_to_csr_matrix, normalize, unzip


def test_unzip():
  assert unzip([(1, 'a'), (2, 'b'), (3, 'c')]) == [[1, 2, 3], ['a', 'b', 'c']]


def test_normalize_rows():
  x = np.array([[3.0, 4.0], [0.5, 0.0]])
  out = normalize(x, axis=1)
  np.testing.assert_allclose(np.linalg.norm(out, axis=1), [1.0, 1.0])


def test_normalize_axis0_and_1d():
  """Deviation from the reference's reshape(-1, 1) quirk: axis=0
  normalizes COLUMNS and 1-D input keeps its shape (SURVEY.md §7)."""
  x = np.array([[3.0, 4.0], [4.0, 3.0]])
  out = normalize(x, axis=0)
  np.testing.assert_allclose(np.linalg.norm(out, axis=0), [1.0, 1.0])
  # non-square would raise a broadcast error under the old reshape
  y = np.arange(6, dtype=float).reshape(2, 3) + 1
  np.testing.assert_allclose(np.linalg.norm(normalize(y, axis=0), axis=0),
                             np.ones(3))
  v = normalize(np.array([3.0, 4.0]))
  assert v.shape == (2,)
  np.testing.assert_allclose(np.linalg.norm(v), 1.0)


def test_dataframe_to_csr_matrix_roundtrip():
  df = pd.DataFrame({
      'user': [10, 10, 20, 30, 30, 30],
      'item': ['a', 'b', 'b', 'a', 'c', 'd'],
      'inter': [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
  })
  csr, item_id_map, user_id_map = dataframe_to_csr_matrix(
      df, user_col='user', item_col='item', inter_col='inter')

  assert csr.shape == (3, 4)
  assert set(user_id_map) == {10, 20, 30}
  assert set(item_id_map) == {'a', 'b', 'c', 'd'}
  # first-appearance order ids
  assert user_id_map[10] == 0 and user_id_map[20] == 1 and user_id_map[30] == 2
  assert item_id_map['a'] == 0 and item_id_map['b'] == 1

  for _, row in df.iterrows():
    u, i = user_id_map[row['user']], item_id_map[row['item']]
    assert csr[u, i] == row['inter']
  assert csr.nnz == len(df)


def test_dataframe_to_csr_matrix_existing_maps():
  df = pd.DataFrame({'user': [1, 2], 'item': [7, 8], 'inter': [1.0, 1.0]})
  user_id_map = {1: 2, 2: 0, 9: 1}
  item_id_map = {7: 1, 8: 0}
  csr, im, um = dataframe_to_csr_matrix(df, 'user', 'item', 'inter',
                                        item_id_map=item_id_map,
                                        user_id_map=user_id_map)
  assert csr.shape == (3, 2)
  assert csr[2, 1] == 1.0 and csr[0, 0] == 1.0
  assert im is item_id_map and um is user_id_map


def test_dataframe_to_csr_matrix_unknown_id_raises():
  df = pd.DataFrame({'user': [1], 'item': [99], 'inter': [1.0]})
  with pytest.raises(KeyError):
    dataframe_to_csr_matrix(df, 'user', 'item', 'inter',
                            item_id_map={7: 0}, user_id_map={1: 0})
