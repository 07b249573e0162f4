"""Host-side array utilities.

Parity with reference recoder/utils.py (dataframe_to_csr_matrix at
utils.py:26, normalize at utils.py:15, unzip at utils.py:5), rebuilt on
vectorized pandas/numpy codes instead of python dict .map loops so the
ML-20M-scale conversion stays off the training critical path.
"""

import numpy as np
from scipy.sparse import coo_matrix


def unzip(l):
  """Inverse of ``zip`` on a list: ``unzip([(a, b), ...]) == [[a...], [b...]]``."""
  return list(map(list, zip(*l)))


def normalize(x, axis=None):
  """L2-normalize ``x`` along ``axis``.

  Deviation from reference utils.py:15 (documented in SURVEY.md §7):
  the reference's unconditional ``.reshape(-1, 1)`` silently
  normalizes along the wrong axis for ``axis=0`` and returns shape
  ``(1, n)`` for 1-D input; ``keepdims`` broadcasting is correct for
  every axis and preserves the input's shape. Identical results for
  the reference's own working cases (``axis=1`` / ``axis=None`` on
  2-D input).
  """
  return x / np.linalg.norm(x, axis=axis, keepdims=True)


def dataframe_to_csr_matrix(dataframe, user_col, item_col,
                            inter_col, item_id_map=None,
                            user_id_map=None):
  """Convert a user/item/interaction DataFrame into a CSR matrix.

  Returns ``(csr_matrix, item_id_map, user_id_map)`` where the id maps
  take original ids to contiguous 0-based indices. If a map is supplied
  it is used as-is (rows referencing unknown ids raise ``KeyError``-like
  errors via pandas map producing NaN -> we raise explicitly).
  """
  users = dataframe[user_col].to_numpy()
  items = dataframe[item_col].to_numpy()
  inters = dataframe[inter_col].to_numpy()

  def _encode(values, id_map):
    if id_map is None:
      # preserve first-appearance order like the reference's
      # ``dataframe[col].unique()`` enumeration (utils.py:50-56)
      uniq, first_idx = np.unique(values, return_index=True)
      order = np.argsort(first_idx, kind='stable')
      uniq = uniq[order]
      id_map = {v: i for i, v in enumerate(uniq)}
    lut_keys = np.fromiter(id_map.keys(), dtype=np.asarray(values).dtype,
                           count=len(id_map))
    lut_vals = np.fromiter(id_map.values(), dtype=np.int64, count=len(id_map))
    sorter = np.argsort(lut_keys)
    pos = np.searchsorted(lut_keys, values, sorter=sorter)
    pos = np.clip(pos, 0, len(lut_keys) - 1)
    hit = lut_keys[sorter[pos]] == values
    if not np.all(hit):
      missing = np.asarray(values)[~hit][:5]
      raise KeyError(f'ids not present in provided id map: {missing!r}')
    codes = lut_vals[sorter[pos]]
    return codes, id_map

  user_codes, user_id_map = _encode(users, user_id_map)
  item_codes, item_id_map = _encode(items, item_id_map)

  matrix_size = (len(user_id_map), len(item_id_map))
  csr = coo_matrix((inters, (user_codes, item_codes)),
                   shape=matrix_size).tocsr()
  return csr, item_id_map, user_id_map
