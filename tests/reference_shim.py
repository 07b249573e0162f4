"""Load the actual torch reference implementation from /root/reference.

This is NOT a copy of the reference: it imports the reference package
from its read-only mount at test time, applying the minimal source-level
compatibility patches needed to run a 2018-era torch-1.8 codebase on the
installed modern stack (torch 2.x, numpy 2.x, scipy 1.17):

  * ``np.int`` was removed in numpy 1.24 (reference metrics.py:11,25,34)
  * ``x is 'literal'`` string-identity compares are a SyntaxWarning and
    rely on interning (reference losses.py:6-13)
  * ``scipy.sparse.sputils.{issequence,isintlike}`` were removed
    (reference data.py:6,51,66)
  * ``glog`` and ``annoy`` are not installed: glog maps onto stdlib
    logging; annoy gets a poison stub (the training/eval path never
    touches it -- only embedding.py does).

None of the patches change numerics. The shim exists so the integration
gates in test_reference_parity.py can pin OUR metrics against numbers
produced by the reference implementation itself on identical data,
instead of self-pinned values.
"""

import logging
import sys
import types

REFERENCE_ROOT = '/root/reference'
_PKG_DIR = REFERENCE_ROOT + '/recoder'

_SPUTILS_SHIM = '''
import numpy as _np_sputils
class sputils:  # minimal stand-in for removed scipy.sparse.sputils
  @staticmethod
  def issequence(i):
    return (isinstance(i, (list, tuple)) or
            (isinstance(i, _np_sputils.ndarray) and i.ndim == 1))
  @staticmethod
  def isintlike(i):
    try:
      return bool(int(i) == i) and not isinstance(i, (list, tuple))
    except (TypeError, ValueError):
      return False
'''

# (module file, [(old, new), ...]) -- textual compat fixes, numerics untouched
_SOURCE_FIXES = {
    'metrics.py': [('.astype(np.int)', '.astype(int)')],
    'losses.py': [(" is 'none'", " == 'none'"),
                  (" is 'elementwise_mean'", " == 'elementwise_mean'"),
                  (" is 'sum'", " == 'sum'")],
    'data.py': [('import scipy.sparse.sputils as sputils', _SPUTILS_SHIM)],
}

# model.py is imported last; order satisfies intra-package imports.
_MODULES = ['utils', 'data', 'losses', 'nn', 'metrics', 'embedding',
            'recommender', 'model']


def _stub_third_party():
  if 'glog' not in sys.modules:
    glog = types.ModuleType('glog')
    _log = logging.getLogger('recoder_reference')
    for name in ('info', 'warning', 'error', 'debug', 'fatal'):
      setattr(glog, name, getattr(_log, name, _log.info))
    sys.modules['glog'] = glog
  if 'annoy' not in sys.modules:
    annoy = types.ModuleType('annoy')

    class AnnoyIndex:  # poison stub: training/eval never reaches annoy
      def __init__(self, *a, **k):
        raise RuntimeError('annoy is not installed in this environment')

    annoy.AnnoyIndex = AnnoyIndex
    sys.modules['annoy'] = annoy


def load_reference():
  """Import the reference as the ``recoder`` package; returns the package.

  Idempotent. Raises FileNotFoundError when /root/reference is absent
  (tests should skipif on `reference_available()`).
  """
  if 'recoder' in sys.modules:
    return sys.modules['recoder']
  _stub_third_party()

  pkg = types.ModuleType('recoder')
  pkg.__path__ = [_PKG_DIR]
  with open(_PKG_DIR + '/__init__.py') as f:
    exec(compile(f.read(), _PKG_DIR + '/__init__.py', 'exec'), pkg.__dict__)
  sys.modules['recoder'] = pkg

  for name in _MODULES:
    path = f'{_PKG_DIR}/{name}.py'
    with open(path) as f:
      src = f.read()
    for old, new in _SOURCE_FIXES.get(f'{name}.py', []):
      assert old in src, f'compat fix target missing in {name}.py: {old!r}'
      src = src.replace(old, new)
    mod = types.ModuleType(f'recoder.{name}')
    mod.__file__ = path
    sys.modules[f'recoder.{name}'] = mod
    try:
      exec(compile(src, path, 'exec'), mod.__dict__)
    except Exception:
      del sys.modules[f'recoder.{name}']
      raise
    setattr(pkg, name, mod)
  return pkg


def reference_available():
  import os
  return os.path.isdir(_PKG_DIR)
