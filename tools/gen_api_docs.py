"""Generate rendered API docs from the live docstrings.

The reference ships a Sphinx autodoc tree
(/root/reference/docs/source/conf.py + 8 .rst stubs). Sphinx is not
installable in this environment, so this dependency-free generator
walks the public modules with ``inspect`` and emits one markdown page
per module into ``docs/api/`` — same information source (the
docstrings), no external tooling. ``docs/sphinx/`` carries a real
Sphinx tree for environments that have it.

Usage:  python tools/gen_api_docs.py   (writes docs/api/*.md)
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

MODULES = [
    'recoder_tpu',
    'recoder_tpu.model',
    'recoder_tpu.models',
    'recoder_tpu.data',
    'recoder_tpu.data.device_pipeline',
    'recoder_tpu.ops.losses',
    'recoder_tpu.ops.topk',
    'recoder_tpu.metrics',
    'recoder_tpu.protocols',
    'recoder_tpu.recommender',
    'recoder_tpu.embedding',
    'recoder_tpu.optim',
    'recoder_tpu.checkpoint',
    'recoder_tpu.checkpoint_orbax',
    'recoder_tpu.progress',
    'recoder_tpu.parallel',
    'recoder_tpu.preprocessing',
    'recoder_tpu.utils',
    'recoder_tpu.cli',
]


def _sig(obj):
  try:
    return str(inspect.signature(obj))
  except (ValueError, TypeError):
    return '(...)'


def _doc(obj, indent=''):
  d = inspect.getdoc(obj)
  if not d:
    return ''
  return '\n'.join(indent + line for line in d.splitlines())


def _is_public(name, obj, module):
  if name.startswith('_'):
    return False
  mod = getattr(obj, '__module__', None)
  return mod == module.__name__ or (
      # package __init__ re-exports count as that package's API
      module.__name__ == 'recoder_tpu'
      or module.__name__.endswith(('.models', '.data', '.parallel')))


def render_module(modname):
  module = importlib.import_module(modname)
  out = [f'# `{modname}`', '']
  if module.__doc__:
    out += [inspect.cleandoc(module.__doc__), '']

  classes, functions = [], []
  names = getattr(module, '__all__', None) or sorted(vars(module))
  seen = set()
  for name in names:
    obj = getattr(module, name, None)
    if obj is None or name in seen or not _is_public(name, obj, module):
      continue
    seen.add(name)
    if inspect.isclass(obj):
      classes.append((name, obj))
    elif inspect.isfunction(obj):
      functions.append((name, obj))

  for name, cls in classes:
    out += [f'## class `{name}{_sig(cls)}`', '']
    doc = _doc(cls)
    if doc:
      out += [doc, '']
    for mname, meth in sorted(vars(cls).items()):
      if mname.startswith('_') or not callable(meth):
        continue
      fn = inspect.unwrap(getattr(cls, mname))
      if not (inspect.isfunction(fn) or inspect.ismethod(fn)):
        continue
      out += [f'### `{name}.{mname}{_sig(fn)}`', '']
      mdoc = _doc(fn)
      if mdoc:
        out += [mdoc, '']

  for name, fn in functions:
    out += [f'## `{name}{_sig(fn)}`', '']
    fdoc = _doc(fn)
    if fdoc:
      out += [fdoc, '']

  return '\n'.join(out).rstrip() + '\n'


def main(out_dir='docs/api'):
  os.makedirs(out_dir, exist_ok=True)
  index = ['# recoder-tpu API reference',
           '',
           'Generated from the live docstrings by'
           ' `tools/gen_api_docs.py`'
           ' (regenerate after docstring changes).',
           '']
  for modname in MODULES:
    page = modname.replace('.', '_') + '.md'
    with open(os.path.join(out_dir, page), 'w') as f:
      f.write(render_module(modname))
    index.append(f'- [`{modname}`]({page})')
    print(f'wrote {out_dir}/{page}')
  with open(os.path.join(out_dir, 'index.md'), 'w') as f:
    f.write('\n'.join(index) + '\n')
  print(f'wrote {out_dir}/index.md')


if __name__ == '__main__':
  sys.exit(main())
