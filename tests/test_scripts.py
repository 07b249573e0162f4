"""Smoke tests for the layer-6 example scripts (reference scripts/*):
run each train script's main() in-process (conftest already pins the
CPU backend) on a tiny synthetic pro_sg-style split, then evaluate the
produced checkpoint through the test script. Guards the scripts
against API drift -- they are the reference's documented entry points
(reference scripts/{ml-20m,msd}/train.py)."""

import runpy
import sys

import numpy as np
import pandas as pd
import pytest


@pytest.fixture
def pro_sg_dir(tmp_path):
  """A tiny strong-generalization split in the scripts' CSV schema."""
  rng = np.random.default_rng(21)
  users, items = 60, 120

  def frame(user_lo, user_hi, per_user, pool):
    rows = []
    for u in range(user_lo, user_hi):
      for i in rng.choice(pool, size=per_user, replace=False):
        rows.append((u, int(i), 1))
    return pd.DataFrame(rows, columns=['uid', 'sid', 'watched'])

  d = tmp_path / 'pro_sg'
  d.mkdir()
  train = frame(0, 40, 12, np.arange(items))
  train.to_csv(d / 'train.csv', index=False)
  # held-out splits only touch items the training catalog knows
  # (preprocessing.strong_generalization_split guarantees this)
  seen = train['sid'].unique()
  frame(40, 60, 8, seen).to_csv(d / 'validation_tr.csv', index=False)
  frame(40, 60, 4, seen).to_csv(d / 'validation_te.csv', index=False)
  frame(40, 60, 8, seen).to_csv(d / 'test_tr.csv', index=False)
  frame(40, 60, 4, seen).to_csv(d / 'test_te.csv', index=False)
  return str(d) + '/'


def run_script(path, argv, monkeypatch):
  monkeypatch.setattr(sys, 'argv', [path] + argv)
  runpy.run_path(path, run_name='__main__')


@pytest.mark.parametrize('script,extra', [
    ('scripts/ml-20m/train.py', ['--epochs', '2']),
    ('scripts/msd/train.py', ['--epochs', '2']),
    ('scripts/msd-big/train.py', ['--epochs', '2',
                                  '--compute-dtype', 'float32']),
])
def test_train_script_smoke(script, extra, pro_sg_dir, tmp_path,
                            monkeypatch):
  model_dir = str(tmp_path / 'models') + '/'
  run_script(script, ['--data-dir', pro_sg_dir, '--model-dir', model_dir,
                      '--batch-size', '20'] + extra, monkeypatch)
  ckpts = list((tmp_path / 'models').glob('*_epoch_2.model'))
  assert ckpts, 'train script produced no checkpoint'


def test_stress_scale_bf16_storage_smoke(monkeypatch):
  """The scale study's r4 bf16-storage mode (--params-dtype +
  --opt-state-dtype): the flags must thread through to the model and
  trainer and the tiny run must train + build the ANN index (the 12M
  single-chip ceiling receipt in docs/benchmarks.md runs this path)."""
  run_script('scripts/stress_scale.py',
             ['--cpu', '--items', '2000', '--users', '200',
              '--items-per-user', '15', '--dim', '16', '--epochs', '1',
              '--batch-size', '100', '--ann-items', '300',
              '--params-dtype', 'bfloat16',
              '--opt-state-dtype', 'bfloat16'], monkeypatch)


def test_preprocess_script_smoke(tmp_path, monkeypatch):
  rng = np.random.default_rng(4)
  n = 4000
  pd.DataFrame({
      'userId': rng.integers(0, 200, n),
      'movieId': rng.integers(0, 150, n),
      'rating': rng.integers(1, 6, n).astype(float),
      'timestamp': np.arange(n),
  }).to_csv(tmp_path / 'ratings.csv', index=False)
  run_script('scripts/ml-20m/preprocess.py',
             ['--data-dir', str(tmp_path) + '/', '--heldout-users', '20',
              '--min-uc', '2'], monkeypatch)
  out = tmp_path / 'pro_sg'
  for f in ('train.csv', 'validation_tr.csv', 'validation_te.csv',
            'test_tr.csv', 'test_te.csv'):
    assert (out / f).exists(), f


def test_test_script_smoke(pro_sg_dir, tmp_path, monkeypatch):
  model_dir = str(tmp_path / 'models') + '/'
  run_script('scripts/ml-20m/train.py',
             ['--data-dir', pro_sg_dir, '--model-dir', model_dir,
              '--batch-size', '20', '--epochs', '1'], monkeypatch)
  ckpt = next(iter((tmp_path / 'models').glob('*_epoch_1.model')))
  run_script('scripts/ml-20m/test.py',
             ['--data-dir', pro_sg_dir, '--model-file', str(ckpt),
              '--batch-size', '20'], monkeypatch)


def test_gen_api_docs(tmp_path):
  """The dependency-free autodoc generator renders every public module
  with real content (the rendered-docs answer to the reference's
  Sphinx tree; docs/sphinx/ carries a buildable conf for environments
  that have sphinx)."""
  import tools.gen_api_docs as gen

  gen.main(out_dir=str(tmp_path))
  index = (tmp_path / 'index.md').read_text()
  for mod in gen.MODULES:
    page = tmp_path / (mod.replace('.', '_') + '.md')
    assert page.exists(), mod
    text = page.read_text()
    assert text.startswith(f'# `{mod}`')
    assert mod.replace('.', '_') + '.md' in index
  # spot-check substance: the trainer page documents train()
  model_page = (tmp_path / 'recoder_tpu_model.md').read_text()
  assert '`Recoder.train(' in model_page
  assert 'full_decode' in model_page
