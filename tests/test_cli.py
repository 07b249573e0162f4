"""End-to-end CLI coverage (VERDICT r1 #10): train from a JSON config,
evaluate a checkpoint with config/flag-selected metrics (including
AveragePrecision), and export batch recommendations to CSV."""

import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

from recoder_tpu import cli
from recoder_tpu.metrics import NDCG, AveragePrecision, Recall


@pytest.fixture
def workspace(tmp_path):
  rng = np.random.default_rng(0)
  n_users, n_items = 60, 80

  def frame(users, per_user):
    rows = np.repeat(users, per_user)
    cols = rng.integers(0, n_items, len(rows))
    return pd.DataFrame({'uid': rows, 'sid': cols,
                         'watched': 1.0}).drop_duplicates(['uid', 'sid'])

  frame(np.arange(n_users), 10).to_csv(tmp_path / 'train.csv', index=False)
  val_users = np.arange(20)
  frame(val_users, 6).to_csv(tmp_path / 'val_tr.csv', index=False)
  frame(val_users, 6).to_csv(tmp_path / 'val_te.csv', index=False)

  cfg = {
      'data': {'train': str(tmp_path / 'train.csv'),
               'val_tr': str(tmp_path / 'val_tr.csv'),
               'val_te': str(tmp_path / 'val_te.csv')},
      'model': {'type': 'autoencoder', 'hidden_layers': [16],
                'noise_prob': 0.0},
      'trainer': {'optimizer_type': 'adam', 'loss': 'mse', 'seed': 1},
      'train': {'batch_size': 20, 'num_epochs': 2,
                'negative_sampling': True,
                'model_checkpoint_prefix': str(tmp_path / 'ck')},
      'evaluate': {'metrics': ['recall@10', ['ndcg', 10], 'map@10']},
  }
  cfg_path = tmp_path / 'run.json'
  cfg_path.write_text(json.dumps(cfg))
  return tmp_path, cfg_path


def _run_cli(argv):
  old = sys.argv
  sys.argv = ['recoder_tpu'] + argv
  try:
    cli.main()
  finally:
    sys.argv = old


def test_parse_metrics_all_forms():
  metrics = cli.parse_metrics(
      ['recall@20', ['ndcg', 100],
       {'name': 'map', 'k': 5, 'normalize': False}])
  assert isinstance(metrics[0], Recall) and metrics[0].k == 20
  assert isinstance(metrics[1], NDCG) and metrics[1].k == 100
  assert isinstance(metrics[2], AveragePrecision)
  assert metrics[2].k == 5 and metrics[2].normalize is False
  with pytest.raises(ValueError, match='unknown metric'):
    cli.parse_metrics(['bogus@1'])


def test_cli_train_evaluate_recommend(workspace, capsys):
  tmp_path, cfg_path = workspace

  _run_cli(['train', '--config', str(cfg_path)])
  ckpt = str(tmp_path / 'ck_epoch_2.model')
  assert os.path.exists(ckpt)

  # config-selected metrics (incl. AveragePrecision)
  _run_cli(['evaluate', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '10', '--batch-size', '20'])
  out = capsys.readouterr().out
  assert 'Recall@10' in out and 'NDCG@10' in out
  assert 'AveragePrecision@10' in out

  # flag-selected metrics override the config
  _run_cli(['evaluate', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '10', '--batch-size', '20',
            '--metrics', 'recall@5'])
  out = capsys.readouterr().out
  assert 'Recall@5' in out and 'AveragePrecision' not in out

  out_csv = str(tmp_path / 'recs.csv')
  _run_cli(['recommend', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '5', '--batch-size', '30',
            '--out', out_csv])
  recs = pd.read_csv(out_csv)
  assert list(recs.columns) == ['uid', 'rank', 'sid']
  assert recs.uid.nunique() == 60
  assert recs.groupby('uid')['rank'].max().eq(5).all()


def test_cli_serve_endpoints(workspace):
  """serve: health check + batch scoring over HTTP."""
  import json as _json
  import threading
  import urllib.request

  tmp_path, cfg_path = workspace
  _run_cli(['train', '--config', str(cfg_path)])
  ckpt = str(tmp_path / 'ck_epoch_2.model')

  cfg = _json.loads(cfg_path.read_text())
  server = cli.make_server(cfg, ckpt, port=0)  # ephemeral port
  t = threading.Thread(target=server.serve_forever, daemon=True)
  t.start()
  try:
    base = f'http://127.0.0.1:{server.server_address[1]}'
    with urllib.request.urlopen(f'{base}/healthz', timeout=10) as r:
      health = _json.loads(r.read())
    assert health['status'] == 'ok' and health['num_items'] == 80

    body = _json.dumps({'interactions': [[1, 2, 3], [10, 11]],
                        'k': 5}).encode()
    req = urllib.request.Request(f'{base}/recommend', data=body,
                                 headers={'Content-Type':
                                          'application/json'})
    with urllib.request.urlopen(req, timeout=30) as r:
      recs = _json.loads(r.read())['recommendations']
    assert len(recs) == 2 and all(len(r) == 5 for r in recs)
    assert not set(recs[0]) & {1, 2, 3}  # seen items masked

    # bad request -> 400 with an error message
    bad = _json.dumps({'interactions': [[999]], 'k': 5}).encode()
    req = urllib.request.Request(f'{base}/recommend', data=bad,
                                 headers={'Content-Type':
                                          'application/json'})
    try:
      urllib.request.urlopen(req, timeout=10)
      assert False, 'expected HTTP 400'
    except urllib.error.HTTPError as e:
      assert e.code == 400
      assert 'out of range' in _json.loads(e.read())['error']
  finally:
    server.shutdown()


def test_cli_serve_similarity_route(workspace):
  """POST /recommend_similar scores via the C++ ANN forest when the
  config carries serve.ann_index; without it the route 400s."""
  import json as _json
  import threading
  import urllib.request

  import numpy as np

  from recoder_tpu.embedding import AnnEmbeddingsIndex

  tmp_path, cfg_path = workspace
  _run_cli(['train', '--config', str(cfg_path)])
  ckpt = str(tmp_path / 'ck_epoch_2.model')

  # a small index over all 80 catalog items (identity id map)
  rng = np.random.default_rng(0)
  emb = rng.standard_normal((80, 16)).astype(np.float32)
  idx_path = str(tmp_path / 'items.ann')
  AnnEmbeddingsIndex(embeddings=emb, n_trees=4).build(idx_path)

  cfg = _json.loads(cfg_path.read_text())
  cfg['serve'] = {'ann_index': idx_path, 'num_neighbors': 10}
  server = cli.make_server(cfg, ckpt, port=0)
  t = threading.Thread(target=server.serve_forever, daemon=True)
  t.start()
  try:
    base = f'http://127.0.0.1:{server.server_address[1]}'
    body = _json.dumps({'interactions': [[1, 2, 3], [10, 11]],
                        'k': 5}).encode()
    req = urllib.request.Request(f'{base}/recommend_similar', data=body,
                                 headers={'Content-Type':
                                          'application/json'})
    with urllib.request.urlopen(req, timeout=30) as r:
      recs = _json.loads(r.read())['recommendations']
    assert len(recs) == 2
    for r_, hist in zip(recs, [[1, 2, 3], [10, 11]]):
      assert 0 < len(r_) <= 5
      assert all(0 <= i < 80 for i in r_)
      assert not set(r_) & set(hist)  # history excluded from the pool
  finally:
    server.shutdown()

  # no serve.ann_index -> the route refuses with a clear error
  server = cli.make_server(_json.loads(cfg_path.read_text()), ckpt,
                           port=0)
  t = threading.Thread(target=server.serve_forever, daemon=True)
  t.start()
  try:
    base = f'http://127.0.0.1:{server.server_address[1]}'
    req = urllib.request.Request(f'{base}/recommend_similar', data=body,
                                 headers={'Content-Type':
                                          'application/json'})
    try:
      urllib.request.urlopen(req, timeout=10)
      assert False, 'expected HTTP 400'
    except urllib.error.HTTPError as e:
      assert e.code == 400
      assert 'ann_index' in _json.loads(e.read())['error']
  finally:
    server.shutdown()


def test_cli_train_with_mesh(workspace):
  """trainer.mesh_model in the config builds a ('data','model') mesh
  over the visible (virtual) devices and trains SPMD."""
  import jax
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  tmp_path, cfg_path = workspace
  cfg = json.loads(cfg_path.read_text())
  cfg['trainer']['mesh_model'] = 2
  cfg['train']['model_checkpoint_prefix'] = str(tmp_path / 'mesh_ck')
  mesh_cfg = tmp_path / 'mesh.json'
  mesh_cfg.write_text(json.dumps(cfg))
  _run_cli(['train', '--config', str(mesh_cfg)])
  assert os.path.exists(str(tmp_path / 'mesh_ck_epoch_2.model'))


def test_cli_recommend_original_id_space(tmp_path):
  """The recommend CSV must speak the input CSVs' ORIGINAL id space,
  not internal matrix indices (uids offset by 1000, sids by 500)."""
  rng = np.random.default_rng(3)
  uids = np.repeat(np.arange(1000, 1030), 8)
  sids = rng.integers(500, 560, len(uids))
  pd.DataFrame({'uid': uids, 'sid': sids, 'watched': 1.0}) \
      .drop_duplicates(['uid', 'sid']) \
      .to_csv(tmp_path / 'train.csv', index=False)
  cfg = {
      'data': {'train': str(tmp_path / 'train.csv')},
      'model': {'type': 'autoencoder', 'hidden_layers': [8],
                'noise_prob': 0.0},
      'trainer': {'optimizer_type': 'adam', 'loss': 'mse', 'seed': 1},
      'train': {'batch_size': 10, 'num_epochs': 1,
                'negative_sampling': True,
                'model_checkpoint_prefix': str(tmp_path / 'ck')},
  }
  cfg_path = tmp_path / 'run.json'
  cfg_path.write_text(json.dumps(cfg))
  _run_cli(['train', '--config', str(cfg_path)])
  out_csv = str(tmp_path / 'recs.csv')
  _run_cli(['recommend', '--config', str(cfg_path),
            '--model-file', str(tmp_path / 'ck_epoch_1.model'),
            '--num-recommendations', '5', '--batch-size', '30',
            '--out', out_csv])
  recs = pd.read_csv(out_csv)
  assert set(recs.uid) == set(range(1000, 1030))
  assert recs.sid.between(500, 559).all()


def test_cli_recommend_k_exceeds_unseen(tmp_path):
  """k larger than a user's unseen catalog: the -inf-masked pad
  columns in the top-k tail must be skipped, not KeyError the run
  (users here have seen most of a 8-item catalog, k=10 > catalog)."""
  uids = np.repeat(np.arange(100, 112), 6)
  sids = np.tile(np.arange(50, 56), 12)
  pd.DataFrame({'uid': uids, 'sid': sids, 'watched': 1.0}) \
      .to_csv(tmp_path / 'train.csv', index=False)
  cfg = {
      'data': {'train': str(tmp_path / 'train.csv')},
      'model': {'type': 'autoencoder', 'hidden_layers': [4],
                'noise_prob': 0.0},
      'trainer': {'optimizer_type': 'adam', 'loss': 'mse', 'seed': 1},
      'train': {'batch_size': 6, 'num_epochs': 1,
                'negative_sampling': True,
                'model_checkpoint_prefix': str(tmp_path / 'ck')},
  }
  cfg_path = tmp_path / 'run.json'
  cfg_path.write_text(json.dumps(cfg))
  _run_cli(['train', '--config', str(cfg_path)])
  out_csv = str(tmp_path / 'recs.csv')
  _run_cli(['recommend', '--config', str(cfg_path),
            '--model-file', str(tmp_path / 'ck_epoch_1.model'),
            '--num-recommendations', '10', '--batch-size', '12',
            '--out', out_csv])
  recs = pd.read_csv(out_csv)
  assert recs.sid.between(50, 55).all()   # never a pad column id
  assert (recs.groupby('uid')['rank'].apply(
      lambda r: list(r) == list(range(1, len(r) + 1)))).all()


def test_cli_ease_train_evaluate_recommend_serve(workspace, capsys):
  """model.type='ease' routes every subcommand through the closed-form
  model: train = one fit + save, evaluate/recommend/serve load the
  EASE checkpoint and reuse the shared scoring plumbing."""
  import json as _json
  import threading
  import urllib.request

  tmp_path, _ = workspace
  cfg = _json.loads((tmp_path / 'run.json').read_text())
  cfg['model'] = {'type': 'ease', 'lam': 50.0}
  cfg['train'] = {'model_checkpoint_prefix': str(tmp_path / 'ease'),
                  'metrics': ['recall@10']}
  cfg_path = tmp_path / 'ease.json'
  cfg_path.write_text(_json.dumps(cfg))

  _run_cli(['train', '--config', str(cfg_path)])
  out = capsys.readouterr().out
  ckpt = str(tmp_path / 'ease.model')
  assert os.path.exists(ckpt)
  assert 'Recall@10' in out  # val metrics printed after the fit

  _run_cli(['evaluate', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '10', '--batch-size', '20',
            '--metrics', 'ndcg@10'])
  out = capsys.readouterr().out
  assert 'NDCG@10' in out

  out_csv = str(tmp_path / 'ease_recs.csv')
  _run_cli(['recommend', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '5', '--batch-size', '30',
            '--out', out_csv])
  recs = pd.read_csv(out_csv)
  assert recs.uid.nunique() == 60
  assert recs.groupby('uid')['rank'].max().eq(5).all()

  server = cli.make_server(cfg, ckpt, port=0)
  thread = threading.Thread(target=server.serve_forever, daemon=True)
  thread.start()
  try:
    port = server.server_address[1]
    body = _json.dumps({'interactions': [[1, 2, 3]], 'k': 5}).encode()
    req = urllib.request.Request(f'http://127.0.0.1:{port}/recommend',
                                 data=body,
                                 headers={'Content-Type': 'application/json'})
    with urllib.request.urlopen(req, timeout=30) as r:
      payload = _json.loads(r.read())
    assert len(payload['recommendations']) == 1
    assert len(payload['recommendations'][0]) == 5
    assert not ({1, 2, 3} & set(payload['recommendations'][0]))
  finally:
    server.shutdown()
    thread.join(timeout=10)


def test_cli_ials_train_evaluate_recommend(workspace, capsys):
  """model.type='ials' routes through the fit-style branch: train =
  ALS sweeps + save, evaluate/recommend load the iALS checkpoint and
  reuse the shared scoring plumbing (serve shares the same loader,
  covered by the EASE serve test)."""
  import json as _json

  tmp_path, _ = workspace
  cfg = _json.loads((tmp_path / 'run.json').read_text())
  cfg['model'] = {'type': 'ials', 'embedding_size': 8, 'alpha': 10.0,
                  'lam': 0.01, 'sweeps': 3}
  cfg['train'] = {'model_checkpoint_prefix': str(tmp_path / 'ials'),
                  'metrics': ['recall@10']}
  cfg_path = tmp_path / 'ials.json'
  cfg_path.write_text(_json.dumps(cfg))

  _run_cli(['train', '--config', str(cfg_path)])
  out = capsys.readouterr().out
  ckpt = str(tmp_path / 'ials.model')
  assert os.path.exists(ckpt)
  assert 'Recall@10' in out  # val metrics printed after the fit

  _run_cli(['evaluate', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '10', '--batch-size', '20',
            '--metrics', 'ndcg@10'])
  out = capsys.readouterr().out
  assert 'NDCG@10' in out

  out_csv = str(tmp_path / 'ials_recs.csv')
  _run_cli(['recommend', '--config', str(cfg_path), '--model-file', ckpt,
            '--num-recommendations', '5', '--batch-size', '30',
            '--out', out_csv])
  recs = pd.read_csv(out_csv)
  assert recs.uid.nunique() == 60
  assert recs.groupby('uid')['rank'].max().eq(5).all()


def test_cli_ials_factor_sharding_users(workspace, capsys):
  """model.factor_sharding='users' + trainer.mesh_model plumb through
  cmd_train to fit(mesh=..., factor_sharding='users'); the saved
  checkpoint trims the shard padding (identical format across
  modes)."""
  import json as _json

  from recoder_tpu.models import IALS

  tmp_path, _ = workspace
  cfg = _json.loads((tmp_path / 'run.json').read_text())
  cfg['model'] = {'type': 'ials', 'embedding_size': 8, 'alpha': 10.0,
                  'lam': 0.01, 'sweeps': 2,
                  'factor_sharding': 'users'}
  cfg['trainer'] = {'mesh_model': 2}
  cfg['train'] = {'model_checkpoint_prefix': str(tmp_path / 'ials_us'),
                  'metrics': ['recall@10']}
  cfg_path = tmp_path / 'ials_us.json'
  cfg_path.write_text(_json.dumps(cfg))

  _run_cli(['train', '--config', str(cfg_path)])
  out = capsys.readouterr().out
  assert 'Recall@10' in out
  ckpt = str(tmp_path / 'ials_us.model')
  model = IALS().load(ckpt)
  # pad rows trimmed: exactly the 60 fixture users, no shard padding
  assert model.user_factors.shape == (60, 8)
