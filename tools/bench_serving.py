"""Serving latency receipt: p50/p95/p99 for the HTTP scoring surface.

Trains the reference-protocol model on the tests/data fixture (5
epochs -- the receipt measures serving, not quality), saves a
checkpoint, builds the C++ ANN item index from the trained decoder
embeddings, then starts ``cli.make_server`` in-process and fires
sequential single-client requests at both routes:

  /recommend          model forward + certified top-k on the device
  /recommend_similar  C++ RP-forest item-item similarity (host only)

One user per request (the serving-relevant unit), k=100, histories
sampled from real fixture rows. Warmup requests are excluded; the
timed section is pure request->response wall clock through the real
HTTP stack. Run on the TPU host:

  python tools/bench_serving.py [--requests 200]

Prints ONE JSON line per route.
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  ap = argparse.ArgumentParser(description=__doc__)
  ap.add_argument('--requests', type=int, default=200)
  ap.add_argument('--warmup', type=int, default=10)
  ap.add_argument('--k', type=int, default=100)
  ap.add_argument('--epochs', type=int, default=5)
  ap.add_argument('--workdir', default='/tmp/bench_serving')
  args = ap.parse_args()

  import pandas as pd

  from recoder_tpu import cli
  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.embedding import AnnEmbeddingsIndex, \
      build_embeddings_index
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder
  from recoder_tpu.utils import dataframe_to_csr_matrix

  os.makedirs(args.workdir, exist_ok=True)
  data_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '..', 'tests', 'data')
  train_df = pd.read_csv(os.path.join(data_dir, 'train.csv.gz'))
  matrix, _, _ = dataframe_to_csr_matrix(train_df, 'uid', 'sid',
                                         'watched')
  ds = RecommendationDataset(matrix)

  log(f'training the fixture checkpoint ({args.epochs} epochs)...')
  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5)
  trainer = Recoder(model=model, optimizer_type='adam', loss='logloss')
  trainer.train(train_dataset=ds, batch_size=500, lr=1e-3,
                weight_decay=2e-5, num_epochs=args.epochs,
                negative_sampling=True)
  ckpt = trainer.save_state(os.path.join(args.workdir, 'serve'))

  log('building the ANN index from the trained decoder embeddings...')
  index = build_embeddings_index(trainer, index_class=AnnEmbeddingsIndex,
                                 n_trees=10)
  idx_path = os.path.join(args.workdir, 'items.ann')
  index.build(index_file=idx_path)

  cfg = {
      'model': {'type': 'autoencoder', 'hidden_layers': [200],
                'activation_type': 'tanh', 'noise_prob': 0.5},
      'trainer': {'optimizer_type': 'adam', 'loss': 'logloss'},
      'serve': {'ann_index': idx_path, 'num_neighbors': 20},
  }
  server = cli.make_server(cfg, ckpt, port=0)
  threading.Thread(target=server.serve_forever, daemon=True).start()
  base = f'http://127.0.0.1:{server.server_address[1]}'
  log(f'server up at {base}')

  # realistic single-user histories off real fixture rows
  rng = np.random.default_rng(0)
  users = rng.choice(matrix.shape[0], size=args.warmup + args.requests,
                     replace=False)
  bodies = []
  for u in users:
    items = matrix.indices[matrix.indptr[u]:matrix.indptr[u + 1]]
    bodies.append(json.dumps(
        {'interactions': [[int(i) for i in items]],
         'k': args.k}).encode())

  def fire(route, body):
    req = urllib.request.Request(base + route, data=body,
                                 headers={'Content-Type':
                                          'application/json'})
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=120) as r:
      recs = json.loads(r.read())['recommendations']
    dt = (time.perf_counter() - t0) * 1e3
    assert recs and len(recs[0]) <= args.k
    return dt

  for route in ('/recommend', '/recommend_similar'):
    for body in bodies[:args.warmup]:
      fire(route, body)
    lat = [fire(route, body) for body in bodies[args.warmup:]]
    lat.sort()
    n = len(lat)
    out = {
        'metric': f'serving_latency{route.replace("/", "_")}',
        'route': route, 'k': args.k, 'requests': n,
        'p50_ms': round(lat[n // 2], 2),
        'p95_ms': round(lat[int(n * 0.95)], 2),
        'p99_ms': round(lat[min(int(n * 0.99), n - 1)], 2),
        'mean_ms': round(sum(lat) / n, 2),
    }
    print(json.dumps(out), flush=True)

  server.shutdown()


if __name__ == '__main__':
  main()
