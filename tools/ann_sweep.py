"""ANN recall/latency sweep: the C++ RP-forest vs exact brute force.

Produces the recall@k-vs-latency curve across (n_trees, search_k) so a
deployment can pick its operating point (the knob annoy exposes too,
reference embedding.py:95-101). Uses the threaded batch query API.

Run: PYTHONPATH=. python tools/ann_sweep.py [--items 50000] [--dim 64]
Output: one JSON line per configuration on stdout.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--items', type=int, default=50_000)
  ap.add_argument('--dim', type=int, default=64)
  ap.add_argument('--queries', type=int, default=1_000)
  ap.add_argument('--k', type=int, default=10)
  ap.add_argument('--clustered', action='store_true',
                  help='clustered embeddings (easier; closer to trained '
                       'item tables) instead of uniform random')
  ap.add_argument('--trees', default='5,10,20,50',
                  help='comma list of n_trees to sweep (trim for '
                       'multi-million-item builds on small hosts)')
  ap.add_argument('--search-k', default='-1,200,1000,5000',
                  help='comma list of search_k values to sweep')
  args = ap.parse_args()

  from recoder_tpu.embedding import (AnnEmbeddingsIndex,
                                     BruteForceEmbeddingsIndex)

  rng = np.random.default_rng(0)
  if args.clustered:
    n_clusters = max(args.items // 500, 8)
    centers = rng.normal(size=(n_clusters, args.dim)) * 4
    emb = (centers[rng.integers(0, n_clusters, args.items)]
           + rng.normal(size=(args.items, args.dim))).astype(np.float32)
  else:
    emb = rng.normal(size=(args.items, args.dim)).astype(np.float32)

  query_ids = rng.choice(args.items, args.queries, replace=False)

  exact = BruteForceEmbeddingsIndex(embeddings=emb)
  exact.build()
  t0 = time.time()
  truth = exact.get_nns_by_ids(query_ids, args.k)
  exact_ms = (time.time() - t0) / args.queries * 1e3
  truth = [set(t.tolist()) for t in truth]
  print(json.dumps({'config': 'exact', 'per_query_ms': round(exact_ms, 4),
                    'recall': 1.0}), flush=True)

  for n_trees in (int(t) for t in args.trees.split(',')):
    index = AnnEmbeddingsIndex(embeddings=emb, n_trees=n_trees)
    t0 = time.time()
    index.build()
    build_s = time.time() - t0
    for search_k in (int(s) for s in args.search_k.split(',')):
      index.search_k = search_k
      index.get_nns_by_ids(query_ids[:16], args.k)  # warm
      t0 = time.time()
      got = index.get_nns_by_ids(query_ids, args.k)
      per_query_ms = (time.time() - t0) / args.queries * 1e3
      recall = float(np.mean([
          len(truth[i] & set(g.tolist())) / args.k
          for i, g in enumerate(got)]))
      print(json.dumps({
          'config': f'trees={n_trees} search_k={search_k}',
          'n_trees': n_trees, 'search_k': search_k,
          'build_s': round(build_s, 2),
          'per_query_ms': round(per_query_ms, 4),
          'recall': round(recall, 4),
      }), flush=True)


if __name__ == '__main__':
  sys.exit(main())
