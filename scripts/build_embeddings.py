"""Extract item embeddings from a trained checkpoint and build an ANN
index for the SimilarityRecommender.

(The reference's scripts/build_embeddings.py targets a pre-0.4 API and
cannot run; this is the working equivalent on the current API.)
"""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))


import argparse

from recoder_tpu.embedding import (AnnEmbeddingsIndex,
                                   BruteForceEmbeddingsIndex,
                                   build_embeddings_index)
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder, MatrixFactorization


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--model-file', required=True)
  p.add_argument('--model', choices=['autoencoder', 'mf'],
                 default='autoencoder')
  p.add_argument('--index-file', default=None,
                 help='output path (default: <model-file>.index)')
  p.add_argument('--index-type', choices=['ann', 'brute'], default='ann')
  p.add_argument('--n-trees', type=int, default=10)
  args = p.parse_args()

  model = (DynamicAutoencoder() if args.model == 'autoencoder'
           else MatrixFactorization(embedding_size=1))
  recoder = Recoder(model)
  recoder.init_from_model_file(args.model_file)

  index_cls = (AnnEmbeddingsIndex if args.index_type == 'ann'
               else BruteForceEmbeddingsIndex)
  kw = {'n_trees': args.n_trees} if args.index_type == 'ann' else {}
  index = build_embeddings_index(recoder, index_class=index_cls, **kw)

  out = args.index_file or args.model_file + '.index'
  # rebuild with persistence (build_embeddings_index built in memory)
  index.build(index_file=out)
  print(f'index for {index.embeddings.shape[0]} items written to {out}')


if __name__ == '__main__':
  main()
