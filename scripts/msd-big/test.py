"""Evaluate an msd-big checkpoint on the test split, via model inference
or ANN item-item similarity (reference scripts/ml-20m/test.py)."""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..', '..'))


import argparse

import numpy as np
import pandas as pd

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.embedding import AnnEmbeddingsIndex, MemCacheEmbeddingsIndex
from recoder_tpu.metrics import NDCG, Recall, RecommenderEvaluator
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder
from recoder_tpu.recommender import (InferenceRecommender,
                                     SimilarityRecommender)
from recoder_tpu.utils import dataframe_to_csr_matrix

COMMON = {'user_col': 'uid', 'item_col': 'sid', 'inter_col': 'watched'}


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--data-dir', default='data/msd-big/pro_sg/')
  p.add_argument('--model-file', required=True)
  p.add_argument('--method', choices=['inference', 'similarity'],
                 default='inference')
  p.add_argument('--index-file', default=None,
                 help='ANN index file (similarity method); default '
                      '<model-file>.index')
  p.add_argument('--num-recommendations', type=int, default=100)
  p.add_argument('--batch-size', type=int, default=500)
  args = p.parse_args()

  if args.method == 'inference':
    model = DynamicAutoencoder()
    recoder = Recoder(model)
    recoder.init_from_model_file(args.model_file)
    recommender = InferenceRecommender(recoder, args.num_recommendations)
  else:
    index = AnnEmbeddingsIndex()
    index.load(index_file=args.index_file or args.model_file + '.index')
    recommender = SimilarityRecommender(MemCacheEmbeddingsIndex(index),
                                        args.num_recommendations,
                                        scale=1, n=50)

  train_df = pd.read_csv(args.data_dir + 'train.csv')
  te_tr_df = pd.read_csv(args.data_dir + 'test_tr.csv')
  te_te_df = pd.read_csv(args.data_dir + 'test_te.csv')

  _, item_id_map, _ = dataframe_to_csr_matrix(train_df, **COMMON)
  te_tr_matrix, _, user_id_map = dataframe_to_csr_matrix(
      te_tr_df, item_id_map=item_id_map, **COMMON)
  te_te_matrix, _, _ = dataframe_to_csr_matrix(
      te_te_df, item_id_map=item_id_map, user_id_map=user_id_map, **COMMON)

  dataset = RecommendationDataset(te_tr_matrix, te_te_matrix)

  metrics = [Recall(k=20), Recall(k=50), NDCG(k=100)]
  evaluator = RecommenderEvaluator(recommender, metrics)
  results = evaluator.evaluate(dataset, batch_size=args.batch_size)
  for metric in results:
    print(f'{metric}: {np.mean(results[metric])}')


if __name__ == '__main__':
  main()
