"""Train the msd-big autoencoder: the large-catalog configuration
(reference scripts/msd-big/train.py: logloss, 80 epochs, milestones
[60, 70]), with optional multi-chip item-axis sharding -- the
embedding tables row-shard over the mesh 'model' axis and the batch
item-union rows are all-gathered over ICI (capability the reference
lacks; SURVEY.md section 2.3)."""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..', '..'))


import argparse
import os

import pandas as pd

from recoder_tpu.data import RecommendationDataset
from recoder_tpu.metrics import NDCG, Recall
from recoder_tpu.model import Recoder
from recoder_tpu.models import DynamicAutoencoder
from recoder_tpu.utils import dataframe_to_csr_matrix

COMMON = {'user_col': 'uid', 'item_col': 'sid', 'inter_col': 'watched'}


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--data-dir', default='data/msd-big/pro_sg/')
  p.add_argument('--model-dir', default='models/msd-big/')
  p.add_argument('--loss', default='logloss')
  p.add_argument('--epochs', type=int, default=80)
  p.add_argument('--batch-size', type=int, default=500)
  p.add_argument('--lr', type=float, default=1e-3)
  p.add_argument('--weight-decay', type=float, default=2e-5)
  p.add_argument('--sparse', action='store_true', default=True,
                 help='sparse row-wise embedding updates (recommended '
                      'at ~1M-item catalogs)')
  p.add_argument('--mesh-model', type=int, default=0,
                 help='item-axis model-parallel ways (0 = single chip); '
                      'remaining devices become the data axis')
  p.add_argument('--compute-dtype', default='bfloat16')
  p.add_argument('--random-negatives', type=int, default=0,
                 help='extra uniform-random negative items per step '
                      '(union-coverage knob for this catalog scale; '
                      'see docs/tutorial.md section 3)')
  p.add_argument('--resume', default=None)
  args = p.parse_args()

  train_df = pd.read_csv(args.data_dir + 'train.csv')
  val_tr_df = pd.read_csv(args.data_dir + 'validation_tr.csv')
  val_te_df = pd.read_csv(args.data_dir + 'validation_te.csv')

  train_matrix, item_id_map, _ = dataframe_to_csr_matrix(train_df, **COMMON)
  val_tr_matrix, _, user_id_map = dataframe_to_csr_matrix(
      val_tr_df, item_id_map=item_id_map, **COMMON)
  val_te_matrix, _, _ = dataframe_to_csr_matrix(
      val_te_df, item_id_map=item_id_map, user_id_map=user_id_map, **COMMON)

  train_dataset = RecommendationDataset(train_matrix)
  val_dataset = RecommendationDataset(val_tr_matrix, val_te_matrix)

  mesh = None
  if args.mesh_model > 0:
    from recoder_tpu.parallel import MeshConfig, make_mesh
    mesh = make_mesh(MeshConfig(model=args.mesh_model))
    print(f'mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}')

  model = DynamicAutoencoder(hidden_layers=[200], activation_type='tanh',
                             noise_prob=0.5, sparse=args.sparse,
                             compute_dtype=args.compute_dtype)
  trainer = Recoder(model=model, optimizer_type='adam', loss=args.loss,
                    user_based=False, mesh=mesh)
  if args.resume:
    trainer.init_from_model_file(args.resume)

  os.makedirs(args.model_dir, exist_ok=True)
  prefix = os.path.join(args.model_dir, f'{args.loss}_ns_d_0.0_n_0.5_200')

  metrics = [Recall(k=20, normalize=True), Recall(k=50, normalize=True),
             NDCG(k=100)]
  try:
    trainer.train(train_dataset=train_dataset, val_dataset=val_dataset,
                  batch_size=args.batch_size, lr=args.lr,
                  weight_decay=args.weight_decay, num_epochs=args.epochs,
                  negative_sampling=True, lr_milestones=[60, 70],
                  num_random_negatives=args.random_negatives,
                  model_checkpoint_prefix=prefix, checkpoint_freq=10,
                  eval_num_recommendations=100, metrics=metrics,
                  eval_freq=10)
  except (KeyboardInterrupt, SystemExit):
    trainer.save_state(prefix)
    raise


if __name__ == '__main__':
  main()
