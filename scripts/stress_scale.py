"""Scale stress (BASELINE config 5 class): synthetic multi-million-item
catalog, sharded embedding tables, sparse row-wise updates, and an ANN
index build over the trained item embeddings.

On a TPU pod slice, run with real dims:
  python scripts/stress_scale.py --items 10000000 --dim 128 --mesh-model 8
On a CPU host, smoke the shapes with virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/stress_scale.py --items 2000000 --dim 16 --mesh-model 4 \
      --users 2000 --cpu
"""

# allow running from a repo checkout without installing
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))


import argparse
import time

import numpy as np
from scipy.sparse import csr_matrix


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--items', type=int, default=10_000_000)
  p.add_argument('--users', type=int, default=20_000)
  p.add_argument('--items-per-user', type=int, default=50)
  p.add_argument('--dim', type=int, default=128)
  p.add_argument('--mesh-model', type=int, default=0)
  p.add_argument('--epochs', type=int, default=2)
  p.add_argument('--batch-size', type=int, default=500)
  p.add_argument('--sparse', action='store_true', default=True)
  p.add_argument('--constrained', action='store_true',
                 help='tie the decoder to the encoder (one table '
                      'instead of two -- halves the table+moment HBM, '
                      'the difference between 4M and 8M items fitting '
                      'one v5e with adam)')
  p.add_argument('--optimizer', default='adam',
                 help="optimizer (the sparse path requires adam -- "
                      "row-sparse SparseAdam parity -- so its 3 table "
                      "copies bound one v5e at ~8M items x 128 "
                      "constrained; 10M+ shards tables over 'model')")
  p.add_argument('--cpu', action='store_true',
                 help='force the CPU backend (virtual-device smoke)')
  p.add_argument('--ann-items', type=int, default=200_000,
                 help='items to index with the C++ ANN forest '
                      '(full-catalog exact indexing is a single matmul '
                      'per query on TPU)')
  p.add_argument('--mesh-data', type=int, default=0,
                 help="mesh 'data' axis size (enables blocks-mode "
                      "sharded table storage past the byte budget -- "
                      "BASELINE config 5's pod-sharded layout)")
  p.add_argument('--shuffle', choices=['users', 'blocks'],
                 default='users',
                 help="sampling mode; 'blocks' is required for "
                      "'data'-sharded table storage")
  p.add_argument('--table-sharding', choices=['auto', 'data', 'none'],
                 default='auto',
                 help="storage layout of the blocks-mode resident "
                      "CSR/tables on the mesh (see DeviceDataSource)")
  p.add_argument('--params-dtype', choices=['float32', 'bfloat16'],
                 default='float32',
                 help="parameter STORAGE dtype (r4 training mode, "
                      "quality-gated). With --opt-state-dtype "
                      "bfloat16 the resident optimizer bytes drop "
                      "from 12 to 6 per parameter (p+m+v), roughly "
                      "doubling the single-chip catalog ceiling "
                      "(docs/benchmarks.md)")
  p.add_argument('--opt-state-dtype', choices=['float32', 'bfloat16'],
                 default='float32',
                 help="Adam moment storage dtype (see Recoder)")
  p.add_argument('--compute-dtype',
                 choices=['auto', 'float32', 'bfloat16'], default='auto',
                 help="matmul compute dtype. 'auto' follows the model "
                      "default: params_dtype when that is set (so "
                      "--params-dtype bfloat16 implies bf16 matmuls, "
                      "the gate-tested fast path), else float32. Pass "
                      "float32 explicitly for f32 matmuls over bf16 "
                      "storage")
  p.add_argument('--verify-replicated', action='store_true',
                 help="train a second, identically-seeded run with "
                      "replicated tables and assert the final params "
                      "match the sharded run within the documented "
                      "sharding tolerance (atol=2e-5 -- the shard_map "
                      "psum fetch reorders float accumulation; "
                      "feasible at reduced --items; the 10M receipt "
                      "uses the byte arithmetic below)")
  args = p.parse_args()

  import jax
  if args.cpu:
    jax.config.update('jax_platforms', 'cpu')

  from recoder_tpu.data import RecommendationDataset
  from recoder_tpu.embedding import AnnEmbeddingsIndex
  from recoder_tpu.model import Recoder
  from recoder_tpu.models import DynamicAutoencoder

  rng = np.random.default_rng(0)
  rows = np.repeat(np.arange(args.users), args.items_per_user)
  cols = rng.integers(0, args.items, len(rows))
  m = csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                 shape=(args.users, args.items))
  m.sum_duplicates()
  ds = RecommendationDataset(m)
  print(f'{args.users:,} users x {args.items:,} items, nnz={m.nnz:,}')

  mesh = None
  if args.mesh_model > 0 or args.mesh_data > 0:
    from recoder_tpu.parallel import MeshConfig, make_mesh
    # data=None lets make_mesh auto-absorb the leftover devices onto
    # the data axis (e.g. --mesh-model 4 on 8 devices -> data=2)
    mesh = make_mesh(MeshConfig(data=args.mesh_data or None,
                                model=max(args.mesh_model, 1)))
    print('mesh:', dict(zip(mesh.axis_names, mesh.devices.shape)))

  table_sharding = (None if args.table_sharding == 'none'
                    else args.table_sharding)
  train_kw = dict(batch_size=args.batch_size, negative_sampling=True,
                  shuffle=args.shuffle, table_sharding=table_sharding)

  pd = None if args.params_dtype == 'float32' else args.params_dtype
  osd = (None if args.opt_state_dtype == 'float32'
         else args.opt_state_dtype)
  cd = None if args.compute_dtype == 'auto' else args.compute_dtype
  model = DynamicAutoencoder(hidden_layers=[args.dim],
                             activation_type='tanh',
                             is_constrained=args.constrained,
                             sparse=args.sparse and mesh is None,
                             params_dtype=pd, compute_dtype=cd)
  trainer = Recoder(model=model, optimizer_type=args.optimizer,
                    loss='logistic', mesh=mesh, opt_state_dtype=osd)
  def synced_train(num_epochs):
    """train() then force completion: dispatch is async and
    block_until_ready lies through the tunnel -- only a host fetch
    proves the queued steps ran (see CLAUDE.md)."""
    t0 = time.time()
    trainer.train(train_dataset=ds, num_epochs=num_epochs, **train_kw)
    np.asarray(model.params['en_bias'])
    return time.time() - t0

  steps_per_epoch = -(-args.users // args.batch_size)
  dt = synced_train(args.epochs)
  print(f'warm train to epoch {args.epochs} in {dt:.1f}s '
        f'(includes compile; table {model.num_items_padded:,} x '
        f'{args.dim})')
  # steady state: resume re-runs the last epoch, then runs new ones
  timed = 3
  dt = synced_train(args.epochs + timed - 1)
  print(f'steady state: {timed} epochs x {steps_per_epoch} steps in '
        f'{dt:.1f}s = {1000 * dt / (timed * steps_per_epoch):.1f} '
        f'ms/step')
  try:
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get('peak_bytes_in_use')
    if peak:
      print(f'peak HBM in use: {peak / 2**30:.2f} GiB')
  except Exception:
    pass

  # per-chip byte arithmetic for the sharded resident arrays (BASELINE
  # config 5 receipt): every 'data'-sharded leaf must put exactly
  # 1/data_ways of its bytes on each chip
  source = trainer.fused_data_source
  if source is not None and source.table_sharding is not None:
    ways = source._data_ways
    dev0 = jax.local_devices()[0]

    def _leaves(obj):
      import jax as _jax
      vals = []
      stack = [getattr(obj, '__dict__', {})]
      while stack:
        d = stack.pop()
        for v in (d.values() if isinstance(d, dict) else d):
          if isinstance(v, _jax.Array):
            vals.append(v)
          elif isinstance(v, dict):
            stack.append(v)
          elif isinstance(v, (list, tuple)):
            stack.append({i: x for i, x in enumerate(v)})
      return vals

    total = chip0 = sharded_total = 0
    for arr in _leaves(source):
      nbytes = arr.size * arr.dtype.itemsize
      local = sum(s.data.size * arr.dtype.itemsize
                  for s in arr.addressable_shards
                  if s.device == dev0)
      total += nbytes
      chip0 += local
      if local * ways == nbytes:
        sharded_total += nbytes
    print(f'resident source arrays: {total / 2**20:.1f} MiB total, '
          f'{chip0 / 2**20:.1f} MiB on chip 0 '
          f'({sharded_total / 2**20:.1f} MiB sharded {ways}-way)')
    assert sharded_total > 0, 'table_sharding engaged but nothing sharded'
    # replicated remainder appears in full on chip 0; sharded arrays
    # contribute exactly 1/ways each
    expect_chip0 = (total - sharded_total) + sharded_total // ways
    assert abs(chip0 - expect_chip0) <= 1024, (chip0, expect_chip0)
    print(f'per-chip byte arithmetic OK: chip0 = replicated '
          f'{(total - sharded_total) / 2**20:.1f} MiB + sharded/'
          f'{ways} {(sharded_total // ways) / 2**20:.1f} MiB')

  if args.verify_replicated:
    print('verify: re-training with replicated tables (same seed)...')
    model_r = DynamicAutoencoder(hidden_layers=[args.dim],
                                 activation_type='tanh',
                                 is_constrained=args.constrained,
                                 sparse=False)
    trainer_r = Recoder(model=model_r, optimizer_type=args.optimizer,
                        loss='logistic', mesh=mesh)
    kw = dict(train_kw, table_sharding=None)
    # mirror the sharded run's two-call schedule exactly: resume
    # re-runs the last completed epoch (reference semantics), so a
    # single train() to the same final epoch would take FEWER steps
    trainer_r.train(train_dataset=ds, num_epochs=args.epochs, **kw)
    trainer_r.train(train_dataset=ds, num_epochs=args.epochs + 2, **kw)
    assert trainer_r.fused_data_source.table_sharding is None
    worst = 0.0
    for k in model.params:
      a, b = np.asarray(model.params[k]), np.asarray(model_r.params[k])
      worst = max(worst, float(np.max(np.abs(a - b))))
      # same tolerance as tests/test_sharding.py: the shard_map psum
      # fetch reorders float accumulation vs the replicated gather
      np.testing.assert_allclose(a, b, rtol=0, atol=2e-5, err_msg=k)
    print(f'verify OK: sharded-table params == replicated params '
          f'(max |diff| = {worst:.2e})')

  n_index = min(args.ann_items, args.items)
  if n_index <= 0:
    return
  de_key = ('en_embedding' if args.constrained else 'de_embedding')
  table = np.asarray(model.params[de_key][:n_index])
  t0 = time.time()
  index = AnnEmbeddingsIndex(embeddings=table, n_trees=10)
  index.build()
  print(f'ANN forest over {n_index:,} items built in '
        f'{time.time() - t0:.1f}s')
  q = int(rng.integers(n_index))
  print('sample neighbors of item', q, '->', index.get_nns_by_id(q, 5))


if __name__ == '__main__':
  main()
