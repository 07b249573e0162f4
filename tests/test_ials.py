"""iALS model tests: batched-solve exactness vs a numpy per-row
reference, monotone objective descent, fold-in/recommend semantics,
chunk-ladder coverage, checkpoint roundtrip, and a slow-tier quality
floor on the real fixture.

iALS is a beyond-parity addition (the reference ships only SGD
models); the TPU mapping — shared Gram + batched einsum corrections +
batched d x d Cholesky under power-of-two (B, L) chunk ladders — is
described in recoder_tpu/models/ials.py.
"""

import numpy as np
import pytest
from scipy.sparse import csr_matrix

from recoder_tpu.data import RecommendationDataset, UsersInteractions
from recoder_tpu.models import IALS


def _binary_matrix(users=40, items=25, density=0.2, seed=0):
  rng = np.random.default_rng(seed)
  m = (rng.random((users, items)) < density).astype(np.float32)
  return csr_matrix(m)


def _numpy_user_solve(m, v, alpha, lam, reg_scaling='frequency'):
  """Per-row reference: exact HKV normal equations, one user at a
  time in f64."""
  md = np.asarray(m.todense(), np.float64)
  v = np.asarray(v, np.float64)
  d = v.shape[1]
  g = v.T @ v
  out = np.zeros((md.shape[0], d))
  for u in range(md.shape[0]):
    idx = np.flatnonzero(md[u])
    c = 1.0 + alpha * md[u, idx]
    reg = lam * (len(idx) + 1.0) if reg_scaling == 'frequency' else lam
    a = g + (v[idx].T * (c - 1.0)) @ v[idx] + reg * np.eye(d)
    out[u] = np.linalg.solve(a, v[idx].T @ c)
  return out


def test_ials_batched_solve_matches_numpy():
  m = _binary_matrix()
  model = IALS(embedding_size=6, alpha=10.0, lam=0.05, sweeps=2, seed=1)
  model.fit(m)
  ref = _numpy_user_solve(m, model.item_factors, model.alpha, model.lam)
  got = np.asarray(model._solve_side(m, model.item_factors), np.float64)
  np.testing.assert_allclose(got, ref, atol=2e-5)


def test_ials_constant_reg_matches_numpy():
  m = _binary_matrix(seed=3)
  model = IALS(embedding_size=5, alpha=5.0, lam=0.3, sweeps=2,
               reg_scaling='none', seed=2)
  model.fit(m)
  ref = _numpy_user_solve(m, model.item_factors, model.alpha, model.lam,
                          reg_scaling='none')
  got = np.asarray(model._solve_side(m, model.item_factors), np.float64)
  np.testing.assert_allclose(got, ref, atol=2e-5)


def test_ials_objective_decreases_monotonically():
  """ALS on the exact objective is monotone by construction; the
  per-sweep objective (host f64 diagnostic) must never increase."""
  m = _binary_matrix(users=60, items=30, seed=4)
  objs = []
  model = IALS(embedding_size=8, alpha=10.0, lam=0.01, sweeps=5, seed=0)
  model.fit(m, callback=lambda s: objs.append(model.objective(m)))
  assert len(objs) == 5
  for a, b in zip(objs, objs[1:]):
    assert b <= a + 1e-8, objs


def test_ials_fold_in_reproduces_trained_users():
  """fit() ends with a user half-sweep against the final item factors,
  so fold-in on a training history is the SAME solve — bit-exact."""
  m = _binary_matrix(seed=5)
  model = IALS(embedding_size=6, alpha=10.0, lam=0.05, sweeps=3, seed=1)
  model.fit(m)
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  np.testing.assert_array_equal(np.asarray(model.fold_in(ui)),
                                np.asarray(model.user_factors))


def test_ials_recommend_excludes_seen_and_trims():
  m = _binary_matrix(seed=6)
  # user 0 has seen every item but two: a top-5 request must trim to
  # the two unseen instead of recommending watched items
  md = np.asarray(m.todense())
  md[0, :] = 1.0
  md[0, [3, 7]] = 0.0
  m = csr_matrix(md)
  model = IALS(embedding_size=6, alpha=10.0, lam=0.05, sweeps=3,
               seed=1).fit(m)
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  recs = model.recommend(ui, 5)
  assert sorted(int(i) for i in recs[0]) == [3, 7]
  for u, r in enumerate(recs):
    assert not md[u, list(map(int, r))].any(), (u, r)
    assert len(set(map(int, r))) == len(r)


def test_ials_empty_user_gets_zero_factor():
  md = np.asarray(_binary_matrix(seed=7).todense())
  md[2, :] = 0.0
  m = csr_matrix(md)
  model = IALS(embedding_size=6, alpha=10.0, lam=0.05, sweeps=2,
               seed=1).fit(m)
  np.testing.assert_array_equal(np.asarray(model.user_factors[2]), 0.0)
  # recommend still works for the empty user (all items unseen)
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  assert len(model.recommend(ui, 5)[2]) == 5


def test_ials_chunk_ladder_is_shape_invariant():
  """The greedy (B, L) power-of-two chunking must give the same
  factors at any element budget (only compile bucketing changes)."""
  rng = np.random.default_rng(8)
  # heavy-tailed nnz so budgets force multiple (B, L) buckets
  md = (rng.random((50, 30)) < 0.1).astype(np.float32)
  md[:3, :] = (rng.random((3, 30)) < 0.9).astype(np.float32)
  m = csr_matrix(md)
  model = IALS(embedding_size=4, alpha=10.0, lam=0.05, sweeps=1, seed=1)
  model.fit(m)
  big = np.asarray(model._solve_side(m, model.item_factors,
                                     chunk_elems=1 << 20))
  small = np.asarray(model._solve_side(m, model.item_factors,
                                       chunk_elems=64))
  np.testing.assert_allclose(big, small, atol=1e-6)


def test_ials_mesh_fit_matches_single():
  """fit(mesh=...) shards the row solves over every mesh device; the
  per-row reductions are not sharded, so mesh and single-device fits
  are numerically identical (and so is everything downstream)."""
  from recoder_tpu.parallel import MeshConfig, make_mesh

  m = _binary_matrix(users=50, items=30, seed=5)
  kw = dict(embedding_size=6, alpha=8.0, lam=0.05, sweeps=3, seed=4)
  ref = IALS(**kw).fit(m)
  mesh = make_mesh(MeshConfig(data=4, model=2))
  got = IALS(**kw).fit(m, mesh=mesh)
  np.testing.assert_allclose(np.asarray(got.user_factors),
                             np.asarray(ref.user_factors),
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(np.asarray(got.item_factors),
                             np.asarray(ref.item_factors),
                             rtol=1e-6, atol=1e-6)
  # serving off the mesh-fitted factors: same recommendations
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  for a, b in zip(ref.recommend(ui, 5), got.recommend(ui, 5)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ials_mesh_pads_chunks_smaller_than_mesh():
  """Tail chunks with B < mesh.size must pad the batch axis up to an
  equal per-device shard (pad rows carry zero weights and scatter out
  of bounds), not crash or skew results."""
  from recoder_tpu.parallel import MeshConfig, make_mesh

  m = _binary_matrix(users=5, items=7, density=0.5, seed=9)
  kw = dict(embedding_size=4, alpha=10.0, lam=0.05, sweeps=2, seed=1)
  mesh = make_mesh(MeshConfig(data=8, model=1))
  model = IALS(**kw)
  plan = model._chunk_plan(m.tocsr().astype(np.float32), mesh=mesh)
  assert all(c['rows'].shape[0] % mesh.size == 0 for c in plan['chunks'])
  ref = IALS(**kw).fit(m)
  got = IALS(**kw).fit(m, mesh=mesh)
  np.testing.assert_allclose(np.asarray(got.user_factors),
                             np.asarray(ref.user_factors),
                             rtol=1e-6, atol=1e-6)


def test_ials_users_sharded_fit_matches_single(tmp_path):
  """factor_sharding='users' stores the user factors row-sharded over
  the mesh (the >HBM-user-count lever); numerically identical to the
  single-device fit, pad rows zero, checkpoints trim the padding."""
  from jax.sharding import PartitionSpec as P

  from recoder_tpu.parallel import MeshConfig, make_mesh

  m = _binary_matrix(users=50, items=30, seed=5)
  kw = dict(embedding_size=6, alpha=8.0, lam=0.05, sweeps=3, seed=4)
  ref = IALS(**kw).fit(m)
  mesh = make_mesh(MeshConfig(data=4, model=2))
  got = IALS(**kw).fit(m, mesh=mesh, factor_sharding='users')

  # residency: row-sharded over all 8 devices, (50+1) padded to 56
  uf = got.user_factors
  assert uf.shape == (56, 6)
  assert uf.sharding.spec == P(('data', 'model'), None), uf.sharding
  assert {s.data.shape for s in uf.addressable_shards} == {(7, 6)}

  # tolerance: the row-sharded Gram is a psum of per-device partial
  # grams — a different f32 reduction order than one matmul — so the
  # gram-dependent solves match to ~1e-6 relative, not bitwise (the
  # batch-sharded mesh fit above IS exact because its gram replicates)
  u = np.asarray(uf)
  np.testing.assert_allclose(u[:50], np.asarray(ref.user_factors),
                             rtol=1e-5, atol=5e-6)
  assert not u[50:].any()  # sentinel + pad rows stay zero
  np.testing.assert_allclose(np.asarray(got.item_factors),
                             np.asarray(ref.item_factors),
                             rtol=1e-5, atol=5e-6)

  # objective trims the pad rows; identical to the replicated fit's
  assert np.isclose(got.objective(m), ref.objective(m), rtol=1e-6)

  # checkpoint format is identical across fit modes (padding trimmed)
  re = IALS().load(got.save(str(tmp_path / 'u.model')))
  assert re.user_factors.shape == (50, 6)
  np.testing.assert_allclose(np.asarray(re.user_factors), u[:50],
                             rtol=0, atol=0)

  # serving (fold-in + replicated item factors) unchanged
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  for a, b in zip(ref.recommend(ui, 5), got.recommend(ui, 5)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ials_users_sharded_requires_mesh():
  m = _binary_matrix()
  with pytest.raises(ValueError, match='requires a mesh'):
    IALS(embedding_size=4).fit(m, factor_sharding='users')
  with pytest.raises(ValueError, match='unknown factor_sharding'):
    IALS(embedding_size=4).fit(m, factor_sharding='items')


def test_ials_objective_ignores_explicit_zeros():
  """objective() follows fit()'s convention: an explicit zero is NOT
  an observation (it must not count as a c=1, s=1 cell nor inflate
  the frequency-scaled reg nnz counts)."""
  noisy = _binary_matrix(seed=11)
  noisy.data = noisy.data.copy()
  noisy.data[0] = 0.0  # first stored entry becomes an explicit zero
  clean = noisy.copy()
  clean.eliminate_zeros()
  assert clean.nnz == noisy.nnz - 1  # the pattern really differs
  # fit() treats them identically (it eliminates explicit zeros)...
  kw = dict(embedding_size=4, sweeps=2, seed=2)
  a = IALS(**kw).fit(clean)
  b = IALS(**kw).fit(noisy)
  np.testing.assert_array_equal(np.asarray(a.item_factors),
                                np.asarray(b.item_factors))
  # ...and objective() must report the same value on both (it is the
  # diagnostic for the objective fit() minimized)
  assert np.isclose(a.objective(noisy), a.objective(clean), rtol=1e-12)


def test_ials_fold_in_rejects_negative_values():
  """Serving gets the same validation as fit(): a negative value
  would make the per-row system indefinite and Cholesky would emit
  NaN factors silently."""
  m = _binary_matrix()
  model = IALS(embedding_size=4, sweeps=1).fit(m)
  bad = m[:3].astype(np.float32).copy()
  bad.data = bad.data.copy()
  bad.data[0] = -1.0
  ui = UsersInteractions(users=np.arange(3), interactions_matrix=bad)
  with pytest.raises(ValueError, match='non-negative'):
    model.fold_in(ui)


def test_ials_rejects_oversized_row():
  m = _binary_matrix(users=4, items=20, density=1.0)
  model = IALS(embedding_size=4, sweeps=1)
  with pytest.raises(ValueError, match='chunk_elems'):
    model.fit(m, chunk_elems=16)


def test_ials_rejects_unknown_reg_scaling():
  with pytest.raises(ValueError, match='reg_scaling'):
    IALS(reg_scaling='bogus')


def test_ials_predict_rejects_wrong_width():
  m = _binary_matrix()
  model = IALS(embedding_size=4, sweeps=1).fit(m)
  bad = UsersInteractions(users=np.arange(2),
                          interactions_matrix=_binary_matrix(2, 7))
  with pytest.raises(ValueError, match='items'):
    model.predict(bad)


def test_ials_save_load_roundtrip(tmp_path):
  m = _binary_matrix(seed=9)
  model = IALS(embedding_size=6, alpha=7.0, lam=0.02, sweeps=2,
               reg_scaling='none', seed=3).fit(m)
  path = model.save(str(tmp_path / 'ials.model'))
  loaded = IALS().load(path)
  assert loaded.embedding_size == 6
  assert loaded.alpha == 7.0
  assert loaded.reg_scaling == 'none'
  ui = UsersInteractions(users=np.arange(m.shape[0]),
                         interactions_matrix=m)
  for a, b in zip(model.recommend(ui, 5), loaded.recommend(ui, 5)):
    np.testing.assert_array_equal(a, b)

  from recoder_tpu.checkpoint import save_checkpoint
  other = str(tmp_path / 'other.model')
  save_checkpoint(other, {'x': np.arange(3)}, {'model': 'ease'})
  with pytest.raises(ValueError, match='not an iALS checkpoint'):
    IALS().load(other)


@pytest.mark.slow
def test_ials_fixture_quality():
  """Quality floor on the real fixture through the standard evaluator
  stack. Measured 2026-08-19 (19-config sweep, CPU backend): the
  fixture's 118k-nnz sparsity makes CAPACITY the binding regularizer —
  quality rises monotonically as d shrinks from 256 (0.0441 Recall@20)
  to the elbow at d=4 (**0.0874 Recall@20 / 0.1310 NDCG@100**), with
  alpha/lam nearly flat. That beats EASE's fixture numbers
  (0.0671/0.1027, test_ease.py) while the SGD autoencoder still wins
  (0.1417/0.1684) — at real ML-20M density the ordering inverts and
  iALS d>=128 is the strong baseline (Rendle'21 table 1); full sweep
  table in docs/benchmarks.md."""
  import pandas as pd

  from recoder_tpu.metrics import NDCG, Recall, RecommenderEvaluator
  from recoder_tpu.recommender import InferenceRecommender
  from recoder_tpu.utils import dataframe_to_csr_matrix

  train_df = pd.read_csv('tests/data/train.csv.gz')
  val_df = pd.read_csv('tests/data/val.csv.gz')
  train_m, imap, umap = dataframe_to_csr_matrix(train_df, 'uid', 'sid',
                                                'watched')
  val_m, _, _ = dataframe_to_csr_matrix(val_df, 'uid', 'sid', 'watched',
                                        item_id_map=imap, user_id_map=umap)
  model = IALS(embedding_size=4, alpha=30.0, lam=0.01, sweeps=8,
               seed=0).fit(train_m)
  ev = RecommenderEvaluator(InferenceRecommender(model, 100),
                            [Recall(k=20), NDCG(k=100)])
  res = ev.evaluate(RecommendationDataset(val_m, train_m), batch_size=500)
  means = {str(k): float(np.mean(v)) for k, v in res.items()}
  assert means['Recall@20'] > 0.080, means
  assert means['NDCG@100'] > 0.120, means
