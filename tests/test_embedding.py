"""Embedding-index tests, mirroring reference tests/test_embedding.py
(build -> save -> load roundtrip, identical results) for both the C++
ANN forest and the exact brute-force index, plus an ANN recall check
against exact search."""

import numpy as np
import pytest

from recoder_tpu.embedding import (AnnEmbeddingsIndex,
                                   BruteForceEmbeddingsIndex,
                                   MemCacheEmbeddingsIndex)


@pytest.fixture(scope='module')
def embeddings():
  rng = np.random.default_rng(0)
  return rng.random((1000, 128)).astype(np.float32)


@pytest.mark.parametrize('index_cls', [BruteForceEmbeddingsIndex,
                                       AnnEmbeddingsIndex])
def test_build_save_load_roundtrip(index_cls, embeddings, tmp_path):
  index = index_cls(embeddings=embeddings)
  path = str(tmp_path / 'test_embeddings')
  index.build(index_file=path)

  loaded = index_cls()
  loaded.load(index_file=path)

  assert loaded.embedding_size == index.embedding_size == 128

  rng = np.random.default_rng(1)
  test_item = int(rng.integers(1000))
  assert index.get_embedding(test_item) == loaded.get_embedding(test_item)
  assert index.get_nns_by_id(test_item, 100) == \
      loaded.get_nns_by_id(test_item, 100)

  i1, i2 = int(rng.integers(1000)), int(rng.integers(1000))
  assert index.get_similarity(i1, i2) == loaded.get_similarity(i1, i2)
  # similarity is in [0, 1], self-similarity is 1
  assert 0.0 <= index.get_similarity(i1, i2) <= 1.0
  assert index.get_similarity(i1, i1) == pytest.approx(1.0, abs=1e-5)


def test_brute_force_exactness(embeddings):
  """Brute force returns the true angular neighbors."""
  index = BruteForceEmbeddingsIndex(embeddings=embeddings)
  index.build()
  q = 17
  nns = index.get_nns_by_id(q, 10)
  normed = embeddings / np.linalg.norm(embeddings, axis=1, keepdims=True)
  cos = normed @ normed[q]
  expected = np.argsort(-cos)[:10].tolist()
  assert nns == expected
  assert nns[0] == q  # the item itself is its own nearest neighbor


def test_ann_recall_vs_exact(embeddings):
  """The RP forest recovers the true top-10 when allowed to inspect 20%
  of the catalog (random uniform vectors are the ANN worst case), and
  recall improves monotonically-ish with search_k."""
  exact = BruteForceEmbeddingsIndex(embeddings=embeddings)
  exact.build()

  def mean_recall(search_k):
    ann = AnnEmbeddingsIndex(embeddings=embeddings, n_trees=20,
                             search_k=search_k)
    ann.build()
    rng = np.random.default_rng(2)
    recalls = []
    for q in rng.integers(0, 1000, 30):
      truth = set(exact.get_nns_by_id(int(q), 10))
      got = set(ann.get_nns_by_id(int(q), 10))
      recalls.append(len(truth & got) / 10)
    return np.mean(recalls)

  low, high = mean_recall(200), mean_recall(2000)
  assert high >= 0.9
  assert high >= low


def test_include_distances(embeddings):
  index = AnnEmbeddingsIndex(embeddings=embeddings, include_distances=True)
  index.build()
  out = index.get_nns_by_id(5, 10)
  assert isinstance(out, dict) and len(out) == 10
  assert min(out.values()) >= 0.0
  assert out[5] == pytest.approx(0.0, abs=1e-5)


def test_id_map(embeddings):
  id_map = {f'item_{i}': i for i in range(len(embeddings))}
  index = BruteForceEmbeddingsIndex(embeddings=embeddings, id_map=id_map)
  index.build()
  nns = index.get_nns_by_id('item_42', 5)
  assert all(isinstance(i, str) and i.startswith('item_') for i in nns)
  assert nns[0] == 'item_42'


def test_memcache_wrapper(embeddings):
  class Counting(BruteForceEmbeddingsIndex):
    calls = 0

    def get_nns_by_id(self, embedding_id, n):
      Counting.calls += 1
      return super().get_nns_by_id(embedding_id, n)

  inner = Counting(embeddings=embeddings)
  inner.build()
  cached = MemCacheEmbeddingsIndex(inner)
  a = cached.get_nns_by_id(3, 5)
  b = cached.get_nns_by_id(3, 5)
  assert a == b and Counting.calls == 1
  assert cached.get_similarity(1, 2) == inner.get_similarity(1, 2)


def test_ann_batch_queries_match_single():
  """The threaded native batch search returns the same neighbors as
  per-item queries (deterministic forest, read-only search)."""
  rng = np.random.default_rng(5)
  emb = rng.normal(size=(300, 16)).astype(np.float32)
  index = AnnEmbeddingsIndex(embeddings=emb, n_trees=8)
  index.build()
  ids = [0, 17, 123, 299]
  batch = index.get_nns_by_ids(ids, 10)
  for i, lst in zip(ids, batch):
    single = index.get_nns_by_id(i, 10)
    np.testing.assert_array_equal(lst, single)

  embs = index.get_embeddings(ids)
  for row, i in zip(embs, ids):
    np.testing.assert_allclose(row, emb[i], rtol=1e-6)


def test_ann_mmap_load_and_resave(tmp_path):
  """v2 flat format: load is mmap-backed (no parse of tree vectors),
  queries identical, and a loaded index can be re-saved verbatim."""
  rng = np.random.default_rng(9)
  emb = rng.normal(size=(500, 24)).astype(np.float32)
  idx = AnnEmbeddingsIndex(embeddings=emb, n_trees=6)
  idx.build(index_file=str(tmp_path / 'a.index'))
  want = idx.get_nns_by_ids([0, 123, 499], 8)

  loaded = AnnEmbeddingsIndex(n_trees=6)
  loaded.load(str(tmp_path / 'a.index'))
  got = loaded.get_nns_by_ids([0, 123, 499], 8)
  for a, b in zip(want, got):
    np.testing.assert_array_equal(a, b)
  np.testing.assert_allclose(loaded.get_embeddings([7]), emb[7:8],
                             rtol=1e-6)

  # re-save from the mmapped index -> byte-identical file
  loaded._native.save(str(tmp_path / 'b.embeddings'))
  a_bytes = (tmp_path / 'a.index.embeddings').read_bytes()
  b_bytes = (tmp_path / 'b.embeddings').read_bytes()
  assert a_bytes == b_bytes


def test_memcache_batch_path_is_cached(embeddings):
  """get_nns_by_ids must consult/populate the memo cache: repeated
  evaluate() passes would otherwise re-run every ANN query."""
  class CountingBatch(BruteForceEmbeddingsIndex):
    batch_ids = []

    def get_nns_by_ids(self, ids, n):
      CountingBatch.batch_ids.append(list(ids))
      return super().get_nns_by_ids(ids, n)

  inner = CountingBatch(embeddings=embeddings)
  inner.build()
  cached = MemCacheEmbeddingsIndex(inner)
  first = cached.get_nns_by_ids([1, 2, 3], 4)
  second = cached.get_nns_by_ids([2, 3, 4], 4)
  assert CountingBatch.batch_ids == [[1, 2, 3], [4]]  # only misses hit
  assert [list(np.asarray(r)) for r in second[:2]] == \
         [list(np.asarray(r)) for r in first[1:]]


def test_get_embeddings_accepts_generator(embeddings):
  idx = BruteForceEmbeddingsIndex(embeddings=embeddings)
  idx.build()
  from recoder_tpu.embedding import EmbeddingsIndex
  got = EmbeddingsIndex.get_embeddings(idx, (i for i in (0, 1, 2)))
  assert got.shape == (3, embeddings.shape[1])


def test_ann_native_guard_rails(tmp_path, embeddings):
  """Native-layer hardening: double build is rejected, out-of-range
  ids raise instead of reading out of bounds, and a failed load leaves
  a working index fully intact."""
  import pytest

  from recoder_tpu.native.ann import AnnIndex as NativeIndex

  idx = NativeIndex(embeddings.shape[1])
  idx.add_items(embeddings)
  idx.build(4, seed=1)
  with pytest.raises(RuntimeError, match='built once'):
    idx.build(4, seed=1)

  with pytest.raises(IndexError):
    idx.get_nns_by_item(len(embeddings), 5)
  with pytest.raises(IndexError):
    idx.get_item_vector(-1)
  with pytest.raises(IndexError):
    idx.get_distance(0, len(embeddings) + 3)
  with pytest.raises(IndexError):
    idx.get_items([0, len(embeddings)])
  with pytest.raises(IndexError):
    idx.get_nns_batch([1, -2], 5)

  before = idx.get_nns_by_item(3, 5)
  bad = tmp_path / 'corrupt.ann'
  bad.write_bytes(b'NOTANINDEXNOTANINDEX' * 4)
  with pytest.raises(IOError):
    idx.load(str(bad))
  # the previously built index must still answer queries
  assert idx.get_nns_by_item(3, 5) == before


def test_memcache_n_change_not_stale(embeddings):
  """A later call with a different n must not return neighbor lists of
  the previously-cached length (cache is keyed on (id, n))."""
  inner = BruteForceEmbeddingsIndex(embeddings=embeddings)
  inner.build()
  cached = MemCacheEmbeddingsIndex(inner)
  assert len(cached.get_nns_by_id(3, 5)) == 5
  assert len(cached.get_nns_by_id(3, 2)) == 2
  batch5 = cached.get_nns_by_ids([1, 3], 5)
  batch3 = cached.get_nns_by_ids([1, 3], 3)
  assert [len(r) for r in batch5] == [5, 5]
  assert [len(r) for r in batch3] == [3, 3]
