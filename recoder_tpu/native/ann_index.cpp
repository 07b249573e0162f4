// Random-projection-forest approximate-nearest-neighbor index
// (angular metric), the native backend of
// recoder_tpu.embedding.AnnEmbeddingsIndex.
//
// Same capability class as the annoy library the reference consumes
// (reference embedding.py:92-159): a forest of random-hyperplane
// trees over item embeddings, searched best-first with a shared
// priority queue, candidates re-ranked exactly by angular distance
// d = sqrt(2 - 2*cos). Built from scratch for this framework; exposed
// to Python through a C ABI + ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libann_index.so ann_index.cpp -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Node {
  // leaf: left == -1, items holds ids. internal: plane_off into planes,
  // children in left/right.
  int32_t left = -1;
  int32_t right = -1;
  int64_t plane_off = -1;
  std::vector<int32_t> items;
};

struct Tree {
  std::vector<Node> nodes;
  std::vector<float> planes;  // dim floats per internal node
  int32_t root = 0;
};

class AnnIndex {
 public:
  explicit AnnIndex(int dim) : dim_(dim) {}

  void AddItems(const float* data, int n) {
    size_t old = items_.size();
    items_.resize(old + static_cast<size_t>(n) * dim_);
    std::memcpy(items_.data() + old, data, sizeof(float) * n * dim_);
    // maintain unit-norm copies for angular math
    norms_.resize(old + static_cast<size_t>(n) * dim_);
    for (int i = 0; i < n; ++i) {
      const float* v = data + static_cast<size_t>(i) * dim_;
      float* o = norms_.data() + old + static_cast<size_t>(i) * dim_;
      double s = 0;
      for (int d = 0; d < dim_; ++d) s += double(v[d]) * v[d];
      float inv = s > 0 ? float(1.0 / std::sqrt(s)) : 0.f;
      for (int d = 0; d < dim_; ++d) o[d] = v[d] * inv;
    }
    n_items_ += n;
  }

  void Build(int n_trees, uint32_t seed, int leaf_size) {
    trees_.assign(n_trees, Tree{});
    leaf_size_ = leaf_size > 0 ? leaf_size : std::max(8, dim_ / 4);
    unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    unsigned workers = std::min<unsigned>(hw, n_trees);
    std::vector<std::thread> pool;
    std::atomic<int> next{0};
    for (unsigned w = 0; w < workers; ++w) {
      pool.emplace_back([&, w] {
        for (;;) {
          int t = next.fetch_add(1);
          if (t >= n_trees) return;
          std::mt19937 rng(seed + 0x9e3779b9u * (t + 1));
          std::vector<int32_t> all(n_items_);
          for (int i = 0; i < n_items_; ++i) all[i] = i;
          BuildTree(trees_[t], all, rng);
        }
      });
    }
    for (auto& th : pool) th.join();
  }

  // best-first search across all trees with a shared priority queue
  int GetNnsByVector(const float* query, int n, int search_k,
                     int32_t* out_ids, float* out_dists) const {
    if (search_k <= 0) search_k = n * std::max<size_t>(trees_.size(), 1);
    std::vector<float> q(dim_);
    double s = 0;
    for (int d = 0; d < dim_; ++d) s += double(query[d]) * query[d];
    float inv = s > 0 ? float(1.0 / std::sqrt(s)) : 0.f;
    for (int d = 0; d < dim_; ++d) q[d] = query[d] * inv;

    // (priority = min margin along path, tree, node)
    using Entry = std::tuple<float, int32_t, int32_t>;
    std::priority_queue<Entry> pq;
    for (size_t t = 0; t < trees_.size(); ++t)
      pq.emplace(std::numeric_limits<float>::infinity(), int32_t(t),
                 trees_[t].root);

    std::vector<int32_t> candidates;
    candidates.reserve(search_k * 2);
    int visited = 0;
    while (!pq.empty() && visited < search_k) {
      auto [prio, t, ni] = pq.top();
      pq.pop();
      const Tree& tree = trees_[t];
      const Node& node = tree.nodes[ni];
      if (node.left < 0) {
        candidates.insert(candidates.end(), node.items.begin(),
                          node.items.end());
        visited += int(node.items.size());
      } else {
        const float* plane = tree.planes.data() + node.plane_off;
        double dot = 0;
        for (int d = 0; d < dim_; ++d) dot += double(plane[d]) * q[d];
        float margin = float(dot);
        pq.emplace(std::min(prio, std::max(margin, 0.f)), t, node.right);
        pq.emplace(std::min(prio, std::max(-margin, 0.f)), t, node.left);
      }
    }

    std::sort(candidates.begin(), candidates.end());
    candidates.erase(std::unique(candidates.begin(), candidates.end()),
                     candidates.end());

    // exact re-rank by angular distance
    std::vector<std::pair<float, int32_t>> scored;
    scored.reserve(candidates.size());
    for (int32_t id : candidates) {
      const float* v = norms_.data() + size_t(id) * dim_;
      double dot = 0;
      for (int d = 0; d < dim_; ++d) dot += double(v[d]) * q[d];
      float dist = std::sqrt(std::max(0.0, 2.0 - 2.0 * dot));
      scored.emplace_back(dist, id);
    }
    int k = std::min<int>(n, int(scored.size()));
    std::partial_sort(scored.begin(), scored.begin() + k, scored.end());
    for (int i = 0; i < k; ++i) {
      out_ids[i] = scored[i].second;
      out_dists[i] = scored[i].first;
    }
    return k;
  }

  int GetNnsByItem(int item, int n, int search_k, int32_t* out_ids,
                   float* out_dists) const {
    return GetNnsByVector(items_.data() + size_t(item) * dim_, n, search_k,
                          out_ids, out_dists);
  }

  float GetDistance(int i, int j) const {
    const float* a = norms_.data() + size_t(i) * dim_;
    const float* b = norms_.data() + size_t(j) * dim_;
    double dot = 0;
    for (int d = 0; d < dim_; ++d) dot += double(a[d]) * b[d];
    return std::sqrt(std::max(0.0, 2.0 - 2.0 * dot));
  }

  void GetItem(int i, float* out) const {
    std::memcpy(out, items_.data() + size_t(i) * dim_, sizeof(float) * dim_);
  }

  int n_items() const { return n_items_; }
  int dim() const { return dim_; }

  bool Save(const char* path) const {
    FILE* f = std::fopen(path, "wb");
    if (!f) return false;
    auto w32 = [&](int32_t v) { std::fwrite(&v, 4, 1, f); };
    auto w64 = [&](int64_t v) { std::fwrite(&v, 8, 1, f); };
    w32(0x414E4E31);  // magic "ANN1"
    w32(dim_);
    w32(n_items_);
    w32(int32_t(trees_.size()));
    std::fwrite(items_.data(), sizeof(float), items_.size(), f);
    for (const Tree& t : trees_) {
      w32(t.root);
      w64(int64_t(t.planes.size()));
      std::fwrite(t.planes.data(), sizeof(float), t.planes.size(), f);
      w64(int64_t(t.nodes.size()));
      for (const Node& nd : t.nodes) {
        w32(nd.left);
        w32(nd.right);
        w64(nd.plane_off);
        w64(int64_t(nd.items.size()));
        std::fwrite(nd.items.data(), 4, nd.items.size(), f);
      }
    }
    std::fclose(f);
    return true;
  }

  bool Load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    auto r32 = [&]() { int32_t v = 0; if (std::fread(&v, 4, 1, f) != 1) v = -1; return v; };
    auto r64 = [&]() { int64_t v = 0; if (std::fread(&v, 8, 1, f) != 1) v = -1; return v; };
    if (r32() != 0x414E4E31) { std::fclose(f); return false; }
    int dim = r32();
    if (dim != dim_) { std::fclose(f); return false; }
    n_items_ = r32();
    int n_trees = r32();
    items_.resize(size_t(n_items_) * dim_);
    if (std::fread(items_.data(), sizeof(float), items_.size(), f)
        != items_.size()) { std::fclose(f); return false; }
    // rebuild unit-norm copies
    norms_.resize(items_.size());
    for (int i = 0; i < n_items_; ++i) {
      const float* v = items_.data() + size_t(i) * dim_;
      float* o = norms_.data() + size_t(i) * dim_;
      double s = 0;
      for (int d = 0; d < dim_; ++d) s += double(v[d]) * v[d];
      float inv = s > 0 ? float(1.0 / std::sqrt(s)) : 0.f;
      for (int d = 0; d < dim_; ++d) o[d] = v[d] * inv;
    }
    trees_.assign(n_trees, Tree{});
    for (Tree& t : trees_) {
      t.root = r32();
      t.planes.resize(size_t(r64()));
      if (!t.planes.empty() &&
          std::fread(t.planes.data(), sizeof(float), t.planes.size(), f)
              != t.planes.size()) { std::fclose(f); return false; }
      t.nodes.resize(size_t(r64()));
      for (Node& nd : t.nodes) {
        nd.left = r32();
        nd.right = r32();
        nd.plane_off = r64();
        nd.items.resize(size_t(r64()));
        if (!nd.items.empty() &&
            std::fread(nd.items.data(), 4, nd.items.size(), f)
                != nd.items.size()) { std::fclose(f); return false; }
      }
    }
    std::fclose(f);
    return true;
  }

 private:
  void BuildTree(Tree& tree, std::vector<int32_t>& ids, std::mt19937& rng) {
    tree.root = BuildNode(tree, ids, rng, 0);
  }

  int32_t BuildNode(Tree& tree, std::vector<int32_t>& ids, std::mt19937& rng,
                    int depth) {
    int32_t me = int32_t(tree.nodes.size());
    tree.nodes.emplace_back();
    if (int(ids.size()) <= leaf_size_ || depth > 50) {
      tree.nodes[me].items = ids;
      return me;
    }

    // split plane via two-means: seed two random centroids, refine on a
    // sample by assigning points to the closer centroid and averaging
    // (the split heuristic annoy's angular trees use), then take the
    // normalized centroid difference as the hyperplane
    std::uniform_int_distribution<size_t> pick(0, ids.size() - 1);
    std::vector<float> plane(dim_);
    bool ok = false;
    for (int attempt = 0; attempt < 5 && !ok; ++attempt) {
      const float* a0 = norms_.data() + size_t(ids[pick(rng)]) * dim_;
      const float* b0 = norms_.data() + size_t(ids[pick(rng)]) * dim_;
      std::vector<float> c0(a0, a0 + dim_);
      std::vector<float> c1(b0, b0 + dim_);

      const int kIters = 3;
      const size_t kSample = std::min<size_t>(ids.size(), 256);
      std::vector<float> n0(dim_), n1(dim_);
      for (int it = 0; it < kIters; ++it) {
        std::fill(n0.begin(), n0.end(), 0.f);
        std::fill(n1.begin(), n1.end(), 0.f);
        int cnt0 = 0, cnt1 = 0;
        for (size_t k = 0; k < kSample; ++k) {
          const float* v = norms_.data() + size_t(ids[pick(rng)]) * dim_;
          double d0 = 0, d1 = 0;
          for (int d = 0; d < dim_; ++d) {
            double e0 = v[d] - c0[d], e1 = v[d] - c1[d];
            d0 += e0 * e0;
            d1 += e1 * e1;
          }
          float* acc = d0 < d1 ? n0.data() : n1.data();
          (d0 < d1 ? cnt0 : cnt1)++;
          for (int d = 0; d < dim_; ++d) acc[d] += v[d];
        }
        if (cnt0 == 0 || cnt1 == 0) break;
        for (int d = 0; d < dim_; ++d) {
          c0[d] = n0[d] / cnt0;
          c1[d] = n1[d] / cnt1;
        }
      }

      double s = 0;
      for (int d = 0; d < dim_; ++d) {
        plane[d] = c0[d] - c1[d];
        s += double(plane[d]) * plane[d];
      }
      if (s > 1e-12) {
        float inv = float(1.0 / std::sqrt(s));
        for (int d = 0; d < dim_; ++d) plane[d] *= inv;
        ok = true;
      }
    }
    if (!ok) {  // all duplicates: random gaussian plane
      std::normal_distribution<float> g;
      double s = 0;
      for (int d = 0; d < dim_; ++d) { plane[d] = g(rng); s += double(plane[d]) * plane[d]; }
      float inv = float(1.0 / std::sqrt(std::max(s, 1e-12)));
      for (int d = 0; d < dim_; ++d) plane[d] *= inv;
    }

    std::vector<int32_t> left, right;
    left.reserve(ids.size() / 2);
    right.reserve(ids.size() / 2);
    for (int32_t id : ids) {
      const float* v = norms_.data() + size_t(id) * dim_;
      double dot = 0;
      for (int d = 0; d < dim_; ++d) dot += double(plane[d]) * v[d];
      (dot > 0 ? right : left).push_back(id);
    }
    // degenerate split: randomize
    if (left.empty() || right.empty()) {
      left.clear();
      right.clear();
      std::bernoulli_distribution coin(0.5);
      for (int32_t id : ids) (coin(rng) ? right : left).push_back(id);
    }

    int64_t plane_off = int64_t(tree.planes.size());
    tree.planes.insert(tree.planes.end(), plane.begin(), plane.end());

    ids.clear();
    ids.shrink_to_fit();
    int32_t l = BuildNode(tree, left, rng, depth + 1);
    int32_t r = BuildNode(tree, right, rng, depth + 1);
    tree.nodes[me].left = l;
    tree.nodes[me].right = r;
    tree.nodes[me].plane_off = plane_off;
    return me;
  }

  int dim_;
  int n_items_ = 0;
  int leaf_size_ = 32;
  std::vector<float> items_;
  std::vector<float> norms_;
  std::vector<Tree> trees_;
};

}  // namespace

extern "C" {

void* ann_create(int dim) { return new AnnIndex(dim); }
void ann_free(void* p) { delete static_cast<AnnIndex*>(p); }

void ann_add_items(void* p, const float* data, int n) {
  static_cast<AnnIndex*>(p)->AddItems(data, n);
}

void ann_build(void* p, int n_trees, uint32_t seed, int leaf_size) {
  static_cast<AnnIndex*>(p)->Build(n_trees, seed, leaf_size);
}

int ann_save(void* p, const char* path) {
  return static_cast<AnnIndex*>(p)->Save(path) ? 1 : 0;
}

int ann_load(void* p, const char* path) {
  return static_cast<AnnIndex*>(p)->Load(path) ? 1 : 0;
}

int ann_n_items(void* p) { return static_cast<AnnIndex*>(p)->n_items(); }
int ann_dim(void* p) { return static_cast<AnnIndex*>(p)->dim(); }

void ann_get_item(void* p, int i, float* out) {
  static_cast<AnnIndex*>(p)->GetItem(i, out);
}

int ann_get_nns_by_item(void* p, int item, int n, int search_k,
                        int32_t* out_ids, float* out_dists) {
  return static_cast<AnnIndex*>(p)->GetNnsByItem(item, n, search_k,
                                                 out_ids, out_dists);
}

int ann_get_nns_by_vector(void* p, const float* vec, int n, int search_k,
                          int32_t* out_ids, float* out_dists) {
  return static_cast<AnnIndex*>(p)->GetNnsByVector(vec, n, search_k,
                                                   out_ids, out_dists);
}

// Batched multi-query search over a worker pool. out_ids/out_dists are
// [m, n] row-major; out_counts[i] holds the number of valid entries in
// row i (trailing slots untouched). Search is read-only, so workers
// share the index without locks.
void ann_get_nns_batch(void* p, const int32_t* items, int m, int n,
                       int search_k, int n_threads, int32_t* out_ids,
                       float* out_dists, int32_t* out_counts) {
  AnnIndex* index = static_cast<AnnIndex*>(p);
  if (n_threads <= 0)
    n_threads = int(std::max(1u, std::thread::hardware_concurrency()));
  n_threads = std::max(1, std::min(n_threads, m));
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= m) return;
      out_counts[i] = index->GetNnsByItem(
          items[i], n, search_k, out_ids + size_t(i) * n,
          out_dists + size_t(i) * n);
    }
  };
  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// Bulk row fetch: out is [m, dim] row-major.
void ann_get_items(void* p, const int32_t* ids, int m, float* out) {
  AnnIndex* index = static_cast<AnnIndex*>(p);
  int dim = index->dim();
  for (int i = 0; i < m; ++i)
    index->GetItem(ids[i], out + size_t(i) * dim);
}

float ann_get_distance(void* p, int i, int j) {
  return static_cast<AnnIndex*>(p)->GetDistance(i, j);
}

}  // extern "C"
