// Reference-quality CPU HNSW comparator for the construction-parity harness
// (scripts/hnsw_parity.py). Independent re-implementation of the algorithm as
// published (Malkov & Yashunin, TPAMI 2018) with hnswlib's default semantics —
// the engine the reference wraps (USearch) and hnswlib both implement this
// algorithm with M0 = 2M, mult = 1/ln(M), diversity-heuristic neighbor selection,
// and reverse-edge heuristic rebuild on overflow. Used ONLY to benchmark whether
// wax_tpu/native/hnsw.cpp builds graphs of equal navigability; not shipped.
//
// Build: g++ -O3 -march=native -shared -fPIC -o librefhnsw.so ref_hnsw.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <queue>
#include <random>
#include <vector>

namespace {

struct P {
  float d;  // distance = 1 - cosine (smaller is better, hnswlib convention)
  int32_t n;
};
struct DLess {
  bool operator()(const P& a, const P& b) const { return a.d < b.d; }
};
struct DGreater {
  bool operator()(const P& a, const P& b) const { return a.d > b.d; }
};

struct RefHnsw {
  int dim, M, M0, efc;
  double mult;
  std::mt19937_64 rng;
  std::uniform_real_distribution<double> uni{0.0, 1.0};
  std::vector<float> vecs;
  std::vector<int> levels;
  // links[l][node] flat adjacency; level >= 1 stored in per-node maps for simplicity
  std::vector<std::vector<std::vector<int32_t>>> links;  // links[level][node]
  int32_t enterpoint = -1;
  int maxlevel = -1;

  RefHnsw(int dim_, int M_, int efc_, uint64_t seed)
      : dim(dim_), M(M_), M0(2 * M_), efc(efc_), mult(1.0 / std::log((double)M_)), rng(seed) {}

  const float* vec(int32_t i) const { return vecs.data() + (size_t)i * dim; }

  float dist(const float* a, const float* b) const {
    float s0 = 0, s1 = 0, s2 = 0, s3 = 0;
    int i = 0;
    for (; i + 4 <= dim; i += 4) {
      s0 += a[i] * b[i];
      s1 += a[i + 1] * b[i + 1];
      s2 += a[i + 2] * b[i + 2];
      s3 += a[i + 3] * b[i + 3];
    }
    for (; i < dim; ++i) s0 += a[i] * b[i];
    return 1.0f - ((s0 + s1) + (s2 + s3));
  }

  void ensure_level(int l) {
    while ((int)links.size() <= l) links.emplace_back();
  }
  std::vector<int32_t>& adj(int l, int32_t node) {
    auto& layer = links[l];
    if ((int32_t)layer.size() <= node) layer.resize(vecs.size() / dim);
    return layer[node];
  }

  // alg. 2: ef-bounded best-first over one layer
  std::priority_queue<P, std::vector<P>, DLess> search_layer(const float* q, int32_t ep,
                                                             int ef, int level,
                                                             std::vector<uint32_t>& visited,
                                                             uint32_t tag) {
    std::priority_queue<P, std::vector<P>, DLess> top;      // max-dist on top
    std::priority_queue<P, std::vector<P>, DGreater> cand;  // min-dist on top
    float d0 = dist(q, vec(ep));
    top.push({d0, ep});
    cand.push({d0, ep});
    visited[ep] = tag;
    float lower = d0;
    while (!cand.empty()) {
      P c = cand.top();
      if (c.d > lower && (int)top.size() >= ef) break;
      cand.pop();
      for (int32_t nb : adj(level, c.n)) {
        if (visited[nb] == tag) continue;
        visited[nb] = tag;
        float d = dist(q, vec(nb));
        if ((int)top.size() < ef || d < top.top().d) {
          cand.push({d, nb});
          top.push({d, nb});
          if ((int)top.size() > ef) top.pop();
          lower = top.top().d;
        }
      }
    }
    return top;
  }

  // alg. 4 / hnswlib getNeighborsByHeuristic2: diversity prune, no fill
  void heuristic(std::vector<P>& cands, int mm) {
    if ((int)cands.size() <= mm) return;
    std::sort(cands.begin(), cands.end(), [](const P& a, const P& b) { return a.d < b.d; });
    std::vector<P> out;
    for (const P& c : cands) {
      if ((int)out.size() >= mm) break;
      bool good = true;
      for (const P& o : out) {
        if (dist(vec(c.n), vec(o.n)) < c.d) {
          good = false;
          break;
        }
      }
      if (good) out.push_back(c);
    }
    cands.swap(out);
  }

  void add(const float* v_in) {
    int32_t cur = (int32_t)(vecs.size() / dim);
    // normalize
    float n = 0;
    for (int i = 0; i < dim; ++i) n += v_in[i] * v_in[i];
    n = std::sqrt(n);
    for (int i = 0; i < dim; ++i) vecs.push_back(n > 0 ? v_in[i] / n : v_in[i]);

    int l = (int)(-std::log(std::max(uni(rng), 1e-12)) * mult);
    levels.push_back(l);
    ensure_level(l);
    if (enterpoint < 0) {
      enterpoint = cur;
      maxlevel = l;
      return;
    }
    const float* q = vec(cur);
    int32_t ep = enterpoint;
    // greedy descent above the element's level
    for (int lev = maxlevel; lev > l; --lev) {
      bool changed = true;
      float dcur = dist(q, vec(ep));
      while (changed) {
        changed = false;
        for (int32_t nb : adj(lev, ep)) {
          float d = dist(q, vec(nb));
          if (d < dcur) {
            dcur = d;
            ep = nb;
            changed = true;
          }
        }
      }
    }
    static thread_local std::vector<uint32_t> visited;
    static thread_local uint32_t tag = 0;
    visited.assign(vecs.size() / dim, 0);
    for (int lev = std::min(l, maxlevel); lev >= 0; --lev) {
      ++tag;
      if (tag == 0) tag = 1;
      auto top = search_layer(q, ep, efc, lev, visited, tag);
      std::vector<P> cands;
      cands.reserve(top.size());
      while (!top.empty()) {
        cands.push_back(top.top());
        top.pop();
      }
      int mm = M;  // hnswlib connects M at every level, including 0
      std::vector<P> sel = cands;
      heuristic(sel, mm);
      int cap = lev == 0 ? M0 : M;
      auto& mine = adj(lev, cur);
      for (const P& s : sel) {
        mine.push_back(s.n);
        auto& theirs = adj(lev, s.n);
        theirs.push_back(cur);
        if ((int)theirs.size() > cap) {
          std::vector<P> rebuilt;
          rebuilt.reserve(theirs.size());
          const float* tv = vec(s.n);
          for (int32_t x : theirs) rebuilt.push_back({dist(tv, vec(x)), x});
          heuristic(rebuilt, cap);
          theirs.clear();
          for (const P& r : rebuilt) theirs.push_back(r.n);
        }
      }
      // next level entry: closest candidate (hnswlib uses the nearest found)
      if (!sel.empty()) ep = sel[0].n;
    }
    if (l > maxlevel) {
      maxlevel = l;
      enterpoint = cur;
    }
  }

  void search(const float* q_in, int k, int ef, int64_t* out) {
    for (int i = 0; i < k; ++i) out[i] = -1;
    if (enterpoint < 0) return;
    std::vector<float> q(q_in, q_in + dim);
    float n = 0;
    for (float x : q) n += x * x;
    n = std::sqrt(n);
    if (n > 0)
      for (float& x : q) x /= n;
    int32_t ep = enterpoint;
    float dcur = dist(q.data(), vec(ep));
    for (int lev = maxlevel; lev >= 1; --lev) {
      bool changed = true;
      while (changed) {
        changed = false;
        for (int32_t nb : adj(lev, ep)) {
          float d = dist(q.data(), vec(nb));
          if (d < dcur) {
            dcur = d;
            ep = nb;
            changed = true;
          }
        }
      }
    }
    static thread_local std::vector<uint32_t> visited;
    static thread_local uint32_t tag = 0;
    visited.assign(vecs.size() / dim, 0);
    ++tag;
    if (tag == 0) tag = 1;
    auto top = search_layer(q.data(), ep, std::max(ef, k), 0, visited, tag);
    std::vector<P> res;
    res.reserve(top.size());
    while (!top.empty()) {
      res.push_back(top.top());
      top.pop();
    }
    std::sort(res.begin(), res.end(), [](const P& a, const P& b) { return a.d < b.d; });
    for (int i = 0; i < k && i < (int)res.size(); ++i) out[i] = res[i].n;
  }
};

}  // namespace

extern "C" {
void* ref_hnsw_create(int dim, int M, int efc, uint64_t seed) {
  return new RefHnsw(dim, M, efc, seed);
}
void ref_hnsw_free(void* h) { delete (RefHnsw*)h; }
void ref_hnsw_add_batch(void* h, int64_t n, const float* vecs) {
  RefHnsw* g = (RefHnsw*)h;
  for (int64_t i = 0; i < n; ++i) g->add(vecs + (size_t)i * g->dim);
}
void ref_hnsw_search_batch(void* h, int64_t nq, const float* qs, int k, int ef, int64_t* out) {
  RefHnsw* g = (RefHnsw*)h;
  for (int64_t i = 0; i < nq; ++i) g->search(qs + (size_t)i * g->dim, k, ef, out + (size_t)i * k);
}
}
