// Native SAFA solver: memoized backtracking search over the automaton.
//
// Plays the role of the reference's rayon-parallel solver
// (/root/reference/src/frontend/safa.rs:353-492): finds a matching Trace for
// (SAFA, doc).  The Python frontend flattens the graph into arrays; this
// solver mirrors reef_tpu.frontend.safa.SAFA._solve_rec semantics exactly
// (forall joins sorted by target node, failure memoization on (node, cursor),
// first-match-wins edge order) so either implementation can produce the
// witness trace.
//
// Exposed via a C ABI for ctypes; runs the search on a dedicated thread with
// a large stack (deep char chains recurse O(doc)).

#include <cstdint>
#include <cstring>
#include <pthread.h>
#include <unordered_set>
#include <vector>
#include <algorithm>

namespace {

struct Edge {
  int32_t dst;
  int32_t kind;       // 0 = char, 1 = skip
  int32_t chr;        // char code if kind==0
  int32_t range_lo;   // index into ranges arrays
  int32_t range_hi;   // one past last range
  int32_t self_nil;   // skip edge that is a self epsilon loop (excluded in
                      // exists-traversal, kept for forall iteration)
};

struct TraceElem {
  int32_t from_node, edge_idx, to_node;
  int64_t from_cur, to_cur;
};

struct Graph {
  int32_t n_nodes;
  const uint8_t* is_and;      // quantifier flag per node
  const uint8_t* accepting;
  int32_t sink;               // -1 if none
  // CSR edges
  const int32_t* edge_start;  // n_nodes + 1
  const Edge* edges;
  // skip ranges
  const int64_t* r_start;
  const int64_t* r_end;       // -1 = open
  const int32_t* doc;
  int64_t doc_len;
};

struct Solver {
  const Graph* g;
  std::unordered_set<int64_t> failed;  // (node, cursor) memo
  std::vector<TraceElem> out;

  bool is_sink(int32_t n) const { return g->sink == n; }

  bool solve_edge(int32_t eidx, int32_t from, int64_t i,
                  std::vector<TraceElem>& acc) {
    const Edge& e = g->edges[eidx];
    if (e.kind == 0) {
      if (is_sink(e.dst)) return false;
      if (i < g->doc_len && g->doc[i] == e.chr) {
        size_t mark = acc.size();
        acc.push_back({from, eidx, e.dst, i, i + 1});
        if (solve_rec(e.dst, i + 1, acc)) return true;
        acc.resize(mark);
      }
      return false;
    }
    // skip edge: try offsets in increasing order across ranges
    for (int32_t r = e.range_lo; r < e.range_hi; r++) {
      int64_t lo = g->r_start[r];
      int64_t hi = g->r_end[r] < 0 ? g->doc_len - i : g->r_end[r];
      if (hi > g->doc_len - i) hi = g->doc_len - i;
      for (int64_t off = lo; off <= hi; off++) {
        size_t mark = acc.size();
        acc.push_back({from, eidx, e.dst, i, i + off});
        if (solve_rec(e.dst, i + off, acc)) return true;
        acc.resize(mark);
      }
    }
    return false;
  }

  bool solve_rec(int32_t n, int64_t i, std::vector<TraceElem>& acc) {
    if (g->accepting[n] && i == g->doc_len) return true;
    if (i >= g->doc_len || is_sink(n)) return false;
    int64_t key = (int64_t)n * (g->doc_len + 2) + i;
    if (failed.count(key)) return false;

    if (g->is_and[n]) {
      // all outgoing edges must have solutions; join sorted by first-elem
      // target (mirrors Trace ordering, trace.rs:52-62)
      std::vector<std::vector<TraceElem>> subs;
      for (int32_t e = g->edge_start[n]; e < g->edge_start[n + 1]; e++) {
        std::vector<TraceElem> sub;
        if (!solve_edge(e, n, i, sub)) {
          failed.insert(key);
          return false;
        }
        subs.push_back(std::move(sub));
      }
      std::stable_sort(subs.begin(), subs.end(),
                       [](const std::vector<TraceElem>& a,
                          const std::vector<TraceElem>& b) {
                         // lexicographic over to_node sequences (mirrors the
                         // Python solver's sort key)
                         size_t n = std::min(a.size(), b.size());
                         for (size_t k = 0; k < n; k++) {
                           if (a[k].to_node != b[k].to_node)
                             return a[k].to_node < b[k].to_node;
                         }
                         return a.size() < b.size();
                       });
      for (auto& s : subs)
        for (auto& t : s) acc.push_back(t);
      return true;
    }
    for (int32_t e = g->edge_start[n]; e < g->edge_start[n + 1]; e++) {
      if (g->edges[e].self_nil) continue;  // skip self epsilon loop
      if (solve_edge(e, n, i, acc)) return true;
    }
    failed.insert(key);
    return false;
  }
};

struct Job {
  Graph g;
  std::vector<TraceElem> result;
  int ok;
};

void* run_job(void* p) {
  Job* job = (Job*)p;
  Solver s;
  s.g = &job->g;
  std::vector<TraceElem> acc;
  job->ok = s.solve_rec(0, 0, acc) ? 1 : 0;
  job->result = std::move(acc);
  return nullptr;
}

}  // namespace

extern "C" {

// returns number of trace elements (>=0) on match, -1 on no-match,
// -2 if out_cap too small (call again with a bigger buffer)
int64_t safa_solve(int32_t n_nodes, const uint8_t* is_and,
                   const uint8_t* accepting, int32_t sink,
                   const int32_t* edge_start, const int32_t* edge_data,
                   int32_t n_edges, const int64_t* r_start,
                   const int64_t* r_end, const int32_t* doc, int64_t doc_len,
                   int32_t* out_from, int32_t* out_edge, int32_t* out_to,
                   int64_t* out_fc, int64_t* out_tc, int64_t out_cap) {
  Job job;
  job.g.n_nodes = n_nodes;
  job.g.is_and = is_and;
  job.g.accepting = accepting;
  job.g.sink = sink;
  job.g.edge_start = edge_start;
  job.g.edges = (const Edge*)edge_data;
  job.g.r_start = r_start;
  job.g.r_end = r_end;
  job.g.doc = doc;
  job.g.doc_len = doc_len;
  job.ok = 0;
  (void)n_edges;

  pthread_attr_t attr;
  pthread_attr_init(&attr);
  pthread_attr_setstacksize(&attr, (size_t)1 << 30);  // 1 GiB: deep chains
  pthread_t th;
  pthread_create(&th, &attr, run_job, &job);
  pthread_join(th, nullptr);
  pthread_attr_destroy(&attr);

  if (!job.ok) return -1;
  if ((int64_t)job.result.size() > out_cap) return -2;
  for (size_t k = 0; k < job.result.size(); k++) {
    out_from[k] = job.result[k].from_node;
    out_edge[k] = job.result[k].edge_idx;
    out_to[k] = job.result[k].to_node;
    out_fc[k] = job.result[k].from_cur;
    out_tc[k] = job.result[k].to_cur;
  }
  return (int64_t)job.result.size();
}
}
