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

#include <atomic>
#include <cstdint>
#include <cstdlib>
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

// ---------------------------------------------------------------------------
// Deterministic speculative parallelism (the reference parallelizes the
// exists-edge / skip-offset scan with rayon's find_map_any,
// safa.rs:377-382; find_map_any returns an arbitrary success).  Here the
// root node's (edge, offset) candidates are explored by a worker pool, but
// the SELECTED solution is the lowest-index successful candidate — i.e.
// exactly the one the sequential solver would return, keeping the trace
// bit-identical to the Python oracle while failures (the expensive part of
// adversarial backtracking workloads) burn in parallel.
// ---------------------------------------------------------------------------

struct Candidate {
  int32_t eidx;
  int64_t off;     // cursor advance (chars: 1)
};

struct ParShared {
  const Graph* g;
  const std::vector<Candidate>* cands;
  std::atomic<int64_t> next;
  std::atomic<int64_t> best;              // lowest successful index
  std::vector<int> status;                // 0 unexplored, 1 ok, 2 fail
  std::vector<std::vector<TraceElem>> results;
};

void* par_worker(void* p) {
  ParShared* sh = (ParShared*)p;
  Solver s;                                // thread-local memo
  s.g = sh->g;
  const Graph& g = *sh->g;
  int64_t n = (int64_t)sh->cands->size();
  while (true) {
    int64_t i = sh->next.fetch_add(1);
    if (i >= n || i > sh->best.load()) break;
    const Candidate& c = (*sh->cands)[i];
    const Edge& e = g.edges[c.eidx];
    std::vector<TraceElem> acc;
    acc.push_back({0, c.eidx, e.dst, 0, c.off});
    bool ok = s.solve_rec(e.dst, c.off, acc);
    if (ok) {
      sh->results[i] = std::move(acc);
      sh->status[i] = 1;
      int64_t cur = sh->best.load();
      while (i < cur && !sh->best.compare_exchange_weak(cur, i)) {
      }
    } else {
      sh->status[i] = 2;
    }
  }
  return nullptr;
}

bool root_candidates(const Graph& g, std::vector<Candidate>& out) {
  if (g.is_and[0] || g.doc_len == 0) return false;
  for (int32_t e = g.edge_start[0]; e < g.edge_start[1]; e++) {
    const Edge& ed = g.edges[e];
    if (ed.self_nil) continue;
    if (ed.kind == 0) {
      if (g.sink != ed.dst && g.doc_len > 0 && g.doc[0] == ed.chr)
        out.push_back({e, 1});
    } else {
      for (int32_t r = ed.range_lo; r < ed.range_hi; r++) {
        int64_t lo = g.r_start[r];
        int64_t hi = g.r_end[r] < 0 ? g.doc_len : g.r_end[r];
        if (hi > g.doc_len) hi = g.doc_len;
        for (int64_t off = lo; off <= hi; off++) out.push_back({e, off});
      }
    }
  }
  return out.size() >= 2;
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

  int n_threads = 4;
  if (const char* t = getenv("REEF_SOLVER_THREADS")) n_threads = atoi(t);
  std::vector<Candidate> cands;
  if (n_threads > 1 && root_candidates(job.g, cands)) {
    ParShared sh;
    sh.g = &job.g;
    sh.cands = &cands;
    sh.next.store(0);
    sh.best.store((int64_t)cands.size());
    sh.status.assign(cands.size(), 0);
    sh.results.resize(cands.size());
    if ((size_t)n_threads > cands.size()) n_threads = (int)cands.size();
    std::vector<pthread_t> ths(n_threads);
    for (int t = 0; t < n_threads; t++)
      pthread_create(&ths[t], &attr, par_worker, &sh);
    for (int t = 0; t < n_threads; t++) pthread_join(ths[t], nullptr);
    for (size_t i = 0; i < cands.size(); i++) {
      if (sh.status[i] == 1) {
        job.result = std::move(sh.results[i]);
        job.ok = 1;
        break;
      }
      if (sh.status[i] == 0) break;  // unexplored => no earlier success
    }
  } else {
    pthread_t th;
    pthread_create(&th, &attr, run_job, &job);
    pthread_join(th, nullptr);
  }
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
