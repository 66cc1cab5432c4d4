// Native graph core: topological scheduler + liveness analysis.
//
// C++ reimplementation of the reference's graph scheduling machinery
// (reference src/core/graph.cc:152-182 topo_sort; graph.cc:341-560
// ref-count liveness used by dataMalloc). The Python Graph delegates here
// for large graphs; edges are derived natively from the op->tensor CSR so
// the host-language cost is one array marshal, not an O(E) Python loop.
//
// Exposed through a C ABI (ctypes); see infinitensor_tpu/native/__init__.py.

#include <cstdint>
#include <deque>
#include <vector>

extern "C" {

// Kahn topological sort (FIFO ready queue -> stable, deterministic order).
//
//   n_ops / n_tensors: counts
//   in_ptr[n_ops+1], in_idx[]:  CSR of op -> input tensor indices
//   out_ptr[n_ops+1], out_idx[]: CSR of op -> output tensor indices
//   order_out[n_ops]: sorted op indices (valid prefix on cycle)
//
// Returns the number of ops sorted; < n_ops means the remainder form a
// cycle (the reference raises with the offending op list; callers diff
// order_out against all ops to produce the same diagnostic).
int64_t graph_topo_sort(int64_t n_ops, int64_t n_tensors,
                        const int64_t* in_ptr, const int64_t* in_idx,
                        const int64_t* out_ptr, const int64_t* out_idx,
                        int64_t* order_out) {
  // producer[t] = op that outputs tensor t (-1 = graph input/weight)
  std::vector<int64_t> producer(n_tensors, -1);
  for (int64_t op = 0; op < n_ops; ++op)
    for (int64_t j = out_ptr[op]; j < out_ptr[op + 1]; ++j)
      producer[out_idx[j]] = op;

  // indegree = number of *distinct* predecessor ops (matches the reference,
  // which counts unique preds once, src/core/graph.cc:160-168)
  std::vector<int64_t> indegree(n_ops, 0);
  std::vector<std::vector<int64_t>> succs(n_ops);
  std::vector<int64_t> seen_mark(n_ops, -1);
  for (int64_t op = 0; op < n_ops; ++op) {
    for (int64_t j = in_ptr[op]; j < in_ptr[op + 1]; ++j) {
      int64_t p = producer[in_idx[j]];
      if (p >= 0 && p != op && seen_mark[p] != op) {
        seen_mark[p] = op;
        ++indegree[op];
        succs[p].push_back(op);
      }
    }
  }

  std::deque<int64_t> ready;
  for (int64_t op = 0; op < n_ops; ++op)
    if (indegree[op] == 0) ready.push_back(op);

  int64_t n_sorted = 0;
  while (!ready.empty()) {
    int64_t op = ready.front();
    ready.pop_front();
    order_out[n_sorted++] = op;
    for (int64_t s : succs[op])
      if (--indegree[s] == 0) ready.push_back(s);
  }
  return n_sorted;
}

// Liveness: first defining op and last consuming op per tensor, in schedule
// order (the inputs to activation memory planning; reference ref-count
// freeing in graph.cc:341-560). order[] maps schedule position -> op index.
void graph_liveness(int64_t n_ops, int64_t n_tensors, const int64_t* order,
                    const int64_t* in_ptr, const int64_t* in_idx,
                    const int64_t* out_ptr, const int64_t* out_idx,
                    int64_t* first_def_out, int64_t* last_use_out) {
  for (int64_t t = 0; t < n_tensors; ++t) {
    first_def_out[t] = -1;
    last_use_out[t] = -1;
  }
  for (int64_t pos = 0; pos < n_ops; ++pos) {
    int64_t op = order[pos];
    for (int64_t j = out_ptr[op]; j < out_ptr[op + 1]; ++j)
      if (first_def_out[out_idx[j]] < 0) first_def_out[out_idx[j]] = pos;
    for (int64_t j = in_ptr[op]; j < in_ptr[op + 1]; ++j)
      last_use_out[in_idx[j]] = pos;
  }
}

// FNV-1a over an int64 workload vector (reference include/core/hash.h,
// OperatorObj::getOpPerfKey) — the perf-cache key hash.
uint64_t workload_hash(const int64_t* data, int64_t n) {
  uint64_t h = 0xCBF29CE484222325ULL;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t v = static_cast<uint64_t>(data[i]);
    for (int b = 0; b < 8; ++b) {
      h ^= (v >> (b * 8)) & 0xFF;
      h *= 0x100000001B3ULL;
    }
  }
  return h;
}

}  // extern "C"
