// Native memory planner: offset-simulation allocator.
//
// C++ reimplementation of the capability of the reference LazyAllocator
// (reference include/core/lazy_allocator.h:13-150, src/core/lazy_allocator.cc):
// best-fit free-block allocation over a simulated address space with
// head/tail coalescing, a separate weight region, and a heap region for
// KV-cache-style long-lived blocks. On TPU the actual device buffers are
// owned by XLA; this planner provides the engine-level services XLA does not:
// peak-activation accounting for compile-admission control, serving-slot
// heap layout, and host-side staging arena planning.
//
// Exposed through a C ABI (ctypes); see infinitensor_tpu/native/__init__.py.

#include <cstdint>
#include <cstdio>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

constexpr int64_t kAlignment = 512;  // XLA/TPU-friendly alignment

int64_t align_up(int64_t v, int64_t a) { return (v + a - 1) / a * a; }

struct FreeBlock {
  int64_t addr;
  int64_t size;
};

class Planner {
 public:
  // free blocks keyed by address; secondary index by (size, addr) for
  // best-fit (mirrors the reference's head/tail coalescing map pair).
  std::map<int64_t, int64_t> by_addr_;            // addr -> size
  std::map<std::pair<int64_t, int64_t>, bool> by_size_;  // (size, addr)
  int64_t used_ = 0;
  int64_t peak_ = 0;
  int64_t frontier_ = 0;   // high-water mark of the simulated arena
  int64_t weight_frontier_ = 0;
  std::unordered_map<int64_t, int64_t> sizes_;  // live addr -> size

  void add_free(int64_t addr, int64_t size) {
    // coalesce with previous
    auto next = by_addr_.lower_bound(addr);
    if (next != by_addr_.begin()) {
      auto prev = std::prev(next);
      if (prev->first + prev->second == addr) {
        addr = prev->first;
        size += prev->second;
        by_size_.erase({prev->second, prev->first});
        by_addr_.erase(prev);
      }
    }
    // coalesce with next
    next = by_addr_.lower_bound(addr);
    if (next != by_addr_.end() && addr + size == next->first) {
      size += next->second;
      by_size_.erase({next->second, next->first});
      by_addr_.erase(next);
    }
    by_addr_[addr] = size;
    by_size_[{size, addr}] = true;
  }

  int64_t alloc(int64_t size) {
    size = align_up(size, kAlignment);
    used_ += size;
    if (used_ > peak_) peak_ = used_;
    // best fit: smallest block >= size
    auto it = by_size_.lower_bound({size, -1});
    if (it != by_size_.end()) {
      int64_t bsize = it->first.first;
      int64_t addr = it->first.second;
      by_size_.erase(it);
      by_addr_.erase(addr);
      if (bsize > size) add_free(addr + size, bsize - size);
      sizes_[addr] = size;
      return addr;
    }
    int64_t addr = frontier_;
    frontier_ += size;
    sizes_[addr] = size;
    return addr;
  }

  void free_block(int64_t addr) {
    auto it = sizes_.find(addr);
    if (it == sizes_.end()) return;
    used_ -= it->second;
    add_free(addr, it->second);
    sizes_.erase(it);
  }

  int64_t alloc_weight(int64_t size) {
    // weights are planned once in a dedicated region (reference allocWeight)
    int64_t addr = weight_frontier_;
    weight_frontier_ += align_up(size, kAlignment);
    return addr;
  }
};

std::unordered_map<int64_t, Planner*> g_planners;
int64_t g_next_id = 1;

}  // namespace

extern "C" {

int64_t planner_create() {
  int64_t id = g_next_id++;
  g_planners[id] = new Planner();
  return id;
}

void planner_destroy(int64_t id) {
  auto it = g_planners.find(id);
  if (it != g_planners.end()) {
    delete it->second;
    g_planners.erase(it);
  }
}

int64_t planner_alloc(int64_t id, int64_t size) {
  return g_planners.at(id)->alloc(size);
}

void planner_free(int64_t id, int64_t addr) {
  g_planners.at(id)->free_block(addr);
}

int64_t planner_alloc_weight(int64_t id, int64_t size) {
  return g_planners.at(id)->alloc_weight(size);
}

int64_t planner_peak(int64_t id) { return g_planners.at(id)->peak_; }

int64_t planner_used(int64_t id) { return g_planners.at(id)->used_; }

int64_t planner_arena_size(int64_t id) { return g_planners.at(id)->frontier_; }

int64_t planner_weight_size(int64_t id) {
  return g_planners.at(id)->weight_frontier_;
}

int64_t planner_free_block_count(int64_t id) {
  return static_cast<int64_t>(g_planners.at(id)->by_addr_.size());
}

// -------------------------------------------------------------------------
// Whole-graph memory planning: given a topo-ordered op list in CSR form,
// simulate activation lifetimes with consumer ref-counting (the reference's
// dataMallocImplCore, src/core/graph.cc:341-560) and return per-tensor
// offsets + the peak/arena statistics.
//
// Inputs:
//   n_tensors, sizes[n_tensors]        byte sizes
//   kinds[n_tensors]                   0=activation 1=weight 2=input 3=output
//   n_ops, op_in_ptr/op_in_idx (CSR)   op -> consumed tensor ids
//   op_out_ptr/op_out_idx (CSR)        op -> produced tensor ids
// Outputs:
//   offsets[n_tensors]  (-1 for weights/io which live outside the arena)
//   stats[3] = {peak, arena, weight_bytes}
// -------------------------------------------------------------------------
int plan_graph_memory(int64_t n_tensors, const int64_t* sizes,
                      const int32_t* kinds, int64_t n_ops,
                      const int64_t* op_in_ptr, const int64_t* op_in_idx,
                      const int64_t* op_out_ptr, const int64_t* op_out_idx,
                      int64_t* offsets, int64_t* stats) {
  Planner planner;
  std::vector<int64_t> refcount(n_tensors, 0);
  for (int64_t o = 0; o < n_ops; ++o) {
    for (int64_t i = op_in_ptr[o]; i < op_in_ptr[o + 1]; ++i) {
      refcount[op_in_idx[i]]++;
    }
  }
  int64_t weight_bytes = 0;
  for (int64_t t = 0; t < n_tensors; ++t) {
    offsets[t] = -1;
    if (kinds[t] == 1) {
      planner.alloc_weight(sizes[t]);
      weight_bytes += sizes[t];
    }
  }
  std::vector<int64_t> addr(n_tensors, -1);
  for (int64_t o = 0; o < n_ops; ++o) {
    for (int64_t i = op_out_ptr[o]; i < op_out_ptr[o + 1]; ++i) {
      int64_t t = op_out_idx[i];
      if (kinds[t] == 0 || kinds[t] == 3) {
        addr[t] = planner.alloc(sizes[t]);
        offsets[t] = addr[t];
      }
    }
    for (int64_t i = op_in_ptr[o]; i < op_in_ptr[o + 1]; ++i) {
      int64_t t = op_in_idx[i];
      if (--refcount[t] == 0 && kinds[t] == 0 && addr[t] >= 0) {
        planner.free_block(addr[t]);
      }
    }
  }
  stats[0] = planner.peak_;
  stats[1] = planner.frontier_;
  stats[2] = weight_bytes;
  return 0;
}

}  // extern "C"
