// dga_core — native host-side tiling core for deepgemm_ascend_tpu.
//
// TPU-native counterpart of the reference's C++ host tiling stack
// (aclnn_catlass_dynamic_matmul/op_host/op_tiling/: do_tiling.cpp analytic
// tiler, select_kernel.cpp handler chain, cache.cpp + csv.cpp persistent
// tiling cache). The algorithms mirror deepgemm_ascend_tpu/tiling/analytic.py
// and tiling/cache.py exactly — the Python module is the reference
// implementation and the authoritative fallback; this library is the
// serving-hot-path fast lane (selector lookups run per GEMM call on the
// host while building jit call signatures).
//
// C ABI only (consumed via ctypes — no pybind11 in this image).
//
// Build: g++ -O2 -std=c++17 -shared -fPIC dga_core.cpp -o libdga_core.so

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kVmemFraction = 0.8;  // == analytic.VMEM_FRACTION

struct Config {
  int32_t block_m, block_n, block_k;
  int32_t kernel_type;  // 0 SMALL, 1 COMMON, 2 KSPLIT
  int32_t k_split;
  int32_t swizzle;      // 0 M_MAJOR, 1 N_MAJOR
};

struct Platform {
  int64_t vmem_bytes;
  double peak_flops;     // EFFECTIVE peak for the input dtype (the caller
                         // pre-multiplies the calibrated compute_factor)
  double hbm_gbps;       // effective (calibrated) HBM bandwidth
  int32_t num_cores;
  int32_t lane;          // 128
  // Calibrated cost constants (== analytic.CostParams, fitted per (device,
  // op) from sweep records — ≙ the reference's fitted bandwidth polynomial
  // select_kernel.cpp:22-114). Nominal defaults preserved here.
  double vmem_gbps = 1300.0;
  double startup0 = 3e-6;
  double startup1 = 1e-7;
};

int64_t ceil_div(int64_t a, int64_t b) { return (a + b - 1) / b; }
int64_t round_up(int64_t x, int64_t m) { return ceil_div(x, m) * m; }

int sublane_for(int itemsize) {
  switch (itemsize) {
    case 1: return 32;
    case 2: return 16;
    default: return 8;
  }
}

// == analytic.vmem_footprint: double-buffered in/out blocks + f32 acc.
int64_t vmem_footprint(int64_t bm, int64_t bn, int64_t bk, int a_i, int b_i,
                       int o_i) {
  int64_t a = bm * bk * a_i, b = bk * bn * b_i, o = bm * bn * o_i;
  return 2 * (a + b + o) + bm * bn * 4;
}

bool judge_space(int64_t bm, int64_t bn, int64_t bk, int a_i, int b_i,
                 int o_i, const Platform& p) {
  return vmem_footprint(bm, bn, bk, a_i, b_i, o_i) <=
         static_cast<int64_t>(p.vmem_bytes * kVmemFraction);
}

// == analytic.estimate_time: max(compute, memory) roofline + startup.
double estimate_time(int64_t m, int64_t n, int64_t k, int64_t bm, int64_t bn,
                     int64_t bk, int a_i, int b_i, int o_i,
                     const Platform& p) {
  int64_t nm = ceil_div(m, bm), nn = ceil_div(n, bn), nk = ceil_div(k, bk);
  double padded_flops = 2.0 * (nm * bm) * (nn * bn) * (nk * bk);
  double compute_s = padded_flops / p.peak_flops;
  double a_bytes = 1.0 * nn * (nm * bm) * (nk * bk) * a_i;
  double b_bytes = 1.0 * nm * (nk * bk) * (nn * bn) * b_i;
  double c_bytes = 1.0 * (nm * bm) * (nn * bn) * o_i;
  double memory_s = (a_bytes + b_bytes + c_bytes) / (p.hbm_gbps * 1e9);
  double steps = 1.0 * nm * nn * nk;
  double startup = p.startup0 + p.startup1 * steps;
  // == analytic accumulator-RMW term: K-blocked grids pay a per-step
  // scratch read-modify-write (nk == 1 accumulates in registers); charged
  // to the compute side so memory-bound shapes hide it.
  double acc_rmw_s = 0.0;
  if (nk > 1) acc_rmw_s = steps * (2.0 * bm * bn * 4) / (p.vmem_gbps * 1e9);
  return std::max(compute_s + acc_rmw_s, memory_s) + startup;
}

const int64_t kBmCaps[] = {16, 32, 64, 128, 256, 512, 1024};
const int64_t kBnCaps[] = {128, 256, 384, 512, 768, 1024, 2048};
const int64_t kBnCapMax = 2048;
const int64_t kBkCaps[] = {128, 256, 512, 1024, 2048, 4096};

// == analytic.enumerate_candidates
void enumerate_candidates(int64_t m, int64_t n, int64_t k, int a_i, int b_i,
                          int o_i, int64_t k_gran, const Platform& p,
                          std::vector<std::array<int64_t, 3>>* out) {
  int sub_a = sublane_for(a_i);
  int64_t hi_m = round_up(m, sub_a);
  std::set<int64_t> bms;
  for (int64_t c : kBmCaps)
    if (c % sub_a == 0 && c <= std::max<int64_t>(hi_m, 128)) bms.insert(c);
  if (hi_m <= 1024) bms.insert(hi_m);
  if (bms.empty()) bms.insert(sub_a);

  int64_t hi_n = round_up(n, p.lane);
  std::set<int64_t> bns;
  for (int64_t c : kBnCaps)
    if (c % p.lane == 0 && c <= hi_n) bns.insert(c);
  if (hi_n <= kBnCapMax) bns.insert(hi_n);
  if (bns.empty()) bns.insert(p.lane);

  int64_t k_pad = round_up(k, k_gran);
  std::set<int64_t> bks;
  for (int64_t c : kBkCaps)
    if (c % k_gran == 0 && c <= k_pad) bks.insert(c);
  // Full/half/quarter-K blocks for ANY K (== analytic.enumerate_candidates):
  // block_k == K reaches the fp8 static-scale-slice fast path.
  for (int64_t frac : {1, 2, 4}) {
    int64_t cand = round_up(ceil_div(k_pad, frac), k_gran);
    if (cand >= k_gran) bks.insert(cand);
  }
  if (bks.empty()) bks.insert(k_pad);

  for (int64_t bm : bms)
    for (int64_t bn : bns)
      for (int64_t bk : bks)
        if (judge_space(bm, bn, bk, a_i, b_i, o_i, p))
          out->push_back({bm, bn, bk});
}

// == analytic.select_kernel_type handler chain (small → ksplit → common),
// mirroring the reference SelectKernel chain (select_kernel.cpp:333-369).
void select_kernel_type(int64_t m, int64_t n, int64_t k, int64_t bm,
                        int64_t bn, int64_t bk, const Platform& p,
                        int32_t* ktype, int32_t* ksplit) {
  int64_t nm = ceil_div(m, bm), nn = ceil_div(n, bn), nk = ceil_div(k, bk);
  if (nm == 1 && nn == 1 && nk == 1) {
    *ktype = 0; *ksplit = 1; return;
  }
  if (p.num_cores > 1 && nm * nn < p.num_cores && nk >= 2 * p.num_cores) {
    // Workload-balanced split count (== analytic.select_kernel_type):
    // minimize per-core makespan ceil(parallel_work/cores) * k-steps, the
    // TPU-expressible equivalent of the reference's fractional stream-K
    // assignment (megacore assigns grid slices; the program cannot).
    int64_t cores = p.num_cores;
    int64_t best_s = std::min(cores, nk);
    int64_t best_cost = -1;
    for (int64_t s = 2; s <= std::min(nk, 4 * cores); ++s) {
      int64_t cost = ceil_div(s * nm * nn, cores) * ceil_div(nk, s);
      if (best_cost < 0 || cost < best_cost) { best_s = s; best_cost = cost; }
    }
    *ktype = 2;
    *ksplit = static_cast<int32_t>(best_s);
    return;
  }
  *ktype = 1; *ksplit = 1;
}

// ---------- persistent tiling cache (== tiling/cache.py, reference
// op_tiling/cache.cpp:22-101 + csv.cpp) ----------

struct CacheEntry { Config cfg; };

class TilingCache {
 public:
  static TilingCache& Instance() {
    static TilingCache c;
    return c;
  }

  void Init(const char* path) {
    std::lock_guard<std::mutex> g(mu_);
    path_ = path ? path : "";
    map_.clear();
    if (path_.empty()) return;
    FILE* f = std::fopen(path_.c_str(), "r");
    if (!f) return;
    char line[1024];
    while (std::fgets(line, sizeof line, f)) {
      // CSV: key,block_m,block_n,block_k,kernel_type,k_split,swizzle
      char key[768];
      Config c{};
      if (std::sscanf(line, "%767[^,],%d,%d,%d,%d,%d,%d", key, &c.block_m,
                      &c.block_n, &c.block_k, &c.kernel_type, &c.k_split,
                      &c.swizzle) == 7) {
        map_[key] = {c};
      }
    }
    std::fclose(f);
  }

  bool Get(const char* key, Config* out) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = map_.find(key);
    if (it == map_.end()) return false;
    *out = it->second.cfg;
    return true;
  }

  void Set(const char* key, const Config& c, bool persist) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = map_.find(key);
    if (it != map_.end() &&
        std::memcmp(&it->second.cfg, &c, sizeof c) == 0)
      return;
    map_[key] = {c};
    if (persist && !path_.empty()) {
      FILE* f = std::fopen(path_.c_str(), "a");
      if (f) {
        std::fprintf(f, "%s,%d,%d,%d,%d,%d,%d\n", key, c.block_m, c.block_n,
                     c.block_k, c.kernel_type, c.k_split, c.swizzle);
        std::fclose(f);
      }
    }
  }

  int64_t Size() {
    std::lock_guard<std::mutex> g(mu_);
    return static_cast<int64_t>(map_.size());
  }

 private:
  std::mutex mu_;
  std::string path_;
  std::unordered_map<std::string, CacheEntry> map_;
};

}  // namespace

extern "C" {

// Analytic best config. Returns number of candidates considered (0 =>
// degenerate fallback used).
int64_t dga_select_config(int64_t m, int64_t n, int64_t k, int32_t a_item,
                          int32_t b_item, int32_t out_item, int64_t k_gran,
                          int64_t vmem_bytes, double peak_flops,
                          double hbm_gbps, int32_t num_cores,
                          double vmem_gbps, double startup0, double startup1,
                          Config* out) {
  Platform p{vmem_bytes, peak_flops, hbm_gbps, num_cores, 128,
             vmem_gbps, startup0, startup1};
  std::vector<std::array<int64_t, 3>> cands;
  enumerate_candidates(m, n, k, a_item, b_item, out_item, k_gran, p, &cands);
  double best_t = 1e30;
  std::array<int64_t, 3> best{static_cast<int64_t>(
                                  std::max(sublane_for(a_item), 128)),
                              128, k_gran};
  for (const auto& c : cands) {
    double t = estimate_time(m, n, k, c[0], c[1], c[2], a_item, b_item,
                             out_item, p);
    if (t < best_t) { best_t = t; best = c; }
  }
  out->block_m = static_cast<int32_t>(best[0]);
  out->block_n = static_cast<int32_t>(best[1]);
  out->block_k = static_cast<int32_t>(best[2]);
  select_kernel_type(m, n, k, best[0], best[1], best[2], p,
                     &out->kernel_type, &out->k_split);
  out->swizzle = (m >= n) ? 0 : 1;
  return static_cast<int64_t>(cands.size());
}

int64_t dga_vmem_footprint(int64_t bm, int64_t bn, int64_t bk, int32_t a_i,
                           int32_t b_i, int32_t o_i) {
  return vmem_footprint(bm, bn, bk, a_i, b_i, o_i);
}

double dga_estimate_time(int64_t m, int64_t n, int64_t k, int64_t bm,
                         int64_t bn, int64_t bk, int32_t a_i, int32_t b_i,
                         int32_t o_i, int64_t vmem_bytes, double peak_flops,
                         double hbm_gbps, double vmem_gbps, double startup0,
                         double startup1) {
  Platform p{vmem_bytes, peak_flops, hbm_gbps, 1, 128,
             vmem_gbps, startup0, startup1};
  return estimate_time(m, n, k, bm, bn, bk, a_i, b_i, o_i, p);
}

void dga_cache_init(const char* path) { TilingCache::Instance().Init(path); }

int32_t dga_cache_get(const char* key, Config* out) {
  return TilingCache::Instance().Get(key, out) ? 1 : 0;
}

void dga_cache_set(const char* key, const Config* cfg, int32_t persist) {
  TilingCache::Instance().Set(key, *cfg, persist != 0);
}

int64_t dga_cache_size() { return TilingCache::Instance().Size(); }

// Padding cost model — mask-in-kernel vs pre-pad-K argmin, mirroring
// tiling/padding.py::get_padding_tag exactly (same 3-VPU-ops/element
// masking estimate and HBM read+write pad-copy traffic; ≙ the reference's
// GetPaddingTag argmin, select_kernel.cpp:82-268). Returns the tag
// (0 NONE, 1 PAD_K) and writes both costs for observability.
int32_t dga_padding_tag(int64_t m, int64_t n, int64_t k, int64_t bm,
                        int64_t bn, int64_t bk, int32_t a_item,
                        int32_t b_item, double vpu_tops, double hbm_gbps,
                        int64_t calls_amortized, double* mask_s,
                        double* pad_s) {
  double ms = 0.0, ps = 0.0;
  if (k % bk != 0) {
    const int64_t nm = ceil_div(m, bm), nn = ceil_div(n, bn),
                  nk = ceil_div(k, bk);
    const double ops = 3.0 * static_cast<double>(bm * bk + bk * bn);
    ms = static_cast<double>(nm * nn * nk) * ops / (vpu_tops * 1e12);
    const int64_t kp = round_up(k, bk);
    const double bytes =
        static_cast<double>(m) * static_cast<double>(k + kp) * a_item +
        static_cast<double>(n) * static_cast<double>(k + kp) * b_item;
    ps = bytes / (hbm_gbps * 1e9);
  }
  if (mask_s) *mask_s = ms;
  if (pad_s) *pad_s = ps;
  const double ca = static_cast<double>(
      calls_amortized > 1 ? calls_amortized : 1);
  return (ms * ca > ps && ps > 0.0) ? 1 : 0;
}

int32_t dga_abi_version() { return 3; }

}  // extern "C"
