// dga_core_test — native unit tests for the host tiling core.
//
// ≙ the reference's gtest tier (aclnn_catlass_dynamic_matmul/tests/*.cpp:
// utils_test / do_tiling_test / select_kernel_test / cache_test / csv_test)
// with a dependency-free CHECK harness (no gtest in this image). Exercises
// the C ABI exactly as the ctypes loader (native.py) does.
//
// Build+run (also wired into tests/test_native.py):
//   g++ -O2 -std=c++17 dga_core.cpp dga_core_test.cpp -o dga_core_test
//   ./dga_core_test [csv_path]

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

struct Config {
  int32_t block_m, block_n, block_k;
  int32_t kernel_type;
  int32_t k_split;
  int32_t swizzle;
};

extern "C" {
int64_t dga_select_config(int64_t, int64_t, int64_t, int32_t, int32_t,
                          int32_t, int64_t, int64_t, double, double, int32_t,
                          double, double, double, Config*);
int64_t dga_vmem_footprint(int64_t, int64_t, int64_t, int32_t, int32_t,
                           int32_t);
double dga_estimate_time(int64_t, int64_t, int64_t, int64_t, int64_t,
                         int64_t, int32_t, int32_t, int32_t, int64_t, double,
                         double, double, double, double);
void dga_cache_init(const char*);
int32_t dga_cache_get(const char*, Config*);
void dga_cache_set(const char*, const Config*, int32_t);
int64_t dga_cache_size();
int32_t dga_padding_tag(int64_t, int64_t, int64_t, int64_t, int64_t,
                        int64_t, int32_t, int32_t, double, double, int64_t,
                        double*, double*);
int32_t dga_abi_version();
}

static int g_failures = 0;
#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__,       \
                   #cond);                                               \
      ++g_failures;                                                      \
    }                                                                    \
  } while (0)

static const int64_t kVmem = 16ll << 20;
static const double kPeak = 197e12;
static const double kHbm = 819.0;
// Nominal calibration constants (== analytic._NOMINAL defaults).
static const double kVmemBw = 1300.0;
static const double kS0 = 3e-6;
static const double kS1 = 1e-7;

static Config select(int64_t m, int64_t n, int64_t k, int a_i = 2,
                     int o_i = 4, int64_t k_gran = 128, int cores = 1) {
  Config c{};
  dga_select_config(m, n, k, a_i, a_i, o_i, k_gran, kVmem, kPeak, kHbm,
                    cores, kVmemBw, kS0, kS1, &c);
  return c;
}

// ---- utils tier (≙ utils_test.cpp: CeilDiv/RoundUp/JudgeSpace) ----
static void test_footprint() {
  // 2*(a + b + o) + acc, bf16 in / f32 out.
  CHECK(dga_vmem_footprint(256, 256, 512, 2, 2, 4) ==
        2 * (256 * 512 * 2 + 512 * 256 * 2 + 256 * 256 * 4) +
            256 * 256 * 4);
  // Monotone in every block dim.
  CHECK(dga_vmem_footprint(512, 256, 512, 2, 2, 4) >
        dga_vmem_footprint(256, 256, 512, 2, 2, 4));
}

static void test_estimate_time() {
  // Compute-bound big GEMM: time approx padded_flops / peak.
  double t = dga_estimate_time(4096, 4096, 4096, 512, 512, 1024, 2, 2, 4,
                               kVmem, kPeak, kHbm, kVmemBw, kS0, kS1);
  double ideal = 2.0 * 4096 * 4096 * 4096 / kPeak;
  CHECK(t >= ideal && t < 3 * ideal);
  // Tiny-block candidate must cost more (padding + startup + traffic).
  double t_small = dga_estimate_time(4096, 4096, 4096, 16, 128, 128, 2, 2,
                                     4, kVmem, kPeak, kHbm, kVmemBw, kS0, kS1);
  CHECK(t_small > t);
  // Skinny M: padding waste of a 512-row tile visible vs an 16-row tile.
  double t_fat = dga_estimate_time(8, 4096, 4096, 512, 512, 512, 2, 2, 4,
                                   kVmem, kPeak, kHbm, kVmemBw, kS0, kS1);
  double t_fit = dga_estimate_time(8, 4096, 4096, 16, 512, 512, 2, 2, 4,
                                   kVmem, kPeak, kHbm, kVmemBw, kS0, kS1);
  CHECK(t_fit < t_fat);
}

// ---- tiler tier (≙ do_tiling_test.cpp / select_kernel_test.cpp) ----
static void test_select_config_legal() {
  const int64_t shapes[][3] = {
      {4096, 4096, 4096}, {8, 7168, 18432}, {64, 24576, 1536},
      {128, 4096, 7168},  {1279, 5003, 7681}, {1, 128, 128},
      {5119, 6997, 9901}, {2048, 4096, 7168},
  };
  for (const auto& s : shapes) {
    Config c = select(s[0], s[1], s[2]);
    CHECK(c.block_m > 0 && c.block_n > 0 && c.block_k > 0);
    CHECK(c.block_n % 128 == 0);
    CHECK(c.block_k % 128 == 0);
    CHECK(c.block_m % 16 == 0);  // bf16 sublane
    CHECK(dga_vmem_footprint(c.block_m, c.block_n, c.block_k, 2, 2, 4) <=
          static_cast<int64_t>(kVmem * 0.8));
    CHECK(c.k_split >= 1);
    CHECK(c.swizzle == (s[0] >= s[1] ? 0 : 1));
  }
}

static void test_kernel_type_chain() {
  // Whole problem in one tile -> SMALL (≙ SmallMatmulB16Handler).
  Config small = select(64, 128, 128);
  CHECK(small.kernel_type == 0);
  // Big common case -> COMMON.
  Config common = select(4096, 4096, 4096);
  CHECK(common.kernel_type == 1);
  CHECK(common.k_split == 1);
  // Low-parallelism output + deep K on a multi-core part -> KSPLIT
  // (≙ streamk/splitk handlers).
  Config c{};
  dga_select_config(128, 128, 65536, 2, 2, 4, 128, kVmem, kPeak, kHbm,
                    /*num_cores=*/2, kVmemBw, kS0, kS1, &c);
  if (c.kernel_type == 2) CHECK(c.k_split >= 2);
  // fp8 path: k granularity respected.
  Config f8 = select(4096, 4096, 4096, /*a_i=*/1, /*o_i=*/2, 128);
  CHECK(f8.block_k % 128 == 0 && f8.block_m % 32 == 0);
}

// ---- cache tier (≙ cache_test.cpp / csv_test.cpp) ----
static void test_cache_roundtrip(const char* path) {
  dga_cache_init(path);
  CHECK(dga_cache_size() == 0);
  Config c{256, 512, 1024, 1, 1, 0};
  Config out{};
  CHECK(dga_cache_get("gemm_m64n128k256", &out) == 0);
  dga_cache_set("gemm_m64n128k256", &c, 1);
  CHECK(dga_cache_size() == 1);
  CHECK(dga_cache_get("gemm_m64n128k256", &out) == 1);
  CHECK(std::memcmp(&out, &c, sizeof c) == 0);
  // Idempotent set does not duplicate (≙ cache idempotence,
  // select_kernel_test.cpp:94-144).
  dga_cache_set("gemm_m64n128k256", &c, 1);
  CHECK(dga_cache_size() == 1);
  // Persistence: re-init reloads from CSV.
  dga_cache_init(path);
  CHECK(dga_cache_size() == 1);
  CHECK(dga_cache_get("gemm_m64n128k256", &out) == 1);
  CHECK(out.block_n == 512 && out.block_k == 1024);
  std::remove(path);
}

static void test_padding_tag() {
  double ms = 0, ps = 0;
  // aligned K: zero costs, NONE
  CHECK(dga_padding_tag(512, 512, 512, 128, 128, 128, 2, 2, 4.0, 819.0, 1,
                        &ms, &ps) == 0);
  CHECK(ms == 0.0 && ps == 0.0);
  // ragged K, single call: one-time pad copy beats nothing to amortize
  // only when masking outweighs it; amortized over many calls PAD_K wins
  int32_t once = dga_padding_tag(4096, 4096, 7000, 256, 256, 512, 2, 2,
                                 4.0, 819.0, 1, &ms, &ps);
  int32_t many = dga_padding_tag(4096, 4096, 7000, 256, 256, 512, 2, 2,
                                 4.0, 819.0, 100000, nullptr, nullptr);
  CHECK(ms > 0.0 && ps > 0.0);
  CHECK(many == 1);
  CHECK(once == 0 || once == 1);  // device-constant dependent; just legal
}

int main(int argc, char** argv) {
  CHECK(dga_abi_version() == 3);
  test_footprint();
  test_estimate_time();
  test_select_config_legal();
  test_kernel_type_chain();
  test_padding_tag();
  test_cache_roundtrip(argc > 1 ? argv[1] : "/tmp/dga_core_test_cache.csv");
  if (g_failures) {
    std::fprintf(stderr, "%d failure(s)\n", g_failures);
    return 1;
  }
  std::printf("dga_core_test: all checks passed\n");
  return 0;
}
