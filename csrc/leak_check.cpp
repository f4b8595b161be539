// Leak/memory-error harness for the native BVH builder — the counterpart of
// the reference's valgrind memcheck run (reference valgrind/valgrind.sh).
// The environment ships no valgrind, so this compiles bvh_builder.cpp into a
// standalone binary under -fsanitize=address (with LeakSanitizer on by
// default): build several trees of varying shapes, free them, and exit.
// Any leak, overflow, or use-after-free makes ASan exit nonzero — asserted
// by tests/test_native.py::test_native_builder_leak_check.
//
// Build: g++ -O1 -g -std=c++17 -fsanitize=address csrc/bvh_builder.cpp \
//        csrc/leak_check.cpp -o csrc/build/leak_check && ./csrc/build/leak_check

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

struct PbrBvhResult {
  int64_t n_nodes;
  int64_t n_faces;
  float* bb_min;
  float* bb_max;
  int32_t* leaf_first;
  int32_t* leaf_count;
  int32_t* exit_idx;
  int64_t* leaf_order;
};

extern "C" {
int pbr_build_bvh(const float* v0, const float* v1, const float* v2,
                  int64_t n_faces, int64_t max_faces, int64_t sah_limit,
                  double skip_cmp, PbrBvhResult* out);
void pbr_free_bvh(PbrBvhResult* r);
}

// xorshift PRNG — deterministic triangle soup without <random> overhead.
static uint32_t s = 12345;
static float frand() {
  s ^= s << 13;
  s ^= s >> 17;
  s ^= s << 5;
  return (float)(s & 0xFFFFFF) / (float)0x1000000 * 2.0f - 1.0f;
}

int main() {
  // Shapes chosen to hit every builder path: single face, SAH-only,
  // mean-split (> sah_limit), skip-ahead on/off, 1- and 2-face leaves.
  const struct {
    int64_t n, max_faces, sah_limit;
    double skip;
  } cases[] = {
      {1, 2, 1024, -1.0},   {7, 1, 1024, -1.0},    {500, 2, 1024, 0.7},
      {5000, 2, 64, 0.7},   {20000, 2, 128, -1.0}, {20000, 1, 4096, 0.9},
  };
  for (const auto& c : cases) {
    std::vector<float> v0(3 * c.n), v1(3 * c.n), v2(3 * c.n);
    for (int64_t i = 0; i < c.n; i++) {
      float cx = frand() * 10, cy = frand() * 10, cz = frand() * 10;
      for (int k = 0; k < 3; k++) {
        float* v = k == 0 ? &v0[3 * i] : (k == 1 ? &v1[3 * i] : &v2[3 * i]);
        v[0] = cx + frand() * 0.1f;
        v[1] = cy + frand() * 0.1f;
        v[2] = cz + frand() * 0.1f;
      }
    }
    PbrBvhResult r;
    int rc = pbr_build_bvh(v0.data(), v1.data(), v2.data(), c.n, c.max_faces,
                           c.sah_limit, c.skip, &r);
    if (rc != 0) {
      std::fprintf(stderr, "build failed rc=%d n=%lld\n", rc, (long long)c.n);
      return 2;
    }
    // Touch every output array end-to-end so ASan sees over-reads.
    double acc = 0;
    for (int64_t i = 0; i < r.n_nodes; i++)
      acc += r.bb_min[3 * i] + r.bb_max[3 * i + 2] + r.leaf_first[i] +
             r.leaf_count[i] + r.exit_idx[i];
    for (int64_t i = 0; i < r.n_faces; i++) acc += (double)r.leaf_order[i];
    std::printf("n=%lld nodes=%lld acc=%.1f\n", (long long)c.n,
                (long long)r.n_nodes, acc);
    pbr_free_bvh(&r);
  }
  std::puts("leak_check ok");
  return 0;
}
