// Oracle/baseline harness for the reference implementation.
//
// Compiles against the READ-ONLY reference sources mounted at
// /root/reference (no Cython needed) and exposes the exact
// Coarse2FineFlowWrapper entry the benchmark driver uses
// (Code/<variant>/src/Coarse2FineFlowWrapper.h).  Used to
//   1. record ground-truth (u, v, warpI2) flow fields as the EPE oracle for
//      the TPU build's parity tests, and
//   2. measure the reference's per-frame-pair runtime (the
//      "Total C++ Execution" metric) as the BASELINE.md numbers.
//
// I/O format: little-endian raw doubles.
//   input : int32 h, int32 w, int32 c, then h*w*c doubles (frame1),
//           h*w*c doubles (frame2)  — interleaved HWC in [0, 1].
//   output: u (h*w), v (h*w), warpI2 (h*w*c) doubles + timing on stdout.
//
// Usage: ref_runner <input.bin> <output.bin> <pyramidLevels> [nCores]
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <string>
#include <vector>

#include "Coarse2FineFlowWrapper.h"

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <input.bin> <output.bin> <pyramidLevels> [nCores]\n",
                 argv[0]);
    return 2;
  }
  const char* in_path = argv[1];
  const char* out_path = argv[2];
  int pyramid_levels = std::atoi(argv[3]);
  int n_cores = (argc > 4) ? std::atoi(argv[4]) : 1;

  FILE* f = std::fopen(in_path, "rb");
  if (!f) { std::perror("open input"); return 1; }
  int32_t h, w, c;
  if (std::fread(&h, 4, 1, f) != 1 || std::fread(&w, 4, 1, f) != 1 ||
      std::fread(&c, 4, 1, f) != 1) {
    std::fprintf(stderr, "bad header\n");
    return 1;
  }
  size_t n = (size_t)h * w * c;
  std::vector<double> im1(n), im2(n);
  if (std::fread(im1.data(), 8, n, f) != n ||
      std::fread(im2.data(), 8, n, f) != n) {
    std::fprintf(stderr, "bad payload\n");
    return 1;
  }
  std::fclose(f);

  size_t np = (size_t)h * w;
  std::vector<double> vx(np, 0.0), vy(np, 0.0), warp(n, 0.0);

  auto t0 = std::chrono::steady_clock::now();
#ifdef REF_PARALLEL
  std::map<std::string, std::string> timing = Coarse2FineFlowWrapper(
      vx.data(), vy.data(), warp.data(), im1.data(), im2.data(),
      pyramid_levels, n_cores, h, w, c);
#else
  (void)n_cores;
  std::map<std::string, std::string> timing = Coarse2FineFlowWrapper(
      vx.data(), vy.data(), warp.data(), im1.data(), im2.data(),
      pyramid_levels, h, w, c);
#endif
  auto t1 = std::chrono::steady_clock::now();
  double wall = std::chrono::duration<double>(t1 - t0).count();

  FILE* g = std::fopen(out_path, "wb");
  if (!g) { std::perror("open output"); return 1; }
  std::fwrite(vx.data(), 8, np, g);
  std::fwrite(vy.data(), 8, np, g);
  std::fwrite(warp.data(), 8, n, g);
  std::fclose(g);

  for (auto& kv : timing)
    std::printf("TIMING\t%s\t%s\n", kv.first.c_str(), kv.second.c_str());
  std::printf("WALL\t%f\n", wall);
  return 0;
}
