// Native runtime helpers — C++ analogue of the reference's host-side
// native layer (simple-knn CUDA submodule, PLY marshaling in
// scene/gaussian_model.py). The TPU compute path is Pallas/XLA; these
// cover the CPU-bound data-preparation runtime: multithreaded
// morton-windowed KNN for scale init on multi-million-point clouds and a
// zero-copy binary-PLY column reader.
//
// Plain C ABI (ctypes-friendly); build: see native/Makefile.
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <string>
#include <thread>
#include <vector>

namespace {

inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  int nt = std::max(1u, std::thread::hardware_concurrency());
  if (n < 4096) nt = 1;
  std::vector<std::thread> ts;
  int64_t per = (n + nt - 1) / nt;
  for (int t = 0; t < nt; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    ts.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Mean squared distance to the k nearest neighbors, morton-windowed
// (the simple-knn `distCUDA2` equivalent; approximate in the same way —
// spatial-order pruning — but multithreaded on CPU).
void r3dg_mean_knn_dist2(const float* pts, int64_t n, int k, int window,
                         float* out) {
  if (n == 0) return;
  float lo[3] = {pts[0], pts[1], pts[2]};
  float hi[3] = {pts[0], pts[1], pts[2]};
  for (int64_t i = 0; i < n; i++) {
    for (int d = 0; d < 3; d++) {
      lo[d] = std::min(lo[d], pts[i * 3 + d]);
      hi[d] = std::max(hi[d], pts[i * 3 + d]);
    }
  }
  std::vector<std::pair<uint32_t, int64_t>> order(n);
  parallel_for(n, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; i++) {
      uint32_t m = 0;
      uint32_t q[3];
      for (int d = 0; d < 3; d++) {
        float range = std::max(hi[d] - lo[d], 1e-12f);
        float rel = (pts[i * 3 + d] - lo[d]) / range;
        q[d] = (uint32_t)std::min(1023.0f, std::max(0.0f, rel * 1023.0f));
      }
      m = (expand_bits(q[0]) << 2) | (expand_bits(q[1]) << 1) |
          expand_bits(q[2]);
      order[i] = {m, i};
    }
  });
  std::sort(order.begin(), order.end());

  parallel_for(n, [&](int64_t a, int64_t b) {
    std::vector<float> best(k);
    for (int64_t s = a; s < b; s++) {
      int64_t i = order[s].second;
      const float* p = pts + i * 3;
      std::fill(best.begin(), best.end(), 1e30f);
      int64_t w0 = std::max<int64_t>(0, s - window);
      int64_t w1 = std::min<int64_t>(n, s + window + 1);
      for (int64_t t = w0; t < w1; t++) {
        if (t == s) continue;
        const float* q = pts + order[t].second * 3;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (d2 < best[k - 1]) {
          // insertion into the small sorted best-k array
          int j = k - 1;
          while (j > 0 && best[j - 1] > d2) {
            best[j] = best[j - 1];
            j--;
          }
          best[j] = d2;
        }
      }
      float sum = 0;
      for (int j = 0; j < k; j++) sum += best[j];
      out[i] = sum / k;
    }
  });
}

// Binary little-endian PLY vertex reader: extracts named float32
// properties into a dense [n, nprops] row-major buffer.
// Returns vertex count, or -1 on error, or required count if out==null.
int64_t r3dg_ply_read_f32(const char* path, const char** prop_names,
                          int nprops, float* out, int64_t max_rows) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char line[4096];
  int64_t count = -1;
  std::vector<std::pair<std::string, int>> props;  // (name, byte size)
  bool in_vertex = false;
  bool binary_le = false;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    if (s.rfind("format binary_little_endian", 0) == 0) binary_le = true;
    if (s.rfind("element vertex", 0) == 0) {
      count = atoll(s.c_str() + 15);
      in_vertex = true;
    } else if (s.rfind("element", 0) == 0) {
      in_vertex = false;
    } else if (in_vertex && s.rfind("property", 0) == 0) {
      char type[64], name[256];
      if (sscanf(s.c_str(), "property %63s %255s", type, name) == 2) {
        int sz = 4;
        std::string t(type);
        if (t == "double") sz = 8;
        else if (t == "uchar" || t == "char") sz = 1;
        else if (t == "short" || t == "ushort") sz = 2;
        props.emplace_back(name, sz);
      }
    } else if (s.rfind("end_header", 0) == 0) {
      break;
    }
  }
  if (count < 0 || !binary_le) {
    fclose(f);
    return -1;
  }
  if (!out) {
    fclose(f);
    return count;
  }
  int64_t rows = std::min(count, max_rows);
  int64_t stride = 0;
  std::vector<int64_t> offsets(nprops, -1);
  std::vector<int> sizes(nprops, 4);
  for (auto& pr : props) {
    for (int j = 0; j < nprops; j++) {
      if (pr.first == prop_names[j]) {
        offsets[j] = stride;
        sizes[j] = pr.second;
      }
    }
    stride += pr.second;
  }
  for (int j = 0; j < nprops; j++) {
    if (offsets[j] < 0) {
      fclose(f);
      return -2;  // missing property
    }
  }
  std::vector<char> buf(stride * rows);
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if ((int64_t)got < (int64_t)buf.size()) return -3;

  parallel_for(rows, [&](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; i++) {
      const char* row = buf.data() + i * stride;
      for (int j = 0; j < nprops; j++) {
        float v;
        const char* src = row + offsets[j];
        switch (sizes[j]) {
          case 8: { double d; memcpy(&d, src, 8); v = (float)d; break; }
          case 1: { unsigned char c; memcpy(&c, src, 1); v = c; break; }
          case 2: { int16_t h; memcpy(&h, src, 2); v = h; break; }
          default: memcpy(&v, src, 4);
        }
        out[i * nprops + j] = v;
      }
    }
  });
  return rows;
}

}  // extern "C"
