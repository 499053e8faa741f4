// Native host-side preprocessing ops for the eghmd_tpu input pipeline.
//
// The per-sample hot loop (reference CurriculumLib.py:128-136) computes three
// signed euclidean distance maps per sample — the CPU bottleneck at high
// frames/sec (SURVEY §7 "Hard parts"). This implements the exact euclidean
// distance transform (Felzenszwalb & Huttenlocher's O(N) lower-envelope
// algorithm, equivalent to scipy.ndimage.distance_transform_edt) and the
// fused signed-distance-map builder, exported with a plain C ABI for ctypes.
//
// Build: see eghmd_tpu/runtime/__init__.py (g++ -O3 -march=native -shared).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// 1-D squared distance transform of a sampled function f, in place into d.
// Standard lower-envelope-of-parabolas construction.
void dt1d(const float* f, float* d, int n, int* v, float* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -kInf;
  z[1] = kInf;
  for (int q = 1; q < n; ++q) {
    float s;
    while (true) {
      int p = v[k];
      s = ((f[q] + q * q) - (f[p] + p * p)) / (2.0f * (q - p));
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = kInf;
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    int p = v[k];
    d[q] = (q - p) * (q - p) + f[p];
  }
}

// 1-D squared distance of every index to the nearest set bit of s, via two
// linear sweeps (the first EDT pass is always over a BINARY mask, where the
// full parabola envelope is overkill).
inline void dist1d_binary_sq(const uint8_t* s, float* d2, int n) {
  const int big = 2 * n + 1;
  int last = -big;
  for (int i = 0; i < n; ++i) {
    if (s[i]) last = i;
    int di = i - last;
    d2[i] = float(di < big ? di : big);
  }
  last = 2 * big;
  for (int i = n - 1; i >= 0; --i) {
    if (s[i]) last = i;
    float di = float(last - i);
    if (di < d2[i]) d2[i] = di;
    d2[i] *= d2[i];
  }
}

// 2-D exact squared EDT of a binary seed mask (distance to nearest seed).
// Column pass runs on a transposed copy (contiguous scanlines + linear
// two-sweep binary distance); row pass is the standard lower-envelope
// transform. Seedless scanlines produce a finite sentinel larger than any
// reachable squared distance: true infinities make the envelope construction
// compute inf-inf = NaN and corrupt the hull.
void edt2d_sq(const uint8_t* seeds, float* out, int h, int w,
              std::vector<uint8_t>& tseeds, std::vector<float>& ttmp,
              std::vector<float>& tmp, std::vector<int>& v,
              std::vector<float>& z) {
  constexpr int kBlk = 32;
  // blocked transpose of the seed mask: tseeds[x*h + y] = seeds[y*w + x]
  for (int y0 = 0; y0 < h; y0 += kBlk)
    for (int x0 = 0; x0 < w; x0 += kBlk)
      for (int y = y0; y < std::min(y0 + kBlk, h); ++y)
        for (int x = x0; x < std::min(x0 + kBlk, w); ++x)
          tseeds[x * h + y] = seeds[y * w + x];
  // column pass (contiguous in the transposed layout)
  for (int x = 0; x < w; ++x)
    dist1d_binary_sq(tseeds.data() + x * h, ttmp.data() + x * h, h);
  // transpose back
  for (int x0 = 0; x0 < w; x0 += kBlk)
    for (int y0 = 0; y0 < h; y0 += kBlk)
      for (int x = x0; x < std::min(x0 + kBlk, w); ++x)
        for (int y = y0; y < std::min(y0 + kBlk, h); ++y)
          tmp[y * w + x] = ttmp[x * h + y];
  // row pass
  for (int y = 0; y < h; ++y) {
    dt1d(tmp.data() + y * w, out + y * w, w, v.data(), z.data());
  }
}

}  // namespace

extern "C" {

// Exact euclidean distance transform: distance of each pixel to the nearest
// NONZERO pixel of `seeds` (note: scipy's edt measures distance to the
// nearest ZERO of its input; callers invert accordingly).
void edt(const uint8_t* seeds, float* out, int h, int w) {
  std::vector<uint8_t> tseeds(h * w);
  std::vector<float> ttmp(h * w), tmp(h * w), z(std::max(h, w) + 1);
  std::vector<int> v(std::max(h, w));
  edt2d_sq(seeds, out, h, w, tseeds, ttmp, tmp, v, z);
  for (int i = 0; i < h * w; ++i) out[i] = std::sqrt(out[i]);
}

// Fused signed distance maps for `c` classes of an int32 label map.
// out layout: [h, w, c] float32. Per class (reference
// helperfunctions.py:356-371): res = edt_to_class * (1 - in_class)
//                                    - (edt_to_complement - 1) * in_class,
// normalized by the image diagonal; all-zeros when the class is absent.
void signed_distance_maps(const int32_t* label, float* out, int h, int w,
                          int c) {
  const int n = h * w;
  const float mx = std::sqrt(float(h - 1) * (h - 1) + float(w - 1) * (w - 1));

  // Each class needs two independent EDTs (to the class region and to its
  // complement) — all 2*c transforms are independent, so classes run on
  // their own threads with private scratch (the per-class work is the
  // latency bottleneck of the input pipeline's per-sample hot loop).
  auto run_class = [&](int cls) {
    std::vector<uint8_t> pos(n), neg(n), tseeds(n);
    std::vector<float> dpos(n), dneg(n);
    std::vector<float> ttmp(n), tmp(n), z(std::max(h, w) + 1);
    std::vector<int> v(std::max(h, w));
    bool any = false;
    for (int i = 0; i < n; ++i) {
      uint8_t p = (label[i] == cls);
      pos[i] = p;
      neg[i] = !p;
      any |= p;
    }
    if (!any) {
      for (int i = 0; i < n; ++i) out[i * c + cls] = 0.0f;
      return;
    }
    // distance of negmask pixels to the class region (seeds = pos)
    edt2d_sq(pos.data(), dneg.data(), h, w, tseeds, ttmp, tmp, v, z);
    // distance of class pixels to the complement (seeds = neg)
    edt2d_sq(neg.data(), dpos.data(), h, w, tseeds, ttmp, tmp, v, z);
    for (int i = 0; i < n; ++i) {
      float r;
      if (pos[i]) {
        r = -(std::sqrt(dpos[i]) - 1.0f);
      } else {
        r = std::sqrt(dneg[i]);
      }
      out[i * c + cls] = r / mx;
    }
  };

  std::vector<std::thread> workers;
  workers.reserve(c > 0 ? c - 1 : 0);
  for (int cls = 1; cls < c; ++cls) workers.emplace_back(run_class, cls);
  if (c > 0) run_class(0);
  for (auto& t : workers) t.join();
}

// Boundary-weight map (reference CurriculumLib.py:128-129 semantics with the
// 2x1 vertical-dilate quirk): w = 1 + 20 * dilate(boundary(label)).
// boundary(label): pixel whose 4-neighborhood contains a different label
// (thin, both sides) approximating cv2.Canny(label, 0, 1)/255.
void boundary_weights(const int32_t* label, float* out, int h, int w,
                      int compat_dilate) {
  std::vector<uint8_t> edge(h * w, 0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int32_t c = label[y * w + x];
      bool e = false;
      if (x + 1 < w && label[y * w + x + 1] != c) e = true;
      if (!e && y + 1 < h && label[(y + 1) * w + x] != c) e = true;
      if (!e && x > 0 && label[y * w + x - 1] != c) e = true;
      if (!e && y > 0 && label[(y - 1) * w + x] != c) e = true;
      edge[y * w + x] = e;
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      uint8_t d = edge[y * w + x];
      if (compat_dilate) {
        if (y > 0) d = std::max(d, edge[(y - 1) * w + x]);
      } else {
        for (int dy = -1; dy <= 1 && !d; ++dy)
          for (int dx = -1; dx <= 1 && !d; ++dx) {
            int yy = y + dy, xx = x + dx;
            if (yy >= 0 && yy < h && xx >= 0 && xx < w)
              d = std::max(d, edge[yy * w + xx]);
          }
      }
      out[y * w + x] = 1.0f + 20.0f * d;
    }
  }
}

}  // extern "C"
