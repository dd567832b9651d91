// Native per-frame scene builder for the animated benchmark fixture.
//
// The reference generates its scenes natively (Rust make_tiger /
// make_cardioid, reference: src/lib.rs:256-328); piet-tpu's animated
// BASELINE config re-encodes a scene EVERY frame, so its builder is on
// the frame critical path.  This is the C++ twin of
// piet_tpu/scene/fixtures.py::make_animated_frame, emitting the SoA
// scene arrays (piet_tpu/scene/scene.py::Scene) directly -- the Python
// twin costs ~4.5 ms/frame of interpreter loop; this runs in ~30 us.
//
// Bit-exactness contract: identical IEEE f64 arithmetic (libm cos/sin on
// the same host libm), the same f64->f32 rounding points as
// SceneBuilder.build(), and the same ShortBbox quantization
// (scene.py::quantize_bbox = reference src/lib.rs:88-97).  The seeded
// random draws (numpy PCG64) stay in Python and are passed in -- they are
// t-independent and computed once, not per frame.
// Pinned by tests/test_native.py::test_native_animated_frame.

#include <cmath>
#include <cstdint>

#include "piet_cc.h"

namespace {

constexpr int32_t kTagFill = 3;
constexpr int32_t kTagPoly = 4;

// scene.py::quantize_bbox -- floor mins / ceil maxes, clamp to u16 range.
inline int32_t q_floor(double v) {
  double f = std::floor(v);
  return static_cast<int32_t>(std::min(std::max(f, 0.0), 65535.0));
}
inline int32_t q_ceil(double v) {
  double c = std::ceil(v);
  return static_cast<int32_t>(std::min(std::max(c, 0.0), 65535.0));
}

}  // namespace

extern "C" int64_t pm_animated_frame(
    double t, int32_t n, const double* centers, const double* radii,
    const double* phases, const uint32_t* color_hi,
    int32_t* tags, uint32_t* colors, float* widths, int32_t* bboxes,
    int32_t* pt_offset, int32_t* n_pts, float* points, uint32_t* flags,
    float* clips) {
  constexpr int k = 12;
  constexpr double kTau = 6.283185307179586476925286766559;  // 2*pi
  int64_t off = 0;
  for (int32_t i = 0; i < n; ++i) {
    const double cx = centers[2 * i], cy = centers[2 * i + 1];
    const double th = phases[i] + t * (1.0 + 0.2 * (i % 7));
    const double r = radii[i];
    const double ox = cx + std::cos(th) * r;
    const double oy = cy + std::sin(th) * r;
    double px[k], py[k];
    double bx0 = 1e300, by0 = 1e300, bx1 = -1e300, by1 = -1e300;
    for (int j = 0; j < k; ++j) {
      const double a = kTau * j / k + th;
      px[j] = ox + std::cos(a) * r * 0.5;
      py[j] = oy + std::sin(a) * r * 0.5;
      bx0 = std::min(bx0, px[j]);
      by0 = std::min(by0, py[j]);
      bx1 = std::max(bx1, px[j]);
      by1 = std::max(by1, py[j]);
    }
    const uint32_t alpha =
        static_cast<uint32_t>(static_cast<int>(96.0 + 96.0 * std::sin(t + phases[i]))) & 0xFF;
    const uint32_t color = color_hi[i] | alpha;

    const bool poly = (i % 3) == 0;
    const int npts = poly ? k + 1 : k;
    for (int j = 0; j < npts; ++j) {
      points[2 * (off + j)] = static_cast<float>(px[j % k]);
      points[2 * (off + j) + 1] = static_cast<float>(py[j % k]);
    }
    tags[i] = poly ? kTagPoly : kTagFill;
    colors[i] = color;
    pt_offset[i] = static_cast<int32_t>(off);
    n_pts[i] = npts;
    flags[i] = 0;
    // NO_CLIP rect (raster/ptcl.py::NO_CLIP).
    clips[4 * i] = -1e9f;
    clips[4 * i + 1] = -1e9f;
    clips[4 * i + 2] = 1e9f;
    clips[4 * i + 3] = 1e9f;
    if (poly) {
      const double width = 2.0 + (i % 5);
      // SceneBuilder.polyline: hw = f32(width) * f32(0.5), bbox
      // inflated in f64 (scene.py:234-240).
      const double hw = static_cast<double>(static_cast<float>(width) * 0.5f);
      widths[i] = static_cast<float>(width);
      bboxes[4 * i] = q_floor(bx0 - hw);
      bboxes[4 * i + 1] = q_floor(by0 - hw);
      bboxes[4 * i + 2] = q_ceil(bx1 + hw);
      bboxes[4 * i + 3] = q_ceil(by1 + hw);
    } else {
      widths[i] = 0.0f;
      bboxes[4 * i] = q_floor(bx0);
      bboxes[4 * i + 1] = q_floor(by0);
      bboxes[4 * i + 2] = q_ceil(bx1);
      bboxes[4 * i + 3] = q_ceil(by1);
    }
    off += npts;
  }
  return off;
}
