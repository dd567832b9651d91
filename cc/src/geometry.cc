// Bezier flattening: the native half of the geometry pipeline.
//
// Same semantics as the reference flattener (reference: src/flatten.rs:10-47
// with kurbo's to_quads subdivision rule) and as the Python implementation
// in piet_tpu/geometry/bezier.py -- double precision, chord endpoints at
// uniform parameter steps.

#include <algorithm>
#include <cmath>
#include <cstdint>

#include "piet_cc.h"

namespace piet {

int64_t quad_count(const double* c, double accuracy) {
  const double max_hypot2 = 432.0 * accuracy * accuracy;
  const double p1x2x = 3.0 * c[2] - c[0];
  const double p1x2y = 3.0 * c[3] - c[1];
  const double p2x2x = 3.0 * c[4] - c[6];
  const double p2x2y = 3.0 * c[5] - c[7];
  const double dx = p2x2x - p1x2x;
  const double dy = p2x2y - p1x2y;
  const double err = dx * dx + dy * dy;
  if (!(err > 0.0)) return 1;
  const int64_t n =
      static_cast<int64_t>(std::ceil(std::pow(err / max_hypot2, 1.0 / 6.0)));
  return std::max<int64_t>(n, 1);
}

void cubic_eval(const double* c, double t, double* out) {
  const double mt = 1.0 - t;
  const double a = mt * mt * mt;
  const double b = 3.0 * mt * mt * t;
  const double cc = 3.0 * mt * t * t;
  const double d = t * t * t;
  out[0] = a * c[0] + b * c[2] + cc * c[4] + d * c[6];
  out[1] = a * c[1] + b * c[3] + cc * c[5] + d * c[7];
}

}  // namespace piet

extern "C" int64_t pm_flatten_cubics(const double* cubics, int64_t n,
                                     double accuracy, double* out_pts,
                                     int64_t out_cap, int32_t* out_counts) {
  int64_t total = 0;
  for (int64_t i = 0; i < n; ++i) {
    const double* c = cubics + i * 8;
    const int64_t k = piet::quad_count(c, accuracy);
    if (out_counts) out_counts[i] = static_cast<int32_t>(k);
    if (total + k > out_cap) return -1;
    for (int64_t j = 0; j < k; ++j) {
      piet::cubic_eval(c, static_cast<double>(j + 1) / static_cast<double>(k),
                       out_pts + (total + j) * 2);
    }
    total += k;
  }
  return total;
}
