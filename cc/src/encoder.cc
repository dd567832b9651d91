// Native scene encoder: byte-exact wire-format writer.
//
// Native equivalent of the reference's Rust Encoder (reference:
// src/lib.rs:79-254).  Bump-allocates one flat byte buffer; groups are
// [SimpleGroup header][n x ShortBbox][n x 32-byte PietItem] with point data
// appended in item order.  Uses the generated layout header (cc/gen/) as
// the single source of truth for offsets/sizes.

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

#include "piet_cc.h"
#include "../gen/piet_scene_gen.h"

namespace {

constexpr uint32_t kGroupHeaderSize = 8;  // Rust SimpleGroup (src/lib.rs:17)
constexpr uint32_t kBboxSize = 8;
constexpr uint32_t kItemSize = piet::PIET_ITEM_SIZE;

uint32_t to_be(uint32_t v) {
  return ((v & 0xFF) << 24) | ((v & 0xFF00) << 8) | ((v >> 8) & 0xFF00) |
         (v >> 24);
}

struct Bbox {
  double x0, y0, x1, y1;
};

// ShortBbox::from_rect quantization (src/lib.rs:88-97).
void write_short_bbox(char* p, const Bbox& b) {
  auto q = [](double v) -> uint16_t {
    return static_cast<uint16_t>(
        std::min(std::max(v, 0.0), 65535.0));
  };
  uint16_t vals[4] = {q(std::floor(b.x0)), q(std::floor(b.y0)),
                      q(std::ceil(b.x1)), q(std::ceil(b.y1))};
  std::memcpy(p, vals, 8);
}

}  // namespace

struct PmEncoder {
  char* buf;
  int64_t cap;
  int64_t free_space = 0;
  int64_t group_start = 0;
  int32_t group_count = 0;
  int32_t group_ix = 0;
  bool error = false;

  int64_t alloc(int64_t size) {
    const int64_t at = free_space;
    free_space += size;
    if (free_space > cap) error = true;
    return at;
  }

  bool add_item(const Bbox& bbox, uint32_t tag,
                const void* body, size_t body_len) {
    if (error || group_ix >= group_count) return false;
    const int64_t bbox_ix =
        group_start + kGroupHeaderSize + group_ix * kBboxSize;
    write_short_bbox(buf + bbox_ix, bbox);
    const int64_t item_ix = group_start + kGroupHeaderSize +
                            static_cast<int64_t>(group_count) * kBboxSize +
                            static_cast<int64_t>(group_ix) * kItemSize;
    std::memset(buf + item_ix, 0, kItemSize);
    std::memcpy(buf + item_ix, &tag, 4);
    if (body_len) std::memcpy(buf + item_ix + 4, body, body_len);
    ++group_ix;
    return true;
  }

  // encode_points (src/lib.rs:224-240): append f32 pairs, return offset +
  // union bbox.
  int64_t encode_points(const double* pts, int32_t n, Bbox* bbox) {
    const int64_t at = alloc(static_cast<int64_t>(n) * 8);
    if (error) return -1;
    Bbox b{pts[0], pts[1], pts[0], pts[1]};
    for (int32_t i = 0; i < n; ++i) {
      const float xy[2] = {static_cast<float>(pts[2 * i]),
                           static_cast<float>(pts[2 * i + 1])};
      std::memcpy(buf + at + i * 8, xy, 8);
      b.x0 = std::min(b.x0, pts[2 * i]);
      b.y0 = std::min(b.y0, pts[2 * i + 1]);
      b.x1 = std::max(b.x1, pts[2 * i]);
      b.y1 = std::max(b.y1, pts[2 * i + 1]);
    }
    *bbox = b;
    return at;
  }
};

extern "C" {

PmEncoder* pm_encoder_new(uint8_t* buf, int64_t buf_size) {
  auto* e = new PmEncoder();
  e->buf = reinterpret_cast<char*>(buf);
  e->cap = buf_size;
  return e;
}

void pm_encoder_free(PmEncoder* e) { delete e; }

int32_t pm_encoder_begin_group(PmEncoder* e, int32_t n_items) {
  const int64_t item_start =
      kGroupHeaderSize + static_cast<int64_t>(n_items) * kBboxSize;
  const int64_t total =
      item_start + static_cast<int64_t>(n_items) * kItemSize;
  e->group_start = e->alloc(total);
  if (e->error) return -1;
  e->group_count = n_items;
  e->group_ix = 0;
  const uint32_t hdr[2] = {
      static_cast<uint32_t>(n_items),
      static_cast<uint32_t>(e->group_start + item_start)};
  std::memcpy(e->buf + e->group_start, hdr, 8);
  return 0;
}

int32_t pm_encoder_end_group(PmEncoder* e) {
  return (e->group_ix == e->group_count && !e->error) ? 0 : -1;
}

int32_t pm_encoder_circle(PmEncoder* e, double cx, double cy, double r) {
  Bbox b{cx - r, cy - r, cx + r, cy + r};
  return e->add_item(b, piet::PietItem_Circle, nullptr, 0) ? 0 : -1;
}

int32_t pm_encoder_stroke_line(PmEncoder* e, double x0, double y0, double x1,
                               double y1, float width, uint32_t rgba) {
  struct {
    uint32_t flags, rgba;
    float width, sx, sy, ex, ey;
  } body{0, to_be(rgba), width, static_cast<float>(x0),
         static_cast<float>(y0), static_cast<float>(x1),
         static_cast<float>(y1)};
  const double hw = static_cast<double>(width * 0.5f);
  Bbox b{std::min(x0, x1) - hw, std::min(y0, y1) - hw,
         std::max(x0, x1) + hw, std::max(y0, y1) + hw};
  return e->add_item(b, piet::PietItem_Line, &body, sizeof(body)) ? 0 : -1;
}

int32_t pm_encoder_fill(PmEncoder* e, const double* pts, int32_t n,
                        uint32_t rgba, uint32_t flags) {
  if (n <= 0) return -1;
  Bbox b;
  const int64_t ix = e->encode_points(pts, n, &b);
  if (ix < 0) return -1;
  // flags bit 0 = even-odd fill rule (piet-tpu extension; the reference
  // always writes 0 here, src/lib.rs:47-53 -- see scene/wire.py).
  struct {
    uint32_t flags, rgba, n_points, points_ix;
  } body{flags, to_be(rgba), static_cast<uint32_t>(n),
         static_cast<uint32_t>(ix)};
  return e->add_item(b, piet::PietItem_Fill, &body, sizeof(body)) ? 0 : -1;
}

int32_t pm_encoder_polyline(PmEncoder* e, const double* pts, int32_t n,
                            uint32_t rgba, float width) {
  if (n <= 0) return -1;
  Bbox b;
  const int64_t ix = e->encode_points(pts, n, &b);
  if (ix < 0) return -1;
  const double hw = static_cast<double>(width * 0.5f);
  b.x0 -= hw;
  b.y0 -= hw;
  b.x1 += hw;
  b.y1 += hw;
  struct {
    uint32_t rgba;
    float width;
    uint32_t n_points, points_ix;
  } body{to_be(rgba), width, static_cast<uint32_t>(n),
         static_cast<uint32_t>(ix)};
  return e->add_item(b, piet::PietItem_Poly, &body, sizeof(body)) ? 0 : -1;
}

int64_t pm_encoder_size(const PmEncoder* e) {
  return e->error ? -1 : e->free_space;
}

const char* pm_version(void) { return "piet-cc 0.1.0"; }

}  // extern "C"
