// Native golden rasterizer: wire-format scene -> RGBA8 image.
//
// Scalar C++ implementation of the reference's two GPU kernels --
// tileKernel (PietRender.metal:160-454) and renderKernel (:457-566) --
// byte-compatible with the Python oracle in piet_tpu/raster/ (identical f32
// expressions; compiled with -ffp-contract=off so multiply/add rounding
// matches numpy).  Used as a fast independent oracle for large images and
// as the native-component parity deliverable (SURVEY.md section 7,
// translation decision 3).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "piet_cc.h"
#include "../gen/piet_scene_gen.h"
#include "../gen/piet_ptcl_gen.h"
#include "../gen/piet_srgb_gen.h"

namespace {

using std::uint32_t;

float saturate(float v) { return std::min(std::max(v, 0.0f), 1.0f); }

float fsign(float v) { return v > 0.0f ? 1.0f : (v < 0.0f ? -1.0f : 0.0f); }

// sRGB decode/encode use the generated deterministic definitions
// (cc/gen/piet_srgb_gen.h; see piet_tpu/scene/color.py for rationale).
float srgb_encode(float v) { return piet_srgb::encode(v); }

struct LinColor {
  float r, g, b, a;
};

// Logical 0xRRGGBBAA -> linear rgb + alpha (see piet_tpu/scene/color.py).
LinColor decode_color(uint32_t c) {
  return {piet_srgb::decode((c >> 24) & 0xFF),
          piet_srgb::decode((c >> 16) & 0xFF),
          piet_srgb::decode((c >> 8) & 0xFF),
          (c & 0xFF) / 255.0f};
}

uint32_t from_be(uint32_t v) {
  return ((v & 0xFF) << 24) | ((v & 0xFF00) << 8) | ((v >> 8) & 0xFF00) |
         (v >> 24);
}

// ---- PTCL command (dense form; see piet_tpu/raster/ptcl.py) -------------
struct Cmd {
  int32_t tag;
  float a[8];
};

// TileEncoder semantics (PietRender.metal:69-157).
struct TileEnc {
  std::vector<Cmd> cmds;
  uint32_t solid_color = 0xFFFFFFFF;
  int32_t overflow = 0;
  int32_t capacity;

  explicit TileEnc(int32_t cap) : capacity(cap) {}

  void push(int32_t tag, std::initializer_list<float> args) {
    if (static_cast<int32_t>(cmds.size()) >= capacity) {
      ++overflow;
      return;
    }
    Cmd c{tag, {0, 0, 0, 0, 0, 0, 0, 0}};
    int i = 0;
    for (float v : args) c.a[i++] = v;
    cmds.push_back(c);
  }

  void clear_solid() { solid_color = 0; }

  // ycull: the emitting stroke's hw + 0.5 in arg word 4 (unused by the
  // fine math; the TPU kernel's row-cull threshold -- see ops/fine.py).
  void line(float x0, float y0, float x1, float y1, float ycull) {
    clear_solid();
    push(piet::Cmd_Line, {x0, y0, x1, y1, ycull});
  }
  void stroke(uint32_t rgba, float width) {
    clear_solid();
    const LinColor c = decode_color(rgba);
    push(piet::Cmd_Stroke, {0.5f * width, c.r, c.g, c.b, c.a});
  }
  void fill(float x0, float y0, float x1, float y1) {
    push(piet::Cmd_Fill, {x0, y0, x1, y1});
  }
  void fill_edge(float sign, float y) {
    push(piet::Cmd_FillEdge, {sign, y});
  }
  void draw_fill(int backdrop, uint32_t rgba) {
    clear_solid();
    const LinColor c = decode_color(rgba);
    push(piet::Cmd_DrawFill,
         {static_cast<float>(backdrop), c.r, c.g, c.b, c.a});
  }
  void circle(const uint16_t* bbox) {
    clear_solid();
    push(piet::Cmd_Circle,
         {static_cast<float>(bbox[0]), static_cast<float>(bbox[1]),
          static_cast<float>(bbox[2]), static_cast<float>(bbox[3])});
  }
  void solid(uint32_t rgba) {
    if ((rgba & 0xFF) == 0xFF) {  // opaque: cursor reset (:127-142)
      solid_color = rgba;
      cmds.clear();
      overflow = 0;
    }
    const LinColor c = decode_color(rgba);
    push(piet::Cmd_Solid, {c.r, c.g, c.b, c.a});
  }
};

struct Seg {
  float sx, sy, ex, ey, a, b, c, xmin, ymin, xmax, ymax;
};

std::vector<Seg> make_segs(const float* pts, uint32_t n, bool wrap) {
  std::vector<Seg> out;
  const uint32_t count = wrap ? n : (n > 0 ? n - 1 : 0);
  out.reserve(count);
  for (uint32_t i = 0; i < count; ++i) {
    const uint32_t j = (i + 1 == n) ? 0 : i + 1;
    Seg s;
    s.sx = pts[2 * i];
    s.sy = pts[2 * i + 1];
    s.ex = pts[2 * j];
    s.ey = pts[2 * j + 1];
    s.a = s.ey - s.sy;
    s.b = s.sx - s.ex;
    s.c = -(s.a * s.sx + s.b * s.sy);
    s.xmin = std::min(s.sx, s.ex);
    s.xmax = std::max(s.sx, s.ex);
    s.ymin = std::min(s.sy, s.ey);
    s.ymax = std::max(s.sy, s.ey);
    out.push_back(s);
  }
  return out;
}

// Fill item for one tile (PietRender.metal:248-364; see cpu_tiler.py).
void fill_tile(TileEnc& enc, const std::vector<Seg>& segs, uint32_t rgba,
               float x0, float y0, float tw, float th) {
  float backdrop = 0.0f;
  bool any_fill = false;
  for (const Seg& s : segs) {
    if (!(s.ymax >= y0 && s.ymin < y0 + th)) continue;
    const float left = s.a * x0;
    const float right = s.a * (x0 + tw);
    const float ytop = std::max(y0, s.ymin);
    const float ybot = std::min(y0 + th, s.ymax);
    const float top = s.b * ytop;
    const float bot = s.b * ybot;
    const float s_top_left = fsign(left + y0 * s.b + s.c);
    const float s00 = fsign(top + left + s.c);
    const float s01 = fsign(top + right + s.c);
    const float s10 = fsign(bot + left + s.c);
    const float s11 = fsign(bot + right + s.c);
    const bool four = s00 * s01 + s00 * s10 + s00 * s11 < 3.0f;
    if (s_top_left == fsign(s.a) && s.ymin <= y0) backdrop -= s00;
    if (s.xmin < x0 && s.xmax > x0) {
      const float t_edge = (s.sx - x0) / s.b;
      const float y_edge = s.sy + (s.ey - s.sy) * t_edge;
      if (y_edge >= y0 && y_edge < y0 + th) {
        enc.fill_edge(s00, y_edge);
        if (s.b > 0.0f) {
          enc.fill(s.sx, s.sy, x0, y_edge);
        } else {
          enc.fill(x0, y_edge, s.ex, s.ey);
        }
        any_fill = true;
      } else if (four) {
        enc.fill(s.sx, s.sy, s.ex, s.ey);
        any_fill = true;
      }
    } else if (four && s.xmin < x0 + tw && s.xmax > x0) {
      enc.fill(s.sx, s.sy, s.ex, s.ey);
      any_fill = true;
    }
  }
  if (any_fill) {
    enc.draw_fill(static_cast<int>(backdrop), rgba);
  } else if (backdrop != 0.0f) {
    enc.solid(rgba);
  }
}

void poly_tile(TileEnc& enc, const std::vector<Seg>& segs, uint32_t rgba,
               float width, float x0, float y0, float tw, float th) {
  const float hw = 0.5f * width + 0.5f;
  bool any = false;
  for (const Seg& s : segs) {
    if (!(s.ymax > y0 - hw && s.ymin < y0 + th + hw && s.xmax > x0 - hw &&
          s.xmin < x0 + tw + hw))
      continue;
    const float left = s.a * (x0 - hw);
    const float right = s.a * (x0 + tw + hw);
    const float top = s.b * (y0 - hw);
    const float bot = s.b * (y0 + th + hw);
    const float s00 = fsign(top + left + s.c);
    const float s01 = fsign(top + right + s.c);
    const float s10 = fsign(bot + left + s.c);
    const float s11 = fsign(bot + right + s.c);
    if (s00 * s01 + s00 * s10 + s00 * s11 < 3.0f) {
      enc.line(s.sx, s.sy, s.ex, s.ey, hw);
      any = true;
    }
  }
  if (any) enc.stroke(rgba, width);
}

void line_tile(TileEnc& enc, const Seg& s, uint32_t rgba, float width,
               float x0, float y0, float tw, float th) {
  const float hw = 0.5f * width + 0.5f;
  const float left = s.a * (x0 - hw);
  const float right = s.a * (x0 + tw + hw);
  const float top = s.b * (y0 - hw);
  const float bot = s.b * (y0 + th + hw);
  const float s00 = fsign(top + left + s.c);
  const float s01 = fsign(top + right + s.c);
  const float s10 = fsign(bot + left + s.c);
  const float s11 = fsign(bot + right + s.c);
  if (s00 * s01 + s00 * s10 + s00 * s11 < 3.0f) {
    enc.line(s.sx, s.sy, s.ex, s.ey, hw);
    enc.stroke(rgba, width);
  }
}

// Fine interpreter for one pixel (PietRender.metal:457-566).
void render_pixel(const std::vector<Cmd>& cmds, float X, float Y,
                  float rgb[3]) {
  float df = 1e9f;
  float area = 0.0f;
  rgb[0] = rgb[1] = rgb[2] = 1.0f;
  for (const Cmd& c : cmds) {
    switch (c.tag) {
      case piet::Cmd_Circle: {
        const float cx = c.a[0] + 0.5f * (c.a[2] - c.a[0]);
        const float cy = c.a[1] + 0.5f * (c.a[3] - c.a[1]);
        const float dx = X - cx, dy = Y - cy;
        const float r = std::sqrt(dx * dx + dy * dy);
        const float circle_r = std::min(cx - c.a[0], cy - c.a[1]);
        const float alpha = saturate(circle_r - r);
        for (int k = 0; k < 3; ++k) rgb[k] = rgb[k] * (1.0f - alpha);
        break;
      }
      case piet::Cmd_Line: {
        const float lvx = c.a[2] - c.a[0], lvy = c.a[3] - c.a[1];
        const float dpx = X - c.a[0], dpy = Y - c.a[1];
        const float denom = lvx * lvx + lvy * lvy;
        const float t =
            denom > 0.0f ? saturate((lvx * dpx + lvy * dpy) / denom) : 0.0f;
        const float fx = lvx * t - dpx, fy = lvy * t - dpy;
        df = std::min(df, std::sqrt(fx * fx + fy * fy));
        break;
      }
      case piet::Cmd_Stroke: {
        const float alpha = saturate(c.a[0] + 0.5f - df);
        const float w = c.a[4] * alpha;
        for (int k = 0; k < 3; ++k) rgb[k] = rgb[k] + (c.a[1 + k] - rgb[k]) * w;
        df = 1e9f;
        break;
      }
      case piet::Cmd_Fill: {
        const float rsx = c.a[0] - X, rsy = c.a[1] - Y;
        const float rex = c.a[2] - X, rey = c.a[3] - Y;
        const float w0 = saturate(rsy), w1 = saturate(rey);
        if (w0 != w1) {
          const float dy = rey - rsy;
          const float t0 = (w0 - rsy) / dy, t1 = (w1 - rsy) / dy;
          const float xs0 = rsx + (rex - rsx) * t0;
          const float xs1 = rsx + (rex - rsx) * t1;
          const float xmin = std::min(std::min(xs0, xs1), 1.0f) - 1e-6f;
          const float xmax = std::max(xs0, xs1);
          const float bq = std::min(xmax, 1.0f);
          const float cq = std::max(bq, 0.0f);
          const float dq = std::max(xmin, 0.0f);
          float a_cov;
          if (xmax - xmin > 1e-4f) {
            a_cov = (bq + 0.5f * (dq * dq - cq * cq) - xmin) / (xmax - xmin);
          } else {
            a_cov = 1.0f - saturate(xs0);  // wide degenerate-column guard
                                           // (near-vertical edges), see
                                           // cpu_fine.py
          }
          area += a_cov * (w0 - w1);
        }
        break;
      }
      case piet::Cmd_FillEdge: {
        area += c.a[0] * saturate(Y - c.a[1] + 1.0f);
        break;
      }
      case piet::Cmd_DrawFill: {
        const float x = area + c.a[0];
        // a[5] selects the fill rule: 0 = nonzero winding, 1 = even-odd
        // (piet FillRule::EvenOdd extension; see piet_tpu/scene/scene.py).
        const float alpha =
            c.a[5] != 0.0f
                ? std::fabs(x - 2.0f * std::nearbyintf(0.5f * x))
                : std::min(std::fabs(x), 1.0f);
        const float w = c.a[4] * alpha;
        for (int k = 0; k < 3; ++k) rgb[k] = rgb[k] + (c.a[1 + k] - rgb[k]) * w;
        area = 0.0f;
        break;
      }
      case piet::Cmd_Solid: {
        const float w = c.a[3];
        for (int k = 0; k < 3; ++k) rgb[k] = rgb[k] + (c.a[k] - rgb[k]) * w;
        break;
      }
      default:
        break;
    }
  }
}

}  // namespace

extern "C" int64_t pm_render_golden(const uint8_t* scene_buf,
                                    int64_t scene_size, int32_t width,
                                    int32_t height, int32_t tile_w,
                                    int32_t tile_h, int32_t cmd_capacity,
                                    uint8_t* out_rgba) {
  const char* buf = reinterpret_cast<const char*>(scene_buf);
  (void)scene_size;
  const uint32_t n_items = piet::load_u32(buf, 0);
  const uint32_t items_ix = piet::load_u32(buf, 4);

  struct Item {
    uint32_t tag, rgba;
    float width;
    uint16_t bbox[4];
    std::vector<Seg> segs;
  };
  std::vector<Item> items(n_items);
  for (uint32_t i = 0; i < n_items; ++i) {
    Item& it = items[i];
    std::memcpy(it.bbox, buf + 8 + i * 8, 8);
    const uint32_t ref = items_ix + i * piet::PIET_ITEM_SIZE;
    it.tag = piet::PietItem_tag(buf, ref);
    if (it.tag == piet::PietItem_Line) {
      const auto line = piet::PietStrokeLine_read(buf, ref);
      it.rgba = from_be(line.rgba_color);
      it.width = line.width;
      const float pts[4] = {line.start[0], line.start[1], line.end[0],
                            line.end[1]};
      it.segs = make_segs(pts, 2, false);
    } else if (it.tag == piet::PietItem_Fill) {
      const auto fill = piet::PietFill_read(buf, ref);
      it.rgba = from_be(fill.rgba_color);
      it.width = 0;
      it.segs = make_segs(
          reinterpret_cast<const float*>(buf + fill.points_ix),
          fill.n_points, true);
    } else if (it.tag == piet::PietItem_Poly) {
      const auto poly = piet::PietStrokePolyLine_read(buf, ref);
      it.rgba = from_be(poly.rgba_color);
      it.width = poly.width;
      it.segs = make_segs(
          reinterpret_cast<const float*>(buf + poly.points_ix),
          poly.n_points, false);
    }
  }

  const int32_t tiles_x = (width + tile_w - 1) / tile_w;
  const int32_t tiles_y = (height + tile_h - 1) / tile_h;
  const float twf = static_cast<float>(tile_w);
  const float thf = static_cast<float>(tile_h);
  int64_t total_overflow = 0;

  for (int32_t ty = 0; ty < tiles_y; ++ty) {
    for (int32_t tx = 0; tx < tiles_x; ++tx) {
      const float x0 = tx * twf, y0 = ty * thf;
      TileEnc enc(cmd_capacity);
      for (const Item& it : items) {
        const bool hit = it.bbox[2] >= x0 && it.bbox[0] < x0 + twf &&
                         it.bbox[3] >= y0 && it.bbox[1] < y0 + thf;
        if (!hit) continue;
        switch (it.tag) {
          case piet::PietItem_Circle:
            enc.circle(it.bbox);
            break;
          case piet::PietItem_Line:
            if (!it.segs.empty())
              line_tile(enc, it.segs[0], it.rgba, it.width, x0, y0, twf, thf);
            break;
          case piet::PietItem_Fill:
            fill_tile(enc, it.segs, it.rgba, x0, y0, twf, thf);
            break;
          case piet::PietItem_Poly:
            poly_tile(enc, it.segs, it.rgba, it.width, x0, y0, twf, thf);
            break;
        }
      }
      total_overflow += enc.overflow;
      // Rasterize this tile.
      const int32_t px_w = std::min(tile_w, width - tx * tile_w);
      const int32_t px_h = std::min(tile_h, height - ty * tile_h);
      if (enc.solid_color) {
        const uint32_t s = enc.solid_color;
        const uint8_t col[4] = {
            static_cast<uint8_t>((s >> 24) & 0xFF),
            static_cast<uint8_t>((s >> 16) & 0xFF),
            static_cast<uint8_t>((s >> 8) & 0xFF),
            static_cast<uint8_t>(s & 0xFF)};
        for (int32_t py = 0; py < px_h; ++py) {
          uint8_t* row = out_rgba +
                         ((ty * tile_h + py) * static_cast<int64_t>(width) +
                          tx * tile_w) * 4;
          for (int32_t px = 0; px < px_w; ++px)
            std::memcpy(row + px * 4, col, 4);
        }
      } else {
        for (int32_t py = 0; py < px_h; ++py) {
          uint8_t* row = out_rgba +
                         ((ty * tile_h + py) * static_cast<int64_t>(width) +
                          tx * tile_w) * 4;
          for (int32_t px = 0; px < px_w; ++px) {
            float rgb[3];
            render_pixel(enc.cmds, static_cast<float>(tx * tile_w + px),
                         static_cast<float>(ty * tile_h + py), rgb);
            for (int k = 0; k < 3; ++k) {
              const float s = srgb_encode(std::min(std::max(rgb[k], 0.0f),
                                                   1.0f));
              row[px * 4 + k] = static_cast<uint8_t>(
                  std::lrintf(s * 255.0f));
            }
            row[px * 4 + 3] = 255;
          }
        }
      }
    }
  }
  return total_overflow;
}
