// Native SVG loader: path-data parsing, flattening, scene building.
//
// Native equivalent of the reference's make_tiger pipeline (reference:
// src/lib.rs:286-385): scan the document's first <g> for path elements,
// parse `d`, scale, flatten, and encode fills/strokes with the thin-line
// fudge and reference color parsing.  The XML handling is a minimal
// element/attribute scanner (the reference used roxmltree with a note that
// it "will be factored out", Cargo.toml:15).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include "piet_cc.h"

namespace piet {
int64_t quad_count(const double* c, double accuracy);
void cubic_eval(const double* c, double t, double* out);
}  // namespace piet

namespace {

constexpr double kTolerance = 0.1;   // src/lib.rs:330
constexpr float kThinLine = 0.7f;    // src/lib.rs:351

struct Pt {
  double x = 0, y = 0;
};

using Subpath = std::vector<Pt>;

// ---- SVG path data parser + flattener (lines/cubics; matches the Python
// parser for the subset the tiger uses; quads are dropped like the
// reference flattener, flatten.rs:40) ----

// Path elements in user space; flattening happens after scaling so the
// tolerance applies in device space, as the reference does (the scaled path
// is flattened, src/lib.rs:297,343).
struct PathEl {
  enum Kind { kMove, kLine, kCurve } kind;
  Pt p1, p2, p3;  // curve: controls + end; move/line: p3 only
};

struct PathParser {
  const char* p;
  const char* end;
  Pt cur, start, last_ctrl;
  char last_cmd = 0;
  std::vector<PathEl> els;

  explicit PathParser(const std::string& d)
      : p(d.data()), end(d.data() + d.size()) {}

  void skip_ws() {
    while (p < end && (std::isspace(*p) || *p == ',')) ++p;
  }

  bool peek_number() {
    skip_ws();
    return p < end && (std::isdigit(*p) || *p == '-' || *p == '+' ||
                       *p == '.');
  }

  double number() {
    skip_ws();
    char* out;
    const double v = std::strtod(p, &out);
    p = out;
    return v;
  }

  void begin_subpath(Pt pt) { els.push_back({PathEl::kMove, {}, {}, pt}); }

  void line_to(Pt pt) { els.push_back({PathEl::kLine, {}, {}, pt}); }

  void curve_to(Pt c1, Pt c2, Pt pend) {
    els.push_back({PathEl::kCurve, c1, c2, pend});
  }

  // SVG elliptical arc -> cubics (W3C F.6.5/F.6.6); must match the Python
  // implementation in piet_tpu/geometry/svg_path.py bit-for-bit (f64).
  void arc_to(double rx, double ry, double x_rot_deg, bool large_arc,
              bool sweep, Pt p1) {
    const double x1 = cur.x, y1 = cur.y, x2 = p1.x, y2 = p1.y;
    if (x1 == x2 && y1 == y2) return;
    rx = std::fabs(rx);
    ry = std::fabs(ry);
    if (rx == 0.0 || ry == 0.0) {
      curve_to({x1 + (x2 - x1) / 3, y1 + (y2 - y1) / 3},
               {x1 + 2 * (x2 - x1) / 3, y1 + 2 * (y2 - y1) / 3}, p1);
      return;
    }
    const double phi = x_rot_deg * (M_PI / 180.0);
    const double cp = std::cos(phi), sp = std::sin(phi);
    const double dx2 = (x1 - x2) / 2.0, dy2 = (y1 - y2) / 2.0;
    const double x1p = cp * dx2 + sp * dy2;
    const double y1p = -sp * dx2 + cp * dy2;
    const double lam = (x1p / rx) * (x1p / rx) + (y1p / ry) * (y1p / ry);
    if (lam > 1.0) {
      const double s = std::sqrt(lam);
      rx *= s;
      ry *= s;
    }
    const double num =
        rx * rx * ry * ry - rx * rx * y1p * y1p - ry * ry * x1p * x1p;
    const double den = rx * rx * y1p * y1p + ry * ry * x1p * x1p;
    double coef = std::sqrt(std::max(num / den, 0.0));
    if (large_arc == sweep) coef = -coef;
    const double cxp = coef * rx * y1p / ry;
    const double cyp = -coef * ry * x1p / rx;
    const double cx = cp * cxp - sp * cyp + (x1 + x2) / 2.0;
    const double cy = sp * cxp + cp * cyp + (y1 + y2) / 2.0;
    auto angle = [](double ux, double uy, double vx, double vy) {
      const double dot = ux * vx + uy * vy;
      const double norm = std::hypot(ux, uy) * std::hypot(vx, vy);
      double a = std::acos(std::max(-1.0, std::min(1.0, dot / norm)));
      if (ux * vy - uy * vx < 0) a = -a;
      return a;
    };
    const double theta1 =
        angle(1.0, 0.0, (x1p - cxp) / rx, (y1p - cyp) / ry);
    double dtheta = angle((x1p - cxp) / rx, (y1p - cyp) / ry,
                          (-x1p - cxp) / rx, (-y1p - cyp) / ry);
    if (!sweep && dtheta > 0) {
      dtheta -= 2 * M_PI;
    } else if (sweep && dtheta < 0) {
      dtheta += 2 * M_PI;
    }
    const int n_segs = std::max(
        1, static_cast<int>(std::ceil(std::fabs(dtheta) / (M_PI / 2.0))));
    auto on_ellipse = [&](double t) -> Pt {
      const double ct = std::cos(t), st = std::sin(t);
      return {cx + rx * cp * ct - ry * sp * st,
              cy + rx * sp * ct + ry * cp * st};
    };
    auto deriv = [&](double t) -> Pt {
      const double ct = std::cos(t), st = std::sin(t);
      return {-rx * cp * st - ry * sp * ct, -rx * sp * st + ry * cp * ct};
    };
    for (int i = 0; i < n_segs; ++i) {
      const double t0 = theta1 + dtheta * i / n_segs;
      const double t1 = theta1 + dtheta * (i + 1) / n_segs;
      const double k = 4.0 / 3.0 * std::tan((t1 - t0) / 4.0);
      const Pt s0 = on_ellipse(t0), s1 = on_ellipse(t1);
      const Pt d0 = deriv(t0), d1 = deriv(t1);
      curve_to({s0.x + k * d0.x, s0.y + k * d0.y},
               {s1.x - k * d1.x, s1.y - k * d1.y}, s1);
    }
  }

  void run() {
    while (true) {
      skip_ws();
      if (p >= end) break;
      char cmd;
      if (std::isalpha(*p)) {
        cmd = *p++;
      } else if (last_cmd) {
        cmd = (last_cmd == 'M') ? 'L' : (last_cmd == 'm') ? 'l' : last_cmd;
      } else {
        break;  // malformed
      }
      const bool rel = std::islower(cmd);
      const char op = std::toupper(cmd);
      auto ap = [&](double x, double y) -> Pt {
        return rel ? Pt{cur.x + x, cur.y + y} : Pt{x, y};
      };
      switch (op) {
        case 'M': {
          const double x = number(), y = number();
          cur = ap(x, y);
          start = cur;
          begin_subpath(cur);
          last_ctrl = cur;
          break;
        }
        case 'L': {
          const double x = number(), y = number();
          cur = ap(x, y);
          line_to(cur);
          last_ctrl = cur;
          break;
        }
        case 'H': {
          const double x = number();
          cur = rel ? Pt{cur.x + x, cur.y} : Pt{x, cur.y};
          line_to(cur);
          last_ctrl = cur;
          break;
        }
        case 'V': {
          const double y = number();
          cur = rel ? Pt{cur.x, cur.y + y} : Pt{cur.x, y};
          line_to(cur);
          last_ctrl = cur;
          break;
        }
        case 'C': {
          const double x1 = number(), y1 = number(), x2 = number(),
                       y2 = number(), x = number(), y = number();
          const Pt c1 = ap(x1, y1), c2 = ap(x2, y2), pe = ap(x, y);
          curve_to(c1, c2, pe);
          last_ctrl = c2;
          cur = pe;
          break;
        }
        case 'S': {
          const double x2 = number(), y2 = number(), x = number(),
                       y = number();
          const char lu = std::toupper(last_cmd);
          const Pt c1 = (lu == 'C' || lu == 'S')
                            ? Pt{2 * cur.x - last_ctrl.x,
                                 2 * cur.y - last_ctrl.y}
                            : cur;
          const Pt c2 = ap(x2, y2), pe = ap(x, y);
          curve_to(c1, c2, pe);
          last_ctrl = c2;
          cur = pe;
          break;
        }
        case 'Q':
        case 'T': {
          // Quads are dropped by the reference flattener (flatten.rs:40);
          // consume operands, move the pen.
          const int kn = (op == 'Q') ? 4 : 2;
          double v[4];
          for (int i = 0; i < kn; ++i) v[i] = number();
          const Pt pe = ap(v[kn - 2], v[kn - 1]);
          if (op == 'Q') last_ctrl = ap(v[0], v[1]);
          cur = pe;
          break;
        }
        case 'A': {
          const double rx = number(), ry = number(), rot = number(),
                       laf = number(), swf = number(), x = number(),
                       y = number();
          const Pt pe = ap(x, y);
          arc_to(rx, ry, rot, laf != 0.0, swf != 0.0, pe);
          cur = pe;
          last_ctrl = cur;
          break;
        }
        case 'Z':
          cur = start;
          last_ctrl = cur;
          break;
        default:
          // Unknown command: skip its numbers.
          while (peek_number()) number();
          break;
      }
      last_cmd = cmd;
    }
  }
};

// flatten_path semantics (flatten.rs:10-47): MoveTo starts a subpath,
// LineTo appends, CurveTo appends uniform-parameter chord endpoints.
std::vector<Subpath> flatten_elements(const std::vector<PathEl>& els,
                                      double scale, double accuracy) {
  std::vector<Subpath> out;
  Subpath cur_sp;
  bool has = false;
  Pt last{0, 0};
  for (const PathEl& el : els) {
    const Pt p3{el.p3.x * scale, el.p3.y * scale};
    switch (el.kind) {
      case PathEl::kMove:
        if (has) out.push_back(std::move(cur_sp));
        cur_sp = {p3};
        has = true;
        last = p3;
        break;
      case PathEl::kLine:
        cur_sp.push_back(p3);
        last = p3;
        break;
      case PathEl::kCurve: {
        const double c[8] = {last.x, last.y, el.p1.x * scale,
                             el.p1.y * scale, el.p2.x * scale,
                             el.p2.y * scale, p3.x, p3.y};
        const int64_t n = piet::quad_count(c, accuracy);
        for (int64_t i = 0; i < n; ++i) {
          double o[2];
          piet::cubic_eval(c, static_cast<double>(i + 1) / n, o);
          cur_sp.push_back({o[0], o[1]});
        }
        last = p3;
        break;
      }
    }
  }
  if (has) out.push_back(std::move(cur_sp));
  return out;
}

// parse_color (src/lib.rs:375-385): #rgb / #rrggbb -> 0xRRGGBBAA, else
// magenta-ish fallback.
uint32_t parse_color(const std::string& s) {
  if (!s.empty() && s[0] == '#') {
    uint32_t hex = static_cast<uint32_t>(
        std::strtoul(s.c_str() + 1, nullptr, 16));
    if (s.size() == 4) {
      hex = (hex >> 8) * 0x110000 + ((hex >> 4) & 0xF) * 0x1100 +
            (hex & 0xF) * 0x11;
    }
    return (hex << 8) + 0xFF;
  }
  return 0xFF00FF80;
}

// ---- minimal XML scan: elements of the first <g>, attribute extraction --

struct PathElement {
  std::string d, fill, stroke, stroke_width, fill_rule;
  bool has_fill = false, has_stroke = false;
};

bool get_attr(const std::string& tag, const char* name, std::string* out) {
  const std::string needle = std::string(" ") + name + "=\"";
  size_t at = tag.find(needle);
  if (at == std::string::npos) return false;
  at += needle.size();
  const size_t endq = tag.find('"', at);
  if (endq == std::string::npos) return false;
  *out = tag.substr(at, endq - at);
  return true;
}

std::vector<PathElement> scan_paths(const std::string& doc) {
  std::vector<PathElement> out;
  size_t pos = 0;
  while ((pos = doc.find("<path", pos)) != std::string::npos) {
    const size_t endt = doc.find('>', pos);
    if (endt == std::string::npos) break;
    const std::string tag = doc.substr(pos, endt - pos);
    PathElement pe;
    if (get_attr(tag, "d", &pe.d)) {
      pe.has_fill = get_attr(tag, "fill", &pe.fill);
      get_attr(tag, "fill-rule", &pe.fill_rule);
      pe.has_stroke = get_attr(tag, "stroke", &pe.stroke);
      get_attr(tag, "stroke-width", &pe.stroke_width);
      out.push_back(std::move(pe));
    }
    pos = endt;
  }
  return out;
}

std::vector<double> flat_pts(const Subpath& sp) {
  std::vector<double> v;
  v.reserve(sp.size() * 2);
  for (const auto& pt : sp) {
    v.push_back(pt.x);
    v.push_back(pt.y);
  }
  return v;
}

}  // namespace

extern "C" int64_t pm_init_scene_from_svg(const char* svg_text, double scale,
                                          uint8_t* scene_buf,
                                          int64_t buf_size) {
  const std::string doc(svg_text);
  const auto paths = scan_paths(doc);

  // Two passes, as the reference does (count then encode, src/lib.rs:292).
  std::vector<std::vector<Subpath>> flattened(paths.size());
  int32_t n_items = 0;
  for (size_t i = 0; i < paths.size(); ++i) {
    PathParser pp(paths[i].d);
    pp.run();
    auto& subs = flattened[i];
    subs = flatten_elements(pp.els, scale, kTolerance * 1e-2);
    const int32_t k = static_cast<int32_t>(subs.size());
    if (paths[i].has_fill) n_items += k;
    if (paths[i].has_stroke) n_items += k;
  }

  PmEncoder* e = pm_encoder_new(scene_buf, buf_size);
  if (pm_encoder_begin_group(e, n_items) != 0) {
    pm_encoder_free(e);
    return -1;
  }
  for (size_t i = 0; i < paths.size(); ++i) {
    const auto& subs = flattened[i];
    if (paths[i].has_fill) {
      const uint32_t rgba = parse_color(paths[i].fill);
      // SVG fill-rule -> flags bit 0 (matches scene/svg.py's loader).
      const uint32_t flags = paths[i].fill_rule == "evenodd" ? 1u : 0u;
      for (const auto& sp : subs) {
        const auto pts = flat_pts(sp);
        pm_encoder_fill(e, pts.data(), static_cast<int32_t>(sp.size()), rgba,
                        flags);
      }
    }
    if (paths[i].has_stroke) {
      uint32_t rgba = parse_color(paths[i].stroke);
      float width =
          std::strtof(paths[i].stroke_width.c_str(), nullptr) *
          static_cast<float>(scale);
      // Thin-line fudge (src/lib.rs:353-362): f32 math, truncating cast.
      if (width < kThinLine) {
        float alpha = static_cast<float>(rgba & 0xFF);
        alpha = alpha * std::sqrt(width / kThinLine);
        rgba = (rgba & ~0xFFu) | (static_cast<uint32_t>(alpha) & 0xFF);
        width = kThinLine;
      }
      for (const auto& sp : subs) {
        const auto pts = flat_pts(sp);
        pm_encoder_polyline(e, pts.data(), static_cast<int32_t>(sp.size()),
                            rgba, width);
      }
    }
  }
  const int32_t ok = pm_encoder_end_group(e);
  const int64_t size = pm_encoder_size(e);
  pm_encoder_free(e);
  return ok == 0 ? size : -1;
}
