"""Geometry-layer tests: Bezier flattening and SVG path parsing.

Covers the reference flattener's exact semantics (src/flatten.rs:10-47):
subpath splitting, chord-only quad degradation, the kurbo to_quads count
rule, and dropped elements.
"""

import math

import numpy as np
import pytest

from piet_tpu.geometry import (Affine, BezPath, cubic_eval, flatten_cubic,
                               flatten_cubics_batch, flatten_path,
                               parse_svg_path, quad_count)


def test_cubic_eval_endpoints():
    p = ((0.0, 0.0), (1.0, 2.0), (3.0, 2.0), (4.0, 0.0))
    assert cubic_eval(*p, 0.0) == (0.0, 0.0)
    assert cubic_eval(*p, 1.0) == (4.0, 0.0)
    # Midpoint of a symmetric cubic.
    mx, my = cubic_eval(*p, 0.5)
    assert mx == pytest.approx(2.0)
    assert my == pytest.approx(1.5)


def test_quad_count_formula():
    # A degenerate (linear) cubic needs exactly 1 quad.
    assert quad_count((0, 0), (1, 0), (2, 0), (3, 0), 1e-3) == 1
    # The kurbo rule: n = ceil((err / (432 a^2))^(1/6)).
    p0, p1, p2, p3 = (0, 0), (0, 100), (100, 100), (100, 0)
    a = 1e-3
    d = np.array([3 * p2[0] - p3[0] - (3 * p1[0] - p0[0]),
                  3 * p2[1] - p3[1] - (3 * p1[1] - p0[1])], float)
    err = float(d @ d)
    expected = max(1, math.ceil((err / (432 * a * a)) ** (1 / 6)))
    assert quad_count(p0, p1, p2, p3, a) == expected
    # Tighter accuracy can't reduce the count.
    assert quad_count(p0, p1, p2, p3, a / 10) >= expected


def test_flatten_cubic_points_are_uniform_t_samples():
    p = ((0.0, 0.0), (10.0, 50.0), (60.0, 50.0), (70.0, 0.0))
    acc = 1e-3
    pts = flatten_cubic(*p, acc)
    n = quad_count(*p, acc)
    assert len(pts) == n
    for i, pt in enumerate(pts):
        ref = cubic_eval(*p, (i + 1) / n)
        assert pt == pytest.approx(ref)
    assert pts[-1] == pytest.approx(p[3])  # lands exactly on the endpoint


def test_flatten_path_subpaths_and_dropped_elements():
    path = BezPath()
    path.move_to((0, 0))
    path.line_to((1, 0))
    path.close_path()                      # ignored (flatten.rs: _ => ())
    path.move_to((5, 5))
    path.quad_to((6, 6), (7, 5))           # quads silently dropped
    path.line_to((8, 5))
    sub = flatten_path(path, 0.1)
    assert len(sub) == 2
    assert sub[0] == [(0, 0), (1, 0)]
    assert sub[1] == [(5, 5), (8, 5)]      # quad contributed nothing


def test_flatten_path_curve_accuracy_is_tolerance_times_1e_2():
    path = BezPath()
    path.move_to((0.0, 0.0))
    path.curve_to((0.0, 100.0), (100.0, 100.0), (100.0, 0.0))
    sub = flatten_path(path, 0.1)
    n = quad_count((0, 0), (0, 100), (100, 100), (100, 0), 0.1 * 1e-2)
    assert len(sub) == 1
    assert len(sub[0]) == 1 + n


def test_flatten_cubics_batch_matches_scalar():
    rng = np.random.default_rng(0)
    cubics = rng.uniform(-50, 150, (32, 4, 2))
    pts, counts = flatten_cubics_batch(cubics, 1e-3)
    k = 0
    for i in range(32):
        scalar = flatten_cubic(*[tuple(p) for p in cubics[i]], 1e-3)
        assert counts[i] == len(scalar)
        got = pts[k:k + counts[i]]
        np.testing.assert_allclose(got, np.array(scalar), rtol=0, atol=1e-12)
        k += counts[i]
    assert k == len(pts)


def test_affine_compose_and_apply():
    a = Affine.translate(3, 4) * Affine.scale(2.0)
    assert a.apply((1.0, 1.0)) == (5.0, 6.0)
    r = Affine.rotate(math.pi / 2)
    x, y = r.apply((1.0, 0.0))
    assert x == pytest.approx(0.0, abs=1e-12)
    assert y == pytest.approx(1.0)


class TestSvgPath:
    def test_basic_absolute(self):
        p = parse_svg_path("M 10 20 L 30 40 Z")
        names = [type(e).__name__ for e in p]
        assert names == ["MoveTo", "LineTo", "ClosePath"]

    def test_relative_and_implicit(self):
        p = parse_svg_path("m 10 20 10 0 l 0 10")
        # implicit repeat of m becomes l
        from piet_tpu.geometry import LineTo, MoveTo
        assert isinstance(p.elements[0], MoveTo)
        assert p.elements[0].p == (10, 20)
        assert isinstance(p.elements[1], LineTo)
        assert p.elements[1].p == (20, 20)
        assert p.elements[2].p == (20, 30)

    def test_hv_and_smooth_cubic(self):
        p = parse_svg_path("M0 0 H10 V10 C 10 20 20 20 20 10 S 30 0 30 10")
        from piet_tpu.geometry import CurveTo
        curves = [e for e in p if isinstance(e, CurveTo)]
        assert len(curves) == 2
        # Smooth control point reflects the previous one: 2*(20,10)-(20,20).
        assert curves[1].p1 == (20, 0)

    def test_decimal_shorthand_numbers(self):
        # The tiger uses ".015"-style and "-.287"-style numbers heavily.
        p = parse_svg_path("M27.014 90.57s.039.744-.287.736z")
        from piet_tpu.geometry import CurveTo
        assert isinstance(p.elements[1], CurveTo)
        c = p.elements[1]
        assert c.p2 == pytest.approx((27.014 + 0.039, 90.57 + 0.744))
        assert c.p3 == pytest.approx((27.014 - 0.287, 90.57 + 0.736))

    def test_arc_produces_cubics_on_circle(self):
        p = parse_svg_path("M 0 0 A 10 10 0 0 1 20 0")
        from piet_tpu.geometry import CurveTo
        curves = [e for e in p if isinstance(e, CurveTo)]
        assert curves
        assert curves[-1].p3 == pytest.approx((20.0, 0.0), abs=1e-9)
        # All curve points should stay near the r=10 circle centered (10,0).
        for c in curves:
            for pt in (c.p3,):
                d = math.hypot(pt[0] - 10.0, pt[1] - 0.0)
                assert d == pytest.approx(10.0, abs=1e-6)
