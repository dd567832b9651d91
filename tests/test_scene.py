"""Scene-layer tests: color parsing, bbox quantization, builders, and
byte-exact wire-format golden tests against hand-computed reference layouts
(GenTypes.h:322-328 sizes/tags, src/lib.rs:132-240 encoder behavior)."""

import struct

import numpy as np
import pytest

from piet_tpu.scene import (Scene, SceneBuilder, TAG_CIRCLE, TAG_FILL,
                            TAG_LINE, TAG_POLY, decode_scene, encode_scene,
                            make_cardioid, make_path_test, make_tiger,
                            parse_color, quantize_bbox)
from piet_tpu.scene.wire import (PIET_ITEM_SIZE, SHORT_BBOX_SIZE,
                                 SIMPLE_GROUP_HEADER_SIZE)


class TestColor:
    def test_rrggbb(self):
        # '#8slot' + alpha ff appended (src/lib.rs:381)
        assert parse_color("#cc7226") == 0xCC7226FF

    def test_short_rgb_expansion(self):
        # '#rgb' nibble doubling (src/lib.rs:378-380)
        assert parse_color("#000") == 0x000000FF
        assert parse_color("#FFF") == 0xFFFFFFFF
        assert parse_color("#f80") == 0xFF8800FF

    def test_non_hex_fallback_is_magenta(self):
        assert parse_color("none") == 0xFF00FF80
        assert parse_color("red") == 0xFF00FF80


class TestQuantizeBbox:
    def test_floor_ceil(self):
        assert quantize_bbox(1.2, 3.7, 10.1, 20.9) == (1, 3, 11, 21)

    def test_clamping(self):
        assert quantize_bbox(-5.0, -0.5, 70000.0, 65535.5) == \
            (0, 0, 65535, 65535)


class TestWireFormat:
    def test_layout_constants(self):
        assert SIMPLE_GROUP_HEADER_SIZE == 8
        assert SHORT_BBOX_SIZE == 8
        assert PIET_ITEM_SIZE == 32
        assert (TAG_CIRCLE, TAG_LINE, TAG_FILL, TAG_POLY) == (1, 2, 3, 4)

    def test_triangle_golden_bytes(self):
        """Byte-for-byte layout of the reference's make_path_test scene
        (src/lib.rs:272-284): 1 fill item, 3 points."""
        scene = make_path_test()
        buf = encode_scene(scene)
        # 8 header + 8 bbox + 32 item + 3*8 points = 72
        assert len(buf) == 72
        n_items, items_ix = struct.unpack_from("<II", buf, 0)
        assert (n_items, items_ix) == (1, 16)
        assert struct.unpack_from("<4H", buf, 8) == (10, 10, 300, 800)
        tag, flags, rgba_be, n_points, points_ix = struct.unpack_from(
            "<IIIII", buf, 16)
        assert tag == TAG_FILL and flags == 0
        # color 0x80e0 stored big-endian: bytes 00 00 80 e0
        assert buf[24:28] == bytes([0x00, 0x00, 0x80, 0xE0])
        assert n_points == 3
        assert points_ix == 48  # right after the 48-byte group block
        pts = np.frombuffer(buf, "<f4", 6, 48).reshape(3, 2)
        np.testing.assert_array_equal(
            pts, np.array([[10, 10], [15, 800], [300, 500]], np.float32))

    def test_line_item_layout(self):
        b = SceneBuilder()
        b.begin_group(1)
        b.stroke_line((1.0, 2.0), (5.0, 6.0), 2.0, 0x000080E0)
        b.end_group()
        buf = encode_scene(b.build())
        base = 16
        tag, flags = struct.unpack_from("<II", buf, base)
        assert tag == TAG_LINE and flags == 0
        assert buf[base + 8:base + 12] == bytes([0x00, 0x00, 0x80, 0xE0])
        width, x0, y0, x1, y1 = struct.unpack_from("<5f", buf, base + 12)
        assert (width, x0, y0, x1, y1) == (2.0, 1.0, 2.0, 5.0, 6.0)
        # bbox inflated by width/2 (src/lib.rs:187-188): (0,1,6,7)
        assert struct.unpack_from("<4H", buf, 8) == (0, 1, 6, 7)

    def test_poly_item_layout_has_no_flags_field(self):
        """PietStrokePolyLine packs rgba at offset 4 (GenTypes.h:275-277)."""
        b = SceneBuilder()
        b.begin_group(1)
        b.polyline([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0)], 0x11223344, 1.0)
        b.end_group()
        buf = encode_scene(b.build())
        base = 16
        (tag,) = struct.unpack_from("<I", buf, base)
        assert tag == TAG_POLY
        assert buf[base + 4:base + 8] == bytes([0x11, 0x22, 0x33, 0x44])
        width, n_points, points_ix = struct.unpack_from("<fII", buf, base + 8)
        assert (width, n_points, points_ix) == (1.0, 3, 48)

    def test_multi_item_points_packed_in_item_order(self):
        b = SceneBuilder()
        b.begin_group(2)
        b.fill([(0, 0), (8, 0), (8, 8)], 0xFF)
        b.fill([(1, 1), (2, 1), (2, 2), (1, 2)], 0xFF00FF)
        b.end_group()
        buf = encode_scene(b.build())
        group_block = 8 + 2 * 8 + 2 * 32
        _, _, _, n0, ix0 = struct.unpack_from("<IIIII", buf, 24)
        _, _, _, n1, ix1 = struct.unpack_from("<IIIII", buf, 56)
        assert (n0, ix0) == (3, group_block)
        assert (n1, ix1) == (4, group_block + 3 * 8)
        assert len(buf) == group_block + 7 * 8

    def test_roundtrip_fixture_scenes(self):
        for scene in (make_path_test(), make_cardioid()):
            buf = encode_scene(scene)
            scene2 = decode_scene(buf)
            assert encode_scene(scene2) == buf

    def test_even_odd_rides_flags_word(self):
        """The piet fill-rule extension bit round-trips on the wire
        (riding the reference's always-zero flags word); reference
        nonzero-rule scenes encode with the word still zero."""
        b = SceneBuilder()
        b.begin_group(2)
        b.fill([(0, 0), (8, 0), (8, 8)], 0xFF, even_odd=True)
        b.fill([(1, 1), (2, 1), (2, 2)], 0xFF00FF)
        b.end_group()
        buf = encode_scene(b.build())
        (flags0,) = struct.unpack_from("<I", buf, 24 + 4)
        (flags1,) = struct.unpack_from("<I", buf, 56 + 4)
        assert (flags0, flags1) == (1, 0)
        scene2 = decode_scene(buf)
        assert list(scene2.flags) == [1, 0]
        assert encode_scene(scene2) == buf

    def _soa_equal(self, a, b):
        for f in ("tags", "colors", "widths", "bboxes", "pt_offset",
                  "n_pts", "points", "flags", "clips", "grads"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f"field {f}")

    def test_clip_rects_roundtrip(self):
        """Per-item clip rects ride out-of-line payloads (clip_ix words);
        a clipped Line spills to the LineExt variant (tag 8) because its
        inline layout has no free word."""
        from piet_tpu.scene.wire import TAG_LINE_EXT
        b = SceneBuilder()
        b.begin_group(4)
        b.set_clip(0.0, 0.0, 4.0, 4.0)
        b.circle(10, 10, 5)
        b.stroke_line((1, 1), (9, 9), 2.0, 0x112233FF)
        b.fill([(0, 0), (8, 0), (8, 8)], 0xFF0000FF)
        b.polyline([(0, 0), (4, 4), (8, 0)], 0x00FF00FF, 1.5)
        b.end_group()
        scene = b.build()
        buf = encode_scene(scene)
        # The clipped line is re-tagged on the wire only.
        (line_tag,) = struct.unpack_from("<I", buf, 8 + 4 * 8 + 32)
        assert line_tag == TAG_LINE_EXT
        scene2 = decode_scene(buf)
        assert list(scene2.tags) == [1, 2, 3, 4]
        self._soa_equal(scene, scene2)
        assert encode_scene(scene2) == buf

    def test_group_and_gradient_items_roundtrip(self):
        """Extension items (clip/layer/pop groups, gradient brushes,
        combined multi-subpath fills) round-trip wire -> SoA -> wire."""
        from piet_tpu.scene.scene import LinearGradient, RadialGradient
        b = SceneBuilder()
        b.clip_path([(0, 0), (64, 0), (32, 64)], even_odd=True)
        b.fill([(1, 1), (63, 1), (63, 63), (1, 63)], 0x2040C0FF)
        b.push_layer(0.5)
        b.circle(32, 32, 16)
        b.fill([(4, 4), (60, 4), (32, 60)],
               LinearGradient((4, 4), (60, 60), 0xFF0000FF, 0x0000FFFF))
        b.pop()
        b.pop()
        b.fill([(0, 0), (16, 0), (8, 16)],
               RadialGradient((8, 8), 10.0, 0x00FF00FF, 0xFF00FFFF))
        b.fill_path([[(0, 0), (32, 0), (32, 32), (0, 32)],
                     [(8, 8), (8, 24), (24, 24), (24, 8)]],
                    0x808080FF, combined=True)
        scene = b.build()
        buf = encode_scene(scene)
        scene2 = decode_scene(buf)
        self._soa_equal(scene, scene2)
        assert encode_scene(scene2) == buf


class TestBuilders:
    def test_group_count_invariant(self):
        b = SceneBuilder()
        b.begin_group(2)
        b.circle(10, 10, 5)
        with pytest.raises(ValueError):
            b.end_group()

    def test_thin_stroke_fudge(self):
        """Width < 0.7 clamps to 0.7 and scales alpha by sqrt(w/0.7)
        (src/lib.rs:353-362)."""
        b = SceneBuilder()
        b.begin_group()
        b.stroke_path([[(0, 0), (10, 0)]], width=0.12, rgba=0x000000FF)
        b.end_group()
        s = b.build()
        assert s.widths[0] == np.float32(0.7)
        expected_alpha = int(np.float32(255.0) * np.sqrt(
            np.float32(np.float32(0.12)) / np.float32(0.7), dtype=np.float32))
        assert int(s.colors[0]) & 0xFF == expected_alpha
        # tiger stroke-width .015 * 8 = 0.12 -> this exact path is hit.

    def test_wide_stroke_not_fudged(self):
        b = SceneBuilder()
        b.begin_group()
        b.stroke_path([[(0, 0), (10, 0)]], width=3.0, rgba=0x000000FF)
        b.end_group()
        s = b.build()
        assert s.widths[0] == np.float32(3.0)
        assert int(s.colors[0]) == 0x000000FF


class TestFixtures:
    def test_cardioid_item_count(self):
        s = make_cardioid()
        # (97-1)*2 items: alternating circle / line (src/lib.rs:256-270).
        assert s.n_items == 192
        assert (s.tags[::2] == TAG_CIRCLE).all()
        assert (s.tags[1::2] == TAG_LINE).all()

    def test_tiger_loads(self):
        s = make_tiger()
        assert s.n_items > 200
        assert (np.isin(s.tags, [TAG_FILL, TAG_POLY])).all()
        # All geometry within the 8x-scaled 200x200 viewBox (plus stroke
        # inflation slop).
        assert s.points.min() > -50 and s.points.max() < 1700


def test_layout_describe_matches_reference_constants():
    """The Python layout descriptors (layout/emit_py.py) must agree with
    the reference's generated sizes and tag values (GenTypes.h:322-328,
    440-495) -- the same single-source-of-truth role the proc-macro played.
    """
    from piet_tpu.layout import describe
    from piet_tpu.layout.modules import ptcl_module, scene_module

    scene = describe(scene_module())
    assert scene["structs"]["SimpleGroup"]["size"] == 16
    assert scene["enums"]["PietItem"]["size"] == 32
    assert scene["enums"]["PietItem"]["tags"] == {
        "Circle": 1, "Line": 2, "Fill": 3, "Poly": 4,
        # extension variants (scene/wire.py): reference tags untouched
        "Clip": 5, "Pop": 6, "Layer": 7, "LineExt": 8}
    ptcl = describe(ptcl_module())
    assert ptcl["enums"]["Cmd"]["tags"] == {
        "End": 1, "Circle": 2, "Line": 3, "Fill": 4, "Stroke": 5,
        "FillEdge": 6, "DrawFill": 7, "Solid": 8, "Bail": 9}


def test_hexdump_scene_annotated():
    """The wire hexdump (reference: Encoder::debug_print, src/lib.rs:242-253)
    prints every u32 word and annotates the regions the header describes."""
    from piet_tpu.scene.wire import encode_scene, hexdump_scene

    scene = make_path_test()
    buf = encode_scene(scene)
    dump = hexdump_scene(buf)
    lines = dump.splitlines()
    # 72 bytes -> 18 words -> 5 rows of up to 4 words.
    assert len(lines) == 5
    assert lines[0].startswith("     0:")
    assert "group header" in lines[0]
    assert "item[0]" in lines[1]
    assert "points" in lines[-1]
    # Word 0 is n_items (1), little-endian.
    assert "00000001" in lines[0]
    # Round-trippable: every encoded word appears in the dump.
    words = np.frombuffer(buf, "<u4")
    flat = dump.replace("\n", " ")
    for w in words:
        assert f"{int(w):08x}" in flat
