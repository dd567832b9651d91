"""Byte-exact scene wire format: SoA Scene <-> reference buffer layout.

Serializes a `Scene` to exactly the bytes the reference's Rust ``Encoder``
produces (reference: src/lib.rs:103-240, layout constants GenTypes.h:322-323)
and parses them back.  This is piet-tpu's persistence/interchange format --
the C++ native encoder (cc/) emits it, the renderer consumes the parsed SoA.

Layout of a single group scene:

  offset 0:            SimpleGroup { n_items: u32, items_ix: u32 }   (8 B)
  offset 8:            n_items x ShortBbox([u16; 4])                 (8 B ea)
  offset items_ix:     n_items x PietItem (32-byte tagged union)
  after group block:   point data (f32, f32) pairs, in item order

Item layouts (field offsets per GenTypes.h readers):
  Circle (tag 1): tag@0 only; body zeroed (reference leaves it uninitialized)
  Line   (tag 2): tag@0 flags@4 rgba@8 width@12 start@16 end@24
  Fill   (tag 3): tag@0 flags@4 rgba@8 n_points@12 points_ix@16
                  (flags bit 0 = even-odd fill rule, a piet-tpu extension
                  riding the reference's always-zero word -- reference
                  scenes encode byte-identically)
  Poly   (tag 4): tag@0 rgba@4 width@8 n_points@12 points_ix@16

Colors are stored byte-swapped (``rgba.to_be()``, src/lib.rs:181) so the
in-memory byte order is R,G,B,A.
"""

from __future__ import annotations

import struct
import numpy as np

from .scene import (FLAG_EVEN_ODD, Scene, SceneBuilder, TAG_CIRCLE,
                    TAG_FILL, TAG_LINE, TAG_POLY)

SIMPLE_GROUP_HEADER_SIZE = 8   # Rust struct SimpleGroup (src/lib.rs:17-20)
SHORT_BBOX_SIZE = 8
PIET_ITEM_SIZE = 32            # GenTypes.h:323
POINT_SIZE = 8


def encode_scene(scene: Scene) -> bytes:
    """Serialize to the reference byte format."""
    n = scene.n_items
    items_ix = SIMPLE_GROUP_HEADER_SIZE + n * SHORT_BBOX_SIZE
    group_block = items_ix + n * PIET_ITEM_SIZE

    # Pre-compute the absolute byte offset of each fill/poly item's points,
    # replicating the reference's bump-allocation order (points are appended
    # in item order after the group block, src/lib.rs:224-240).
    pt_byte_ix = np.zeros(n, np.int64)
    cursor = group_block
    for i in range(n):
        tag = int(scene.tags[i])
        if tag in (TAG_FILL, TAG_POLY):
            pt_byte_ix[i] = cursor
            cursor += int(scene.n_pts[i]) * POINT_SIZE

    # The wire format covers the REFERENCE item state plus the fill-rule
    # bit (which rides the reference's always-zero ``flags`` word, so
    # reference scenes stay byte-identical).  Per-item clip rects have no
    # wire encoding -- refuse rather than silently drop them.
    from ..raster.ptcl import NO_CLIP
    if not np.array_equal(scene.clips,
                          np.broadcast_to(np.asarray(NO_CLIP, np.float32),
                                          scene.clips.shape)):
        raise ValueError(
            "per-item clip rects are a piet-tpu extension with no "
            "reference wire encoding; persist such scenes via Scene.save "
            "(.npz) instead")
    # Gradient brushes likewise have no reference wire encoding.
    if scene.grads.any():
        raise ValueError(
            "gradient brushes are a piet-tpu extension with no reference "
            "wire encoding; persist such scenes via Scene.save (.npz) "
            "instead")
    from .scene import FLAG_FILL_CONT, FLAG_FILL_FINAL
    if (scene.flags & (FLAG_FILL_CONT | FLAG_FILL_FINAL)).any():
        raise ValueError(
            "combined multi-subpath fills are a piet-tpu extension with "
            "no reference wire encoding; persist such scenes via "
            "Scene.save (.npz) instead")

    out = bytearray(cursor)
    struct.pack_into("<II", out, 0, n, items_ix)
    for i in range(n):
        bx = scene.bboxes[i]
        struct.pack_into("<4H", out, SIMPLE_GROUP_HEADER_SIZE + i * SHORT_BBOX_SIZE,
                         int(bx[0]), int(bx[1]), int(bx[2]), int(bx[3]))
        base = items_ix + i * PIET_ITEM_SIZE
        tag = int(scene.tags[i])
        color_be = struct.unpack("<I", struct.pack(">I", int(scene.colors[i])))[0]
        off = int(scene.pt_offset[i])
        npts = int(scene.n_pts[i])
        if tag == TAG_CIRCLE:
            struct.pack_into("<I", out, base, tag)
        elif tag == TAG_LINE:
            p0 = scene.points[off]
            p1 = scene.points[off + 1]
            struct.pack_into("<IIIf4f", out, base, tag, 0, color_be,
                             float(scene.widths[i]),
                             float(p0[0]), float(p0[1]),
                             float(p1[0]), float(p1[1]))
        elif tag == TAG_FILL:
            # flags word (always 0 in the reference, src/lib.rs:47-53)
            # carries the piet fill-rule extension bit.
            struct.pack_into("<IIIII", out, base, tag,
                             int(scene.flags[i]) & FLAG_EVEN_ODD, color_be,
                             npts, int(pt_byte_ix[i]))
            pts = scene.points[off:off + npts].astype("<f4")
            out[pt_byte_ix[i]:pt_byte_ix[i] + npts * POINT_SIZE] = pts.tobytes()
        elif tag == TAG_POLY:
            struct.pack_into("<IIfII", out, base, tag, color_be,
                             float(scene.widths[i]), npts, int(pt_byte_ix[i]))
            pts = scene.points[off:off + npts].astype("<f4")
            out[pt_byte_ix[i]:pt_byte_ix[i] + npts * POINT_SIZE] = pts.tobytes()
        elif tag in (5, 6, 7):
            raise ValueError(
                "clip/layer group items (tags 5-7) are piet-tpu extensions "
                "with no reference wire encoding; persist such scenes via "
                "Scene.save (.npz) instead")
        else:
            raise ValueError(f"unknown item tag {tag}")
    return bytes(out)


def hexdump_scene(buf: bytes) -> str:
    """Wire-format debugging aid: hexdump the encoded buffer as u32 words,
    the TPU port of the reference's ``Encoder::debug_print``
    (src/lib.rs:242-253) -- plus region annotations the reference lacked
    (header / bbox array / item array / point data), derived from the
    self-describing header.

    Dead-pad words at the buffer tail (len % 4) are ignored, matching the
    reference's word-count truncation.
    """
    n, items_ix = struct.unpack_from("<II", buf, 0)
    group_end = items_ix + n * PIET_ITEM_SIZE
    words = np.frombuffer(buf[:len(buf) & ~3], dtype="<u4")
    lines = []
    for w0 in range(0, len(words), 4):
        byte0 = w0 * 4
        if byte0 == 0:
            region = "group header"
        elif byte0 < items_ix:
            region = f"bbox[{(byte0 - SIMPLE_GROUP_HEADER_SIZE) // SHORT_BBOX_SIZE}]"
        elif byte0 < group_end:
            region = f"item[{(byte0 - items_ix) // PIET_ITEM_SIZE}]"
        else:
            region = "points"
        row = " ".join(f"{w:08x}" for w in words[w0:w0 + 4])
        lines.append(f"{byte0:6x}: {row:<36}  {region}")
    return "\n".join(lines)


def decode_scene(buf: bytes) -> Scene:
    """Parse the reference byte format back into an SoA `Scene`."""
    n, items_ix = struct.unpack_from("<II", buf, 0)
    b = SceneBuilder()
    b.begin_group(n)
    for i in range(n):
        bbox = struct.unpack_from(
            "<4H", buf, SIMPLE_GROUP_HEADER_SIZE + i * SHORT_BBOX_SIZE)
        base = items_ix + i * PIET_ITEM_SIZE
        (tag,) = struct.unpack_from("<I", buf, base)
        if tag == TAG_CIRCLE:
            # Geometry is bbox-only on the wire; reconstruct center/radius
            # the way the fine kernel does (PietRender.metal:483-490).
            x0, y0, x1, y1 = bbox
            cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
            r = min(cx - x0, cy - y0)
            b.circle(cx, cy, r)
        elif tag == TAG_LINE:
            _, flags, color_be, width, x0, y0, x1, y1 = struct.unpack_from(
                "<IIIf4f", buf, base)
            rgba = struct.unpack("<I", struct.pack(">I", color_be))[0]
            b.stroke_line((x0, y0), (x1, y1), width, rgba)
        elif tag == TAG_FILL:
            _, flags, color_be, npts, pix = struct.unpack_from(
                "<IIIII", buf, base)
            rgba = struct.unpack("<I", struct.pack(">I", color_be))[0]
            pts = np.frombuffer(buf, dtype="<f4", count=npts * 2,
                                offset=pix).reshape(npts, 2)
            b.fill([tuple(p) for p in pts], rgba,
                   even_odd=bool(flags & FLAG_EVEN_ODD))
        elif tag == TAG_POLY:
            _, color_be, width, npts, pix = struct.unpack_from(
                "<IIfII", buf, base)
            rgba = struct.unpack("<I", struct.pack(">I", color_be))[0]
            pts = np.frombuffer(buf, dtype="<f4", count=npts * 2,
                                offset=pix).reshape(npts, 2)
            b.polyline([tuple(p) for p in pts], rgba, width)
        else:
            raise ValueError(f"unknown item tag {tag} at item {i}")
        # Preserve the exact on-wire bbox (builder recomputes; overwrite).
        b._bboxes[-1] = tuple(int(v) for v in bbox)
    b.end_group()
    return b.build()
