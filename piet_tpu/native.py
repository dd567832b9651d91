"""ctypes bindings for the native cc/ library.

The Python<->C++ boundary, playing the role of the reference's Rust-to-ObjC
C FFI (reference: include/piet_metal.h, linked via an Xcode cargo phase,
project.pbxproj:233).  The library is built on demand with the cc/ Makefile;
no pip/pybind dependencies.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CC_DIR = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "cc"))
_LIB_PATH = os.path.join(_CC_DIR, "libpiet_cc.so")
_lib: Optional[ctypes.CDLL] = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> None:
    subprocess.run(["make", "-s"], cwd=_CC_DIR, check=True)


def load(rebuild: bool = False) -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    try:
        if rebuild or not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except (OSError, subprocess.CalledProcessError) as e:
        raise NativeUnavailable(f"cannot build/load {_LIB_PATH}: {e}") from e
    lib.pm_init_scene_from_svg.restype = ctypes.c_int64
    lib.pm_flatten_cubics.restype = ctypes.c_int64
    lib.pm_render_golden.restype = ctypes.c_int64
    lib.pm_encoder_new.restype = ctypes.c_void_p
    lib.pm_encoder_size.restype = ctypes.c_int64
    lib.pm_animated_frame.restype = ctypes.c_int64
    lib.pm_version.restype = ctypes.c_char_p
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailable:
        return False


def init_scene_from_svg(svg_text: str, scale: float,
                        buf_size: int = 16 << 20) -> bytes:
    """Native scene build: SVG document -> wire-format bytes.

    Byte-identical to the Python path (scene.make_tiger + wire.encode_scene)
    -- asserted in tests/test_native.py."""
    lib = load()
    buf = np.zeros(buf_size, np.uint8)
    n = lib.pm_init_scene_from_svg(
        svg_text.encode(), ctypes.c_double(scale),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf_size))
    if n < 0:
        raise RuntimeError("pm_init_scene_from_svg failed (buffer too small?)")
    return buf[:n].tobytes()


def flatten_cubics(cubics: np.ndarray, accuracy: float
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Native batch flattener; same contract as
    geometry.flatten_cubics_batch."""
    lib = load()
    cubics = np.ascontiguousarray(cubics, np.float64).reshape(-1, 4, 2)
    n = len(cubics)
    cap = 64 + n * 64
    while True:
        pts = np.zeros((cap, 2), np.float64)
        counts = np.zeros(n, np.int32)
        total = lib.pm_flatten_cubics(
            cubics.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(n), ctypes.c_double(accuracy),
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(cap),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if total >= 0:
            return pts[:total], counts
        cap *= 4


def animated_frame(t: float, centers: np.ndarray, radii: np.ndarray,
                   phases: np.ndarray, color_hi: np.ndarray):
    """Native per-frame scene build for the animated fixture.

    Emits the SoA ``Scene`` arrays directly (cc/src/fixtures.cc), bit-
    identical to scene/fixtures.py::make_animated_frame on this host
    (tests/test_native.py).  The seeded random draws are t-independent
    and passed in (computed once by the caller)."""
    from .scene.scene import Scene

    lib = load()
    n = len(radii)
    tags = np.zeros(n, np.int32)
    colors = np.zeros(n, np.uint32)
    widths = np.zeros(n, np.float32)
    bboxes = np.zeros((n, 4), np.int32)
    pt_offset = np.zeros(n, np.int32)
    n_pts = np.zeros(n, np.int32)
    points = np.zeros((13 * n, 2), np.float32)
    flags = np.zeros(n, np.uint32)
    clips = np.zeros((n, 4), np.float32)

    def p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    total = lib.pm_animated_frame(
        ctypes.c_double(t), ctypes.c_int32(n),
        p(centers, ctypes.c_double), p(radii, ctypes.c_double),
        p(phases, ctypes.c_double), p(color_hi, ctypes.c_uint32),
        p(tags, ctypes.c_int32), p(colors, ctypes.c_uint32),
        p(widths, ctypes.c_float), p(bboxes, ctypes.c_int32),
        p(pt_offset, ctypes.c_int32), p(n_pts, ctypes.c_int32),
        p(points, ctypes.c_float), p(flags, ctypes.c_uint32),
        p(clips, ctypes.c_float))
    return Scene(tags=tags, colors=colors, widths=widths, bboxes=bboxes,
                 pt_offset=pt_offset, n_pts=n_pts, points=points[:total],
                 flags=flags, clips=clips)


def render_golden(scene_wire: bytes, width: int, height: int,
                  tile_w: int = 128, tile_h: int = 16,
                  cmd_capacity: int = 512) -> Tuple[np.ndarray, int]:
    """Native golden render: wire bytes -> ((H, W, 4) u8 RGBA, overflow)."""
    lib = load()
    out = np.zeros((height, width, 4), np.uint8)
    ov = lib.pm_render_golden(
        scene_wire, ctypes.c_int64(len(scene_wire)),
        width, height, tile_w, tile_h, cmd_capacity,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if ov < 0:
        raise RuntimeError("pm_render_golden failed")
    return out, int(ov)
