"""Color handling: parsing and sRGB conversion.

Color convention throughout piet-tpu: a logical u32 ``0xRRGGBBAA``.  The
reference stores this same logical value byte-swapped (``rgba.to_be()``,
src/lib.rs:181,200) so that the little-endian GPU u32 has R in the low byte;
our SoA arrays keep the logical value and the wire-format serializer does the
byte swap (see scene/wire.py).

sRGB policy (must match the CPU golden rasterizer bit-for-bit): colors are
8-bit sRGB + linear alpha; blending happens in linear space after decode
(PietRender.metal:503 ``unpack_unorm4x8_srgb_to_half``); the final image is
re-encoded with the exact piecewise sRGB formula (PietRender.metal:563).
"""

from __future__ import annotations

import numpy as np

MAGENTA_FALLBACK = 0xFF00FF80  # non-hex colors (reference src/lib.rs:383)


def parse_color(color: str) -> int:
    """Parse an SVG color attribute to logical 0xRRGGBBAA.

    Matches reference src/lib.rs:375-385: ``#rgb`` nibbles are doubled,
    ``#rrggbb`` gets alpha 0xff appended, anything else becomes the
    magenta-ish debug fallback 0xff00ff80.
    """
    if color and color[0] == "#":
        hexval = int(color[1:], 16)
        if len(color) == 4:
            hexval = ((hexval >> 8) * 0x110000
                      + ((hexval >> 4) & 0xF) * 0x1100
                      + (hexval & 0xF) * 0x11)
        return ((hexval << 8) + 0xFF) & 0xFFFFFFFF
    return MAGENTA_FALLBACK


def unpack_rgba(color) -> tuple:
    """Logical 0xRRGGBBAA -> (r, g, b, a) channel bytes (ints or arrays)."""
    color = np.asarray(color, dtype=np.uint32)
    r = (color >> 24) & 0xFF
    g = (color >> 16) & 0xFF
    b = (color >> 8) & 0xFF
    a = color & 0xFF
    return r, g, b, a


def srgb_to_linear(u: np.ndarray) -> np.ndarray:
    """Decode sRGB-encoded [0,1] values to linear, float32.

    The exact unorm8-sRGB decode used by Metal's
    ``unpack_unorm4x8_srgb_to_half`` (IEC 61966-2-1): the inverse of
    `linear_to_srgb` below.
    """
    u = np.asarray(u, dtype=np.float32)
    lo = u / np.float32(12.92)
    hi = ((u + np.float32(0.055)) / np.float32(1.055)) ** np.float32(2.4)
    return np.where(u <= np.float32(0.04045), lo, hi).astype(np.float32)


def linear_to_srgb(v: np.ndarray) -> np.ndarray:
    """Encode linear [0,1] to sRGB, float32.

    Exactly the in-shader formula at PietRender.metal:563:
    ``select(1.055*pow(x, 1/2.4) - 0.055, 12.92*x, x < 0.0031308)``.
    """
    v = np.asarray(v, dtype=np.float32)
    lo = v * np.float32(12.92)
    hi = (np.float32(1.055) * np.power(v, np.float32(1.0 / 2.4))
          - np.float32(0.055))
    return np.where(v < np.float32(0.0031308), lo, hi).astype(np.float32)


def srgb_decode_table() -> np.ndarray:
    """The 256-entry u8-sRGB -> linear-f32 decode table.

    Decode is only ever applied to 8-bit codes, so piet-tpu defines it as a
    table computed in float64 and rounded once to float32 -- bit-identical
    across numpy, XLA and the C++ golden rasterizer by construction (a
    per-pixel f32 ``pow`` would differ in the last ulp between libm
    implementations).  The table is emitted into the generated C++ headers
    by the layout codegen (cc/gen/piet_srgb_gen.h).
    """
    u = np.arange(256, dtype=np.float64) / 255.0
    lo = u / 12.92
    hi = ((u + 0.055) / 1.055) ** 2.4
    return np.where(u <= 0.04045, lo, hi).astype(np.float32)


_SRGB_DECODE_TABLE = srgb_decode_table()


def linear_to_srgb_det(v: np.ndarray) -> np.ndarray:
    """Deterministic linear -> sRGB encode: the piet-tpu precision policy.

    Same piecewise curve as `linear_to_srgb`, but ``x^(1/2.4)`` is computed
    as ``sqrt(sqrt(cbrt(x^5)))`` with a square-root-chain seed and four
    Newton steps for the cube root.  Every operation (mul/add/div/sqrt) is
    IEEE-754 correctly rounded in f32, so numpy, the Pallas fine kernel
    (ops/fine.py) and the C++ golden rasterizer produce bit-identical
    results -- unlike ``pow``, whose last-ulp behavior is libm-specific and
    flips the u8 rounding of ~1e-5 of pixels (measured) at code boundaries.
    Accuracy vs the true curve is < 1e-6 absolute, far below the u8
    quantization step.

    Any change here must be mirrored in ops/fine.py::_srgb_encode_u8 and
    the generated piet_srgb_encode (layout/emit_cpp.py).
    """
    f = np.float32
    v = np.clip(np.asarray(v, dtype=f), f(0.0), f(1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        x2 = v * v
        x4 = x2 * x2
        y = x4 * v                      # x^5; >= 3e-13 on the branch taken
        t1 = np.sqrt(y)
        t2 = np.sqrt(t1)                # y^(1/4)
        t3 = np.sqrt(t2)
        t4 = np.sqrt(t3)                # y^(1/16)
        t5 = np.sqrt(t4)                # y^(1/32)
        r = t2 * t4 * t5                # y^(11/32): cbrt seed, <27% error
        third = f(1.0 / 3.0)
        for _ in range(4):              # Newton for r = y^(1/3)
            rr = r * r
            q = y / rr
            r = (r + r + q) * third
        p = np.sqrt(np.sqrt(r))         # x^(5/12) = x^(1/2.4)
        hi = f(1.055) * p - f(0.055)
    lo = v * f(12.92)
    return np.where(v < f(0.0031308), lo, hi).astype(f)


def srgb_encode_u8(v: np.ndarray) -> np.ndarray:
    """Deterministic linear f32 -> sRGB u8 (round-half-even, as jnp.round,
    np.round and C++ nearbyintf all implement)."""
    return np.round(linear_to_srgb_det(v) * np.float32(255.0)).astype(np.uint8)


def decode_color_linear(color) -> np.ndarray:
    """Logical color(s) -> float32 (..., 4) linear-RGB premul-ready values.

    RGB channels are sRGB-decoded; alpha stays linear ([0,1]).  This is the
    per-command decode the fine rasterizer applies
    (PietRender.metal:503,541,548) -- hoisted to encode/bin time in the TPU
    design since the result is command-constant.
    """
    r, g, b, a = unpack_rgba(color)
    rgb = _SRGB_DECODE_TABLE[np.stack([r, g, b], axis=-1)]
    alpha = np.asarray(a, dtype=np.float32)[..., None] / np.float32(255.0)
    return np.concatenate([rgb, alpha], axis=-1).astype(np.float32)
