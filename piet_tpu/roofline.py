"""Chip-peak (roofline) model for the render pipeline on TPU v5e.

VERDICT r3 gap #4: bench.py reported ms and Mpix/s but nothing related
them to what the chip can do, so "is 7 ms good?" had no answer in the
ledger.  This module turns the coarse pass's record counts (diag
scalars) into per-stage HBM-bytes and VPU-op estimates, divides by the
v5e peaks, and reports each stage's speed-of-light lower bound and the
measured time's percent-of-roofline.

Peaks (public TPU v5e figures; single chip):

* HBM bandwidth 819 GB/s (16 GB HBM2E).
* VPU f32 throughput: 8x128 lanes x 4 ALUs x ~0.94 GHz ~= 3.85e12
  elementwise f32 op/s (the VPU, not the MXU, executes the fine
  kernel's per-pixel math; the MXU's 197 bf16 TFLOP/s only applies to
  the coarse engines' one-hot matmuls, which are never the bound).

Work model (counts from ``coarse.diag`` / renderer ``last_stats``):

* fine: reads ``live_entries`` 16-word f32 rows (the entry stream is
  DMA'd in superchunks; each live entry crosses HBM once), writes the
  non-bailed framebuffer pixels once, and executes ~``OPS_PER_ENTRY``
  VPU ops per pixel of its (tile_h, tile_w) plane per entry plus the
  ~``OPS_RESOLVE`` per-pixel epilogue (sRGB encode + pack).
* coarse: every record class (hits, candidates, deltas) rides one
  expansion write + one sorted gather read + the bitonic sort's two HBM
  crossings of its 16-word row, plus sort compare-exchange VPU work
  ~ E log^2(E) / 2 ops over (keys + idx).

These are ESTIMATES of the unavoidable traffic (capacity padding and
probe plumbing excluded on purpose): pct_of_roofline ~ 100 means the
stage is at the hardware's speed of light; low pct means structural
headroom, not "try harder on the same structure" (see ROADMAP).
"""

from __future__ import annotations

import numpy as np

from typing import Dict

HBM_BYTES_PER_S = 819e9
VPU_F32_OPS_PER_S = 3.85e12

ENTRY_BYTES = 16 * 4          # one 16-word f32 entry row
#: Mean VPU ops per pixel per interpreted entry (fill delta ~30 flops,
#: line field ~20, resolves ~60; weighted toward fills on real scenes).
OPS_PER_ENTRY = 35.0
#: Per-pixel epilogue: deterministic sRGB encode (3 channels x ~25 ops:
#: 5 sqrts + 4 Newton steps + pack) once per non-bailed pixel.
OPS_RESOLVE = 80.0


def fine_model(stats: Dict, *, tile_h: int, tile_w: int,
               n_tiles: int) -> Dict[str, float]:
    live_entries = float(np.asarray(stats.get("live_entries", 0)).sum())
    bail_tiles = float(np.asarray(stats.get("bail_tiles", 0)).sum())
    live_tiles = max(n_tiles - bail_tiles, 0.0)
    px = live_tiles * tile_h * tile_w
    bytes_moved = live_entries * ENTRY_BYTES + px * 4.0
    vops = live_entries * tile_h * tile_w * OPS_PER_ENTRY + px * OPS_RESOLVE
    return _bound(bytes_moved, vops)


def coarse_model(stats: Dict, *, max_hits: int, max_candidates: int,
                 max_deltas: int) -> Dict[str, float]:
    import math

    n_hits = float(np.asarray(stats.get("n_hits", 0)).sum())
    n_cand = float(np.asarray(stats.get("n_candidates", 0)).sum())
    n_deltas = float(np.asarray(stats.get("n_deltas", 0)).sum())
    n_segs = float(np.asarray(stats.get("n_segments", 0)).sum())
    records = n_hits + n_cand + n_deltas
    # Expansion write + sorted gather read + sort in/out: 4 crossings of
    # the 16-word row per record; segment derivation reads its point
    # pairs (4 f32) and writes ~16 attribute words once.
    bytes_moved = records * 4 * ENTRY_BYTES + n_segs * (4 + 16) * 4.0
    # The sort's compare-exchange network over the PADDED capacity is the
    # VPU-side floor: E/2 * log2(E)*(log2(E)+1)/2 exchanges x ~8 ops.
    e_pad = max(float(max_hits + max_candidates + max_deltas), 1.0)
    lg = math.log2(e_pad)
    vops = e_pad / 2 * lg * (lg + 1) / 2 * 8 + records * 64
    return _bound(bytes_moved, vops)


def _bound(bytes_moved: float, vops: float) -> Dict[str, float]:
    ms_hbm = bytes_moved / HBM_BYTES_PER_S * 1e3
    ms_vpu = vops / VPU_F32_OPS_PER_S * 1e3
    return {
        "bytes_moved": bytes_moved,
        "vpu_ops": vops,
        "ms_hbm": ms_hbm,
        "ms_vpu": ms_vpu,
        "ms_floor": max(ms_hbm, ms_vpu),
    }


def frame_roofline(stats: Dict, config, coarse_ms: float | None,
                   fine_ms: float | None, total_ms: float) -> Dict:
    """Assemble the bench-facing roofline dict: per-stage speed-of-light
    floors + percent-of-roofline for whatever measured splits exist."""
    n_tiles = config.tiles_x * config.tiles_y
    fine = fine_model(stats, tile_h=config.tile_height,
                      tile_w=config.tile_width, n_tiles=n_tiles)
    coarse = coarse_model(stats, max_hits=config.max_hits,
                          max_candidates=config.max_candidates,
                          max_deltas=config.max_deltas)
    out = {
        "fine": _stage(fine, fine_ms),
        "coarse": _stage(coarse, coarse_ms),
        "frame": _stage(_bound(fine["bytes_moved"] + coarse["bytes_moved"],
                               fine["vpu_ops"] + coarse["vpu_ops"]),
                        total_ms),
    }
    return out


def _stage(model: Dict[str, float], measured_ms: float | None) -> Dict:
    d = {"ms_floor": round(model["ms_floor"], 3),
         "ms_hbm": round(model["ms_hbm"], 3),
         "ms_vpu": round(model["ms_vpu"], 3),
         "gbytes": round(model["bytes_moved"] / 1e9, 3)}
    if measured_ms is not None and measured_ms > 0:
        d["measured_ms"] = round(measured_ms, 3)
        d["pct_of_roofline"] = round(100 * model["ms_floor"] / measured_ms,
                                     1)
    return d
