#!/usr/bin/env python
"""Time ONE benchmark config on the attached TPU and print a JSON line.

The A/B lever for renderer knobs that ride env vars (PIET_PAIR,
PIET_EXPAND_IMPL, PIET_DENSE_BARRIERS): run this twice with different
environments and diff the reported ms.  Uses bench.py's pipelined,
sync-cost-subtracted methodology (imported, not copied).

Usage: python tools/time_config.py [config]
  config: tiger_4k (default), tiger_8x, circles_rects_1k, beziers_10k,
          glyph_page_5k, animated_clips
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_config  # noqa: E402  (sets the compile cache dir)


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "tiger_4k"

    from piet_tpu.scene import fixtures
    from piet_tpu.scene.svg import make_tiger

    configs = {
        "tiger_4k": (lambda: make_tiger(scale=19.2), 3840, 2160),
        "tiger_8x": (lambda: make_tiger(scale=8.0), 1664, 1664),
        "circles_rects_1k":
            (lambda: fixtures.get_scene("circles_rects"), 1024, 1024),
        "beziers_10k":
            (lambda: fixtures.get_scene("beziers_10k"), 1024, 1024),
        "glyph_page_5k":
            (lambda: fixtures.get_scene("glyph_page"), 1024, 1024),
        "animated_clips":
            (lambda: fixtures.get_scene("animated"), 1024, 1024),
    }
    make, w, h = configs[name]
    ms, _, stats = _bench_config(name, make(), w, h)
    print(json.dumps({
        "config": name,
        "ms_per_frame": round(ms, 3),
        "viewport": f"{w}x{h}",
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("PIET_")},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
