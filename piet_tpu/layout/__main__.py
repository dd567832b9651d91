"""Regenerate cc/gen/ headers from the layout modules.

Usage:  python -m piet_tpu.layout [--check]

With --check, exits nonzero if the checked-in generated files are stale
(the golden-file discipline the reference lacked -- its GenTypes.h was
pasted and hand-edited, GenTypes.h:3,324)."""

from __future__ import annotations

import os
import sys

from .emit_cpp import emit_cpp, emit_srgb_header
from .modules import ptcl_module, scene_module

GEN_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "cc", "gen"))


def generate() -> dict:
    return {
        "piet_scene_gen.h": emit_cpp(scene_module()),
        "piet_ptcl_gen.h": emit_cpp(ptcl_module()),
        "piet_srgb_gen.h": emit_srgb_header(),
    }


def main(argv) -> int:
    check = "--check" in argv
    os.makedirs(GEN_DIR, exist_ok=True)
    stale = []
    for fname, content in generate().items():
        path = os.path.join(GEN_DIR, fname)
        if check:
            old = open(path).read() if os.path.exists(path) else None
            if old != content:
                stale.append(fname)
        else:
            with open(path, "w") as f:
                f.write(content)
            print(f"wrote {path}")
    if stale:
        print(f"stale generated files: {stale}; run python -m piet_tpu.layout")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
