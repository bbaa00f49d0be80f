"""CLI entry point: python -m dartray_tpu scene.pbrt [-o out.png]

The working analog of bin/dartray.dart:27-52 (whose render call is
commented out in the reference — we do better).
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="dartray_tpu",
        description="TPU-native PBRT-v2-compatible renderer")
    ap.add_argument("scene", help=".pbrt scene file (or archive)")
    ap.add_argument("-o", "--output", default=None,
                    help="output image (png/tga/pfm/hdr); default: the "
                         "scene's Film filename or out.png")
    ap.add_argument("--spp", type=int, default=None,
                    help="override samples per pixel")
    ap.add_argument("--scale", type=float, default=None,
                    help="resolution scale override")
    ap.add_argument("--quick", action="store_true",
                    help="quick render (quarter res, 1 spp) — the "
                         "RenderOverrides quickRender flag")
    ap.add_argument("-I", "--include", action="append", default=[],
                    help="additional search path(s)")
    ap.add_argument("-q", "--quiet", action="store_true")
    args = ap.parse_args(argv)

    from .renderers import manager
    from .io import image as io_img
    import numpy as np

    log = (lambda *a, **k: None) if args.quiet else print
    overrides = {}
    if args.quick:
        overrides["quick_render"] = True
    if args.spp is not None:
        overrides["spp"] = args.spp
    if args.scale is not None:
        overrides["resolution_scale"] = args.scale

    t0 = time.time()
    last = [0.0]

    def progress(done, total, film):
        now = time.time()
        if now - last[0] > 2.0 or done == total:
            last[0] = now
            log(f"[{now - t0:7.1f}s] wave {done}/{total}")

    img = manager.render_pbrt(args.scene, search_paths=args.include,
                              overrides=overrides or None,
                              progress=None if args.quiet else progress)
    out = args.output or "out.png"
    io_img.save(out, np.clip(np.asarray(img), 0.0, 1.0))
    log(f"wrote {out} ({img.shape[1]}x{img.shape[0]}) "
        f"in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
