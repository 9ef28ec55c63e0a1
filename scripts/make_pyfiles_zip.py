#!/usr/bin/env python
"""Build dist/sketchlib.zip for `spark-submit --py-files` (north_rule ship
mechanism).  Pure stdlib; run from the repo root."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "dist", "sketchlib.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pkg = os.path.join(ROOT, "streaming_algorithms_spark")
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(OUT)


if __name__ == "__main__":
    main()
