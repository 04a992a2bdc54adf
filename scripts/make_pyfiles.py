#!/usr/bin/env python
"""Build the --py-files artifact: a zip of ba_gepris_crawler_spark that
spark-submit ships to every executor (the north-rule deployment unit).

Only package sources go in — no tests, no caches, no data. The zip layout
is import-rooted (ba_gepris_crawler_spark/... at the top level) so
executors can `import ba_gepris_crawler_spark` directly off the zip.

Usage: python scripts/make_pyfiles.py [out.zip]
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "ba_gepris_crawler_spark"


def build(out: pathlib.Path) -> int:
    out.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    # deterministic artifact: sorted entries, zeroed timestamps
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(PKG.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            info = zipfile.ZipInfo(str(p.relative_to(REPO)), date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, p.read_bytes())
            n += 1
    return n


if __name__ == "__main__":
    out = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "ba_gepris_crawler_spark.zip"
    n = build(out)
    print(f"{out} ({n} files)")
