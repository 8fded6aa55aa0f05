#!/usr/bin/env python
"""Build the --py-files artifact: a zip of the deepref_spark package
(sources + data artifacts like the pinned wordpiece vocab).
`python scripts/package_pyfiles.py [out.zip]`."""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path


def build(out: str = "deepref_spark.zip") -> str:
    root = Path(__file__).resolve().parent.parent
    pkg = root / "deepref_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(list(pkg.rglob("*.py")) + list(pkg.rglob("data/*.txt"))):
            z.write(f, f.relative_to(root))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "deepref_spark.zip"))
