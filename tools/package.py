"""Build the --py-files archive for spark-submit deployment.

    python tools/package.py [out.zip]
    spark-submit --py-files ocr_spark.zip jobs/run_extraction.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "ocr_spark.zip") -> str:
    pkg = os.path.join(REPO, "ocr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "ocr_spark.zip"
    print(build(out))
