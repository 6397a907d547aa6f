"""CLI wrapper: build the --py-files archive for spark-submit deployment.

    python tools/package.py [out.zip]
    spark-submit --py-files ocr_spark.zip jobs/run_extraction.py ...

The archive builder itself lives in tools/pyfiles.py (deterministic,
byte-stable output) and is shared with tests/test_spark_submit.py and
tools/scaling_bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.pyfiles import build_pyfiles_zip  # noqa: E402

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "ocr_spark.zip"
    print(build_pyfiles_zip(out))
