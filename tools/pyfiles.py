"""Build the ``--py-files`` archive of the ocr_spark package.

``spark-submit --py-files ocr_spark.zip`` ships the archive to the
driver and every executor and prepends it to their Python path — the
packaging contract a real cluster run depends on (the reference north
star names it explicitly).  A job launched from OUTSIDE the repo must
import ``ocr_spark`` solely from the archive; tests/test_spark_submit.py
proves that end-to-end, and tools/scaling_bench.py launches its N / 4N
workers through it.
"""

from __future__ import annotations

import os
import zipfile


def build_pyfiles_zip(dest: str, repo: str | None = None) -> str:
    """Zip ``<repo>/ocr_spark/**/*.py`` (archive-relative paths) → dest.

    Sorted walk + stamp-free entries keep the archive deterministic for a
    given tree, so repeated builds are byte-stable (cacheable by content
    on a shared cluster submit host)."""
    repo = repo or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(repo, "ocr_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg):
            dirs.sort()
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, repo)
                info = zipfile.ZipInfo(rel)  # fixed (1980) timestamp
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as fh:
                    zf.writestr(info, fh.read())
    return dest
