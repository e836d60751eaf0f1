"""Build the --py-files artifact for cluster submission.

    python tools/make_pyfiles_zip.py [dest.zip]

Zips the ``sentinel2_crop_trait_timeseries_spark`` package (source only,
no tests/caches) so a real cluster run ships the engine to every
executor:

    spark-submit --master yarn --py-files dist/s2tt_spark.zip \
        tools/run_pipeline.py --input ... --output ... --manifest ...

tests/test_submit_pipeline.py proves the artifact is self-sufficient:
it submits from a directory where the package is NOT importable, so
the driver and executors can only resolve it from the zip.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "sentinel2_crop_trait_timeseries_spark"


def build_zip(dest: str) -> str:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                path = os.path.join(root, f)
                z.write(path, os.path.relpath(path, REPO))
    return dest


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "s2tt_spark.zip"
    )
    print(build_zip(dest))
