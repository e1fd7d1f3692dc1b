"""Build the spark-submit --py-files artifact for this engine.

The north-star deployment shape ships the engine as `spark-submit
--py-files dist/geojson_vt_spark.zip jobs/pyramid_job.py ...` (reference
deployment contract; see BASELINE.json north_rule). This builds a plain
zipimport-able archive of the `geojson_vt_spark` package — no setup.py /
wheel machinery needed on an executor, Spark adds the zip to every
worker's sys.path.

Usage: python make_pyfiles.py [--out dist/geojson_vt_spark.zip]
Prints the artifact path on success.
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))
PACKAGE = "geojson_vt_spark"


def build_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PACKAGE}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg_root = os.path.join(REPO, PACKAGE)
    # deterministic archive: sorted walk, fixed timestamps (stable re-builds
    # mean executors never see a mid-job artifact change on re-submit)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".pyc", ".pyo")):
                continue
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, REPO)
            entries.append((full, rel))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as f:
                zf.writestr(info, f.read())
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    print(build_zip(args.out))


if __name__ == "__main__":
    main()
