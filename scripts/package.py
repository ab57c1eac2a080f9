"""Build the deployable --py-files artifact: dist/ontology_pipeline_spark.zip.

North-rule parity: the pipeline "runs via spark-submit --py-files on a
multi-executor cluster".  This script produces that artifact; job.py is the
matching entry point:

    python scripts/package.py
    spark-submit --py-files dist/ontology_pipeline_spark.zip job.py \
        --input /path/to/pages --output /path/to/kg

The zip is REPRODUCIBLE: entries are sorted, timestamps pinned to the zip
epoch, permissions normalized — two builds of the same tree are
byte-identical, so the artifact hash in deploy lineage identifies the code
exactly (same role as the reference's git-pinned env, /root/reference
README.md deploy notes).
"""

from __future__ import annotations

import hashlib
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "ontology_pipeline_spark"


def build_zip(out_path: str | None = None) -> str:
    """Zip the package source into ``out_path`` (default dist/<pkg>.zip)."""
    if out_path is None:
        out_path = os.path.join(REPO, "dist", f"{PACKAGE}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PACKAGE)
    entries = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            full = os.path.join(dirpath, name)
            entries.append((os.path.relpath(full, REPO), full))
    if not entries:
        raise SystemExit(f"no python sources under {src_root}")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16  # normalize permissions
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


def main() -> None:
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else None)
    with open(out, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    with zipfile.ZipFile(out) as zf:
        n = len(zf.namelist())
    print(f"{out}  files={n}  sha256={digest}")


if __name__ == "__main__":
    main()
