"""Build the ``--py-files`` deployment artifact.

The reference ships as a single static Go binary (Dockerfile builds
``stellar-ledger-data-indexer``, run as one process). The Spark analog of
"one deployable unit" is a zip of this package handed to
``spark-submit --py-files``: executors unpack it onto their PYTHONPATH, so
the same artifact drives a 1000-executor cluster and a laptop.

    python -m stellar_ledger_data_indexer_spark.package dist/sldi_spark.zip
    spark-submit --master <cluster> --py-files dist/sldi_spark.zip \
        main.py append --events-path ... --warehouse ...

Only source files are packed (no __pycache__, no tests) and entries are
written in sorted order with a fixed timestamp, so the artifact is
byte-reproducible — two builds of the same tree hash identically.
"""

from __future__ import annotations

import os
import sys
import zipfile

FIXED_ZINFO_DATE = (1980, 1, 1, 0, 0, 0)   # zip epoch: reproducible builds


def make_pyfiles_zip(out_path: str) -> str:
    """Zip this package (import-rooted, i.e. entries start with
    ``stellar_ledger_data_indexer_spark/``) for ``spark-submit
    --py-files`` / ``sc.addPyFile``. Returns ``out_path``."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    pkg = os.path.basename(pkg_dir)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, root), full))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            zi = zipfile.ZipInfo(arcname.replace(os.sep, "/"),
                                 date_time=FIXED_ZINFO_DATE)
            zi.external_attr = 0o644 << 16
            zf.writestr(zi, data, zipfile.ZIP_DEFLATED)
    if not any(a == f"{pkg}/__init__.py" for a, _ in entries):
        raise RuntimeError(f"package root {pkg}/__init__.py missing")
    return out_path


if __name__ == "__main__":
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist/sldi_spark.zip"
    print(make_pyfiles_zip(dest))
