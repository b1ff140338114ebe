"""Ship the selma_spark package to executor Python workers.

Driver-side ``sys.path`` does not propagate to Spark's worker
processes, so any UDF that references this package must ship it —
in production via ``spark-submit --py-files selma_spark.zip`` (the
north rule's launch mode), and self-servingly here via
``SparkContext.addPyFile`` with a zip built on the fly.

Idempotent per SparkContext."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile
from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parents[1]  # .../selma_spark


def build_pyfiles_zip() -> str:
    """Zip the package sources to a content-addressed path in tmp."""
    files = sorted(
        p for p in _PKG_ROOT.rglob("*.py") if "__pycache__" not in p.parts
    )
    h = hashlib.sha1()
    for p in files:
        h.update(str(p.relative_to(_PKG_ROOT.parent)).encode())
        h.update(p.read_bytes())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"selma_spark-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in files:
                zf.write(p, arcname=str(p.relative_to(_PKG_ROOT.parent)))
        os.replace(tmp, zip_path)
    return zip_path


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    shipped = sc._jsc is not None and getattr(sc, "_selma_pyfiles", None)
    if shipped:
        return
    sc.addPyFile(build_pyfiles_zip())
    sc._selma_pyfiles = True


if __name__ == "__main__":
    print(build_pyfiles_zip())
