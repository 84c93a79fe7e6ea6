"""Package shipping: the ``spark-submit --py-files`` artifact.

Python workers are separate processes; they only see the driver's package if
it is on their import path.  ``build_package_zip`` zips the installed
``languagedetection_spark`` package and ``ship_package`` registers it with
``SparkContext.addPyFile`` -- identical in effect to submitting with
``--py-files languagedetection_spark.zip``, and required whenever the driver
is not launched from the repo root (verified failure mode: worker
``ModuleNotFoundError`` when cwd != /root/repo).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark import SparkContext


def build_package_zip() -> str:
    """Zip the package into a content-addressed temp file (idempotent)."""
    import languagedetection_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    names = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                names.append(os.path.join(root, f))
    names.sort()
    h = hashlib.sha256()
    for n in names:
        with open(n, "rb") as fh:
            h.update(n.encode())
            h.update(fh.read())
    out = os.path.join(
        tempfile.gettempdir(), f"languagedetection_spark-{h.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for n in names:
                arc = os.path.join(
                    "languagedetection_spark", os.path.relpath(n, pkg_dir)
                )
                z.write(n, arc)
        os.replace(tmp, out)
    return out


def ship_package(sc: SparkContext) -> str:
    """Make the package importable on every Python worker."""
    path = build_package_zip()
    sc.addPyFile(path)
    return path
