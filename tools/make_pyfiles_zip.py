"""Build the --py-files archive for spark-submit deployment.

    python tools/make_pyfiles_zip.py [out.zip]

Zips the `distributed_graph_analytics_spark` package (source only, no
caches) so a cluster run is:

    spark-submit --py-files dga.zip -m distributed_graph_analytics_spark.cli \
        pr -i s3://bucket/edges.csv -o s3://bucket/out
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "distributed_graph_analytics_spark"


def build(out_path: str, repo_root: str | None = None) -> list[str]:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = []
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, root)
                zf.write(full, arc)
                names.append(arc)
    return names


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "dga.zip"
    names = build(out)
    print(f"{out}: {len(names)} files")
