"""Build the --py-files archive for cluster submission (north rule: "run via
spark-submit --py-files"). Produces a deterministic zip of the
knowledge_graph_rag_spark package (no __pycache__, fixed timestamps so
re-builds are byte-identical).

Usage: python jobs/make_pyfiles.py [out.zip]   (default dist/kgrs.zip)
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "knowledge_graph_rag_spark"


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    src = os.path.join(REPO, PKG)
    members = []
    for dirpath, dirnames, files in os.walk(src):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                members.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, rel in sorted(members, key=lambda m: m[1]):
            info = zipfile.ZipInfo(rel, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(full, "rb") as fh:
                zf.writestr(info, fh.read())
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "kgrs.zip")
    print(build(out))
