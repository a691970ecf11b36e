"""crawlspark.zip (the spark-submit --py-files artifact) must match the
source tree — a stale zip deploys old code (e.g. a pre-replay-safety
catalog) to the cluster while local tests pass against HEAD."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_matches_source_tree():
    zip_path = os.path.join(REPO, "crawlspark.zip")
    assert os.path.exists(zip_path), (
        "crawlspark.zip missing — run scripts/make_pyfiles.py"
    )
    src = {}
    pkg = os.path.join(REPO, "crawlspark")
    for root, _dirs, files in os.walk(pkg):
        for name in files:
            if name.endswith(".py"):
                full = os.path.join(root, name)
                with open(full, "rb") as f:
                    src[os.path.relpath(full, REPO)] = f.read()
    with zipfile.ZipFile(zip_path) as z:
        zipped = {i.filename: z.read(i.filename) for i in z.infolist()
                  if i.filename.endswith(".py")}
    missing = sorted(set(src) - set(zipped))
    extra = sorted(set(zipped) - set(src))
    stale = sorted(k for k in set(src) & set(zipped) if src[k] != zipped[k])
    assert not (missing or extra or stale), (
        f"crawlspark.zip is stale — rerun scripts/make_pyfiles.py; "
        f"missing={missing} extra={extra} differs={stale}"
    )
