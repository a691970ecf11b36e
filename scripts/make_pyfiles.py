"""Package crawlspark/ into crawlspark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "crawlspark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "crawlspark")
        for root, _dirs, files in os.walk(pkg):
            for name in sorted(files):
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    z.write(full, os.path.relpath(full, REPO))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
