"""spark-submit entrypoint: spark-submit --py-files crawlspark.zip \
       scripts/submit_crawl.py crawl --workdir /tmp/run1 --pages 5

Build the zip with: python scripts/make_pyfiles.py
"""

import sys

from crawlspark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
