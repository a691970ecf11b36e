"""spark-submit entrypoint:

    spark-submit --driver-memory 8g --py-files crawlspark.zip \
        scripts/submit_crawl.py crawl --workdir /tmp/run1 --pages 5

Build the zip with: python scripts/make_pyfiles.py

--driver-memory (or spark.driver.memory in spark-defaults) must be set ON
THE SUBMIT COMMAND: the session builder's spark.driver.memory is a no-op
under spark-submit because the JVM is already running when Python starts,
and local-mode executors live in that same JVM — the 1g default heap OOMs
partway through a crawl. (Plain `python -m crawlspark.cli` is unaffected:
there the builder launches the JVM and the 8g default applies.)
"""

import sys

from crawlspark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
