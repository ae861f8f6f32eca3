#!/usr/bin/env python
"""Thin spark-submit driver file.

spark-submit needs a top-level script; the library ships alongside as a
--py-files zip (scripts/package_pyfiles.py). Example:

    spark-submit --master yarn --num-executors 4N \
        --py-files dist/mysql_es_spark.zip cli_submit.py \
        build --input s3://…/transcripts --index-dir s3://…/ix --enrich
"""

import os
import sys

os.environ.setdefault("SPARK_SUBMIT_MODE", "1")

from mysql_es_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
