#!/usr/bin/env python3
"""spark-submit driver script: delegates to sdk_spark.cli.

    spark-submit --py-files sdk_spark.zip validate_job.py --schema ... --input ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sdk_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
