"""``python -m nutch_spark`` — the bin/nutch-equivalent front door."""

import sys

from nutch_spark.cli import main

sys.exit(main())
