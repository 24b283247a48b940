"""``python -m schema_infer_plugin_spark`` → the CLI (cli.py)."""

import sys

from schema_infer_plugin_spark.cli import main

sys.exit(main())
