#!/usr/bin/env python
"""spark-submit entrypoint shim (see tools/package.py for the full command):

    spark-submit --py-files dist/schema_infer_plugin_spark.zip \\
        run_validation.py --input iceberg:prod.transcripts \\
        --out s3://bucket/runs/r1 --run-id r1 --n-buckets 4096 [--config engine.yaml]
"""

from schema_infer_plugin_spark.plans.runner import main

if __name__ == "__main__":
    main()
