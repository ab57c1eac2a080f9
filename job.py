"""spark-submit entry point for the KG-construction pipeline.

    spark-submit --py-files ontology_pipeline_spark.zip job.py \
        --input /path/to/pages_parquet --output /path/to/kg [--no-resume]

On a cluster the input is the Iceberg `pages` table and the sinks are Iceberg
tables; locally both are parquet directories.  The run is resumable: pages
already in the committed lineage are skipped (left-anti join), so re-running
after a failure processes only the remainder (reference checkpoint semantics,
src/extractor.py:46-74).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages parquet dir / table path")
    p.add_argument("--output", required=True, help="output dir (triples/, lineage/, metrics/)")
    p.add_argument("--no-resume", action="store_true", help="reprocess everything")
    p.add_argument("--run-id", default=None)
    p.add_argument("--master", default=None, help="override master (default: spark-submit's)")
    args = p.parse_args()

    from ontology_pipeline_spark.plans.pipeline import run_pipeline
    from ontology_pipeline_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="kg-construct")
    summary = run_pipeline(
        spark,
        pages_path=args.input,
        out_dir=args.output,
        run_id=args.run_id,
        resume=not args.no_resume,
    )
    print(json.dumps(summary))
    spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()
