"""CLI entry point — the reference's ``python src/etl_pipeline.py`` analog:

    python -m kickstarter_etl_pipeline_spark <csv_path> [--db NAME] [--infer-schema]
"""

from __future__ import annotations

import argparse
import sys

from kickstarter_etl_pipeline_spark.logging_config import configure_logger
from kickstarter_etl_pipeline_spark.pipeline import run_pipeline
from kickstarter_etl_pipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="kickstarter_etl_pipeline_spark")
    parser.add_argument("csv_path", help="raw Kickstarter CSV")
    parser.add_argument("--db", default="kickstarter_wh", help="warehouse database name")
    parser.add_argument("--log-file", default="logs/etl_pipeline.log")
    parser.add_argument(
        "--infer-schema",
        action="store_true",
        help="reference-parity inference instead of the explicit schema",
    )
    args = parser.parse_args(argv)
    logger = configure_logger(log_file=args.log_file)
    spark = get_spark("kickstarter-etl-pipeline")
    counts = run_pipeline(
        spark, args.csv_path, db=args.db, infer_schema=args.infer_schema, logger=logger
    )
    return 0 if counts is not None else 1


if __name__ == "__main__":
    sys.exit(main())
