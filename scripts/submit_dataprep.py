"""spark-submit driver: end-to-end training-data curation (dedup exact +
fuzzy, quality + language gates) over a documents parquet lake."""
import sys

from ddsparkle.spark.dataprep import _parser, run_dataprep

if __name__ == "__main__":
    run_dataprep(_parser().parse_args(sys.argv[1:]))
