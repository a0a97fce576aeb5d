"""spark-submit driver: checkpointed per-type quantiles over events."""
import sys
from ddsparkle.spark.jobs import _parser, run_job

if __name__ == "__main__":
    run_job(_parser().parse_args(sys.argv[1:]))
