"""spark-submit driver: conversation-granularity curation (exact dedup +
near-dup cluster resolution + structural quality gates) over a transcripts
parquet lake (north-star schema)."""
import sys

from ddsparkle.spark.transcript_prep import _parser, run_curate_transcripts

if __name__ == "__main__":
    run_curate_transcripts(_parser().parse_args(sys.argv[1:]))
