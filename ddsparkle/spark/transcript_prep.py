"""spark-submit surface for the CONVERSATION curation pipeline — the
transcript counterpart of ``dataprep.run_dataprep``: read a transcripts
parquet lake (the north-star schema: conv_id, turn_idx, role, text, tool,
ts), run ``transcript_ops.curate_conversations`` (exact conversation dedup
→ near-dup connected-components resolution → structural quality gates),
write the curated TURNS (input schema preserved) plus a per-stage stats
JSON. Run via ``scripts/submit_curate_transcripts.py``.
"""

from __future__ import annotations

import argparse
import json
import os

__all__ = ["run_curate_transcripts"]


def run_curate_transcripts(args) -> dict:
    from .session import get_spark
    from .transcript_ops import curate_conversations

    spark = get_spark("ddsparkle-curate-transcripts")
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.source)
    curated, stats = curate_conversations(
        df,
        min_turns=args.min_turns,
        require_roles=tuple(args.require_roles.split(","))
        if args.require_roles
        else (),
        jaccard_threshold=args.jaccard_threshold,
        max_digest_df=args.max_digest_df,
    )
    # the curated frame is backed by the pipeline's fuzzy_kept cache
    # (curate_conversations' release_cache contract), so this write does
    # not recompute the dedup lineage
    curated.write.mode("overwrite").parquet(args.output)
    stats["output_rows"] = spark.read.parquet(args.output).count()
    if args.stats:
        os.makedirs(os.path.dirname(args.stats) or ".", exist_ok=True)
        with open(args.stats, "w") as f:
            json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    return stats


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="conversation curation pipeline")
    p.add_argument("--source", required=True, help="transcripts parquet path")
    p.add_argument("--output", required=True, help="curated turns parquet path")
    p.add_argument("--stats", default=None, help="stage-count JSON path")
    p.add_argument("--min-turns", type=int, default=2)
    p.add_argument(
        "--require-roles", default="user,assistant",
        help="comma list; every kept conversation must contain each role",
    )
    p.add_argument("--jaccard-threshold", type=float, default=0.6)
    p.add_argument("--max-digest-df", type=int, default=64)
    return p


if __name__ == "__main__":
    run_curate_transcripts(_parser().parse_args())
