"""End-to-end training-data curation pipeline: the composition of the
dataops operators a 100 TB document lake actually runs before training —

    scan -> exact dedup -> fuzzy dedup (MinHash/LSH/Jaccard -> connected
    components, keep cluster representatives) -> quality + language filters
    -> curated parquet + a stats JSON.

Every stage is the scale-shaped variant: exact dedup is a map-side-combined
groupBy, candidate generation is a skew-guarded bucket join (never
all-pairs), cluster resolution is min-label propagation, filters are pure
Catalyst (pushdown-friendly). Run via spark-submit (scripts/submit_dataprep
.py) or call ``curate()`` directly.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

__all__ = ["curate", "run_dataprep"]


def curate(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_mean_token_len: float = 20.0,
    languages: Optional[list[str]] = None,
    jaccard_threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: Optional[int] = 1000,
    normalize_before_dedup: bool = False,
    decontaminate_against=None,
    decontam_shingle_n: int = 8,
    repetition_thresholds: Optional[dict] = None,
    lm_model=None,
    lm_bits_threshold: Optional[float] = None,
    model_score_threshold: Optional[float] = None,
    strip_spans_k: Optional[int] = None,
    strip_spans_min_occurrences: int = 2,
    release_cache: bool = False,
):
    """Returns (curated DataFrame, stats dict). The curated frame keeps the
    INPUT schema exactly — one representative per exact/fuzzy duplicate
    cluster, only documents passing the quality + language gates; ``stats``
    accounts for every drop. Optional stages: ``decontaminate_against``
    (a reference/benchmark DataFrame; docs sharing any
    ``decontam_shingle_n``-gram are dropped FIRST, via the 8-byte-hash
    shingle join), ``normalize_before_dedup`` (formatting-invariant
    exact dedup), ``repetition_thresholds`` (Gopher repetition gates: a
    {signal: max} dict over ``repetition.repetition_signals`` columns,
    e.g. {"dup_5gram_frac": 0.3}; runs after the Catalyst gates, before
    the model stage), ``lm_model`` + ``lm_bits_threshold`` (statistical
    bigram-LM gate: drop documents whose integer-bits surprisal per
    transition under the PRE-TRAINED ``ngram_lm.NGramLM`` exceeds the
    threshold — train the model on an explicit reference corpus first;
    runs between the repetition gates and the classifier), and ``model_score_threshold`` (model-based quality: the
    hashed-n-gram linear scorer of ``quality_model.model_quality_score``
    runs LAST, over only the heuristic-gate survivors — the cheap
    heuristics shrink the corpus before the model pass, the standard
    classifier-last curation order; docs scoring below the threshold are
    dropped, with an ``after_model_quality`` stage count), and
    ``strip_spans_k`` (Lee et al. 2021 substring dedup: every token run
    covered by a duplicated ``strip_spans_k``-token window is REMOVED from
    the text of every exact-dedup survivor — all occurrences, the
    published-tool behavior — BEFORE fuzzy dedup, so boilerplate spans
    neither keep near-dups apart nor glue unrelated docs together;
    hollowed-out documents then fall to the ``min_tokens`` gate, and
    ``span_stripped_tokens`` / ``docs_with_dup_spans`` join the stats). The intermediate dedup survivors are persisted so the
    per-stage counts and the caller's final write do not recompute the
    dedup lineage; the returned frame is backed by that cached stage.
    ``release_cache=True`` unpersists it before returning — use when only
    ``stats`` are consumed (a later action on the returned frame would
    recompute the pipeline); note that unpersisting the returned frame
    itself is a no-op (it is a plan DERIVED from the cached stage, and
    Spark's unpersist only drops exact-plan matches)."""
    from pyspark.sql import functions as F

    from .dataops import (
        _ensure_parallelism,
        cross_corpus_contamination,
        exact_dedup,
        exact_dedup_normalized,
        language_pred_expr,
        near_dup_clusters,
        quality_exprs,
    )

    n_input = df.count()

    # r6 (guide §2.5/§4, CLAUDE.md single-file-parquet footgun): a corpus
    # read as ONE split keeps that single partition through every
    # broadcast-join stage below, so the cached fuzzy-survivor frame — and
    # with it every downstream quality/language gate count and Arrow scorer
    # pass (repetition / LM / model) — ran on ONE task (measured 4.2 s
    # single-task LM count at sf0.1). ONLY fuzzy_kept is spread: its 3+
    # consumers are the per-row-expensive ones, while the earlier cached
    # stages feed operators that parallelize internally (near_duplicates /
    # the scorers carry their own _ensure_parallelism) — spreading those
    # too was measured a net LOSS (0.93x on the stats-only pipelines, the
    # extra text shuffles outweighing the single-task counts they saved).
    # Row-local gates/scorers make the spread result-invariant; structural
    # no-op at 100 TB (wide inputs already scan as >= cores splits).

    # 0. (optional) benchmark decontamination FIRST — contaminated docs
    # must not survive as dedup representatives of clean ones
    n_decontam = n_input
    decontam_cached = None
    if decontaminate_against is not None:
        clean_ids = cross_corpus_contamination(
            df, decontaminate_against, text_col, id_col,
            shingle_n=decontam_shingle_n, join_on_hash=True,
        ).filter(~F.col("contaminated")).select(id_col)
        # cache the decontaminated corpus: it feeds THREE evaluations below
        # (the stage count, the dedup-reps aggregation, and the survivor
        # join) — without the cache each re-runs the shingle join
        df = decontam_cached = df.join(clean_ids, id_col).persist()
        n_decontam = df.count()

    # 1. exact dedup (cheapest first: shrinks everything downstream);
    # normalize_before_dedup folds formatting variants into one cluster
    dedup_fn = exact_dedup_normalized if normalize_before_dedup else exact_dedup
    reps = dedup_fn(df, text_col, id_col)  # [id_col, n_copies]
    exact_kept = df.join(reps.select(id_col), id_col).persist()
    n_exact = exact_kept.count()
    if decontam_cached is not None:
        # exact_kept's cache now shields downstream lineage
        decontam_cached.unpersist()

    # 1.5 (optional) duplicated-span strip: corpus-wide substring dedup
    # over the exact-dedup survivors (running it after whole-doc dedup
    # avoids re-discovering every exact duplicate as one giant span). The
    # strip frame derives from the CACHED exact_kept, is persisted itself
    # (it feeds the stats action, fuzzy dedup, and the final plan), and
    # replaces exact_kept downstream so later stages see the cleaned text.
    span_tokens = n_span_docs = None
    stripped_cached = None
    if strip_spans_k is not None:
        from .dataops import strip_duplicated_spans

        # r6: spread the stripped frame like fuzzy_kept below — its cache
        # feeds the (otherwise single-task, measured 1.7 s) span-stats
        # aggregate plus the whole downstream fuzzy chain and final plan
        stripped_cached = _ensure_parallelism(
            strip_duplicated_spans(
                exact_kept,
                text_col=text_col,
                id_col=id_col,
                k=strip_spans_k,
                min_occurrences=strip_spans_min_occurrences,
            )
        ).persist()
        srow = stripped_cached.agg(
            F.sum("n_dropped_tokens").alias("t"),
            F.count(F.when(F.col("n_dropped_tokens") > 0, 1)).alias("d"),
        ).collect()[0]
        span_tokens, n_span_docs = int(srow["t"] or 0), int(srow["d"])
        replaced = stripped_cached.select(
            *[
                F.col("text_stripped").alias(text_col) if c == text_col else F.col(c)
                for c in df.columns
            ]
        )
        exact_kept.unpersist()  # stripped_cached shields the lineage now
        exact_kept = replaced

    # 2. fuzzy dedup on the exact-deduped survivors
    clusters = near_dup_clusters(
        exact_kept,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    )
    fuzzy_kept = _ensure_parallelism(
        exact_kept.join(clusters.filter(F.col("keep")).select(id_col), id_col)
    ).persist()
    n_fuzzy = fuzzy_kept.count()
    # fuzzy_kept's cache shields downstream lineage (when the span stage
    # ran, exact_kept is a plain projection of stripped_cached and the
    # unpersist below is the one that matters)
    exact_kept.unpersist()
    if stripped_cached is not None:
        stripped_cached.unpersist()

    # 3. quality + language gates: row-local Catalyst expressions inlined
    # with filter (no joins, no extra evaluation of the dedup pipeline); at
    # scale they run in the same stage as the final write
    qe = quality_exprs(text_col)
    gated = fuzzy_kept.filter(
        (qe["n_tokens"] >= min_tokens) & (qe["mean_token_len"] <= max_mean_token_len)
    )
    if languages:
        # let-bound single-expression gate: the lambda binds the tokenize
        # once per row (alias-materialized shapes get re-inlined 16x by
        # projection collapse / filter pushdown; the lambda body also
        # evaluates outside whole-stage codegen, sidestepping the Janino
        # 64 KB limit the old fused form hit — see language_pred_expr)
        gated = gated.filter(language_pred_expr(text_col).isin(list(languages)))
    curated = gated.select(*df.columns)  # exactly the input schema

    # 3b-4. Optional statistical stages (Gopher repetition gates -> bigram-
    # LM gate -> hashed-n-gram classifier, cheap-to-expensive, classifier
    # LAST). The RETURNED ``curated`` frame keeps the staged lazy chain
    # (each scorer sees only the previous stage's survivors — the
    # classifier-last contract, and at scale the cheapest row count for a
    # caller consuming the rows). The per-stage COUNTS, however, are
    # cumulative-conjunction counts and therefore computable in ONE
    # aggregation job over a single enriched observer frame (r6, guide
    # §2.4: the old one-count-action-per-stage shape re-evaluated the
    # catalyst gates for every stage count and the LM scorer once per
    # LATER stage — three jobs and double Arrow passes for identical
    # integers).
    rep_cond = lm_cond = model_cond = None
    obs = curated
    if repetition_thresholds:
        import re

        from .repetition import repetition_signals

        top_ns, dup_ns = [], []
        for k in repetition_thresholds:
            m = re.fullmatch(r"(top|dup)_(\d+)gram_frac", k)
            if not m:
                raise ValueError(f"unknown repetition signal {k!r}")
            (top_ns if m.group(1) == "top" else dup_ns).append(int(m.group(2)))
        for k, v in repetition_thresholds.items():
            c = F.col(k) <= float(v)
            rep_cond = c if rep_cond is None else (rep_cond & c)
        obs = repetition_signals(
            obs, text_col=text_col, top_ns=sorted(top_ns), dup_ns=sorted(dup_ns)
        )
        curated = repetition_signals(
            curated, text_col=text_col, top_ns=sorted(top_ns), dup_ns=sorted(dup_ns)
        ).filter(rep_cond).select(*df.columns)
    if lm_bits_threshold is not None:
        if lm_model is None:
            raise ValueError(
                "lm_bits_threshold requires lm_model (a trained NGramLM)"
            )
        from .ngram_lm import lm_quality_score

        lm_cond = F.col("bits_per_token") <= float(lm_bits_threshold)
        obs = lm_quality_score(obs, lm_model, text_col=text_col)
        curated = (
            lm_quality_score(curated, lm_model, text_col=text_col)
            .filter(lm_cond)
            .select(*df.columns)
        )
    if model_score_threshold is not None:
        from .quality_model import model_quality_score

        model_cond = F.col("model_score") >= float(model_score_threshold)
        obs = model_quality_score(obs, text_col=text_col)
        curated = (
            model_quality_score(curated, text_col=text_col)
            .filter(model_cond)
            .select(*df.columns)
        )

    if rep_cond is None and lm_cond is None and model_cond is None:
        n_final = curated.count()
        n_rep = n_lm = n_model = n_final
    else:
        # one job: count(*) = catalyst survivors; each enabled stage adds
        # a SUM over the cumulative conjunction (NULL conditions count 0,
        # exactly like the filter they replace); a disabled stage inherits
        # the previous count, as before
        aggs = [F.count(F.lit(1)).alias("n_final")]
        acc = None
        stage_alias = {}
        for name, c in (("n_rep", rep_cond), ("n_lm", lm_cond), ("n_model", model_cond)):
            if c is None:
                stage_alias[name] = None
                continue
            acc = c if acc is None else (acc & c)
            aggs.append(F.sum(acc.cast("long")).alias(name))
            stage_alias[name] = name
        row = obs.agg(*aggs).collect()[0]
        n_final = int(row["n_final"])
        prev = n_final
        vals = {}
        for name in ("n_rep", "n_lm", "n_model"):
            if stage_alias[name] is not None:
                prev = int(row[name] or 0)
            vals[name] = prev
        n_rep, n_lm, n_model = vals["n_rep"], vals["n_lm"], vals["n_model"]
    if release_cache:
        fuzzy_kept.unpersist()

    stats = {
        "input_docs": n_input,
        "after_decontamination": n_decontam,
        "dropped_contaminated": n_input - n_decontam,
        "after_exact_dedup": n_exact,
        "after_fuzzy_dedup": n_fuzzy,
        "after_quality_language": n_final,
        "dropped_exact_dups": n_decontam - n_exact,
        "dropped_fuzzy_dups": n_exact - n_fuzzy,
        "dropped_quality_language": n_fuzzy - n_final,
    }
    if strip_spans_k is not None:
        stats["span_stripped_tokens"] = span_tokens
        stats["docs_with_dup_spans"] = n_span_docs
    if repetition_thresholds:
        stats["after_repetition"] = n_rep
        stats["dropped_repetition"] = n_final - n_rep
    if lm_bits_threshold is not None:
        stats["after_lm_quality"] = n_lm
        stats["dropped_lm_quality"] = n_rep - n_lm
    if model_score_threshold is not None:
        stats["after_model_quality"] = n_model
        stats["dropped_model_quality"] = n_lm - n_model
    return curated, stats


def run_dataprep(args) -> dict:
    from .session import get_spark

    spark = get_spark("ddsparkle-dataprep")
    spark.sparkContext.setLogLevel("WARN")
    df = spark.read.parquet(args.source)
    lm = None
    if args.lm_bits_threshold is not None:
        # reference corpus for the LM: an explicit trusted corpus when
        # given, else self-trained on the source (filters its own outliers)
        from .ngram_lm import train_bigram_lm

        lm_src = (
            spark.read.parquet(args.lm_train_source)
            if args.lm_train_source
            else df
        )
        lm = train_bigram_lm(lm_src, text_col=args.text_col)
    curated, stats = curate(
        df,
        text_col=args.text_col,
        id_col=args.id_col,
        min_tokens=args.min_tokens,
        languages=args.languages.split(",") if args.languages else None,
        jaccard_threshold=args.jaccard_threshold,
        repetition_thresholds=(
            {"dup_5gram_frac": args.max_dup_5gram_frac}
            if args.max_dup_5gram_frac is not None
            else None
        ),
        lm_model=lm,
        lm_bits_threshold=args.lm_bits_threshold,
        model_score_threshold=args.model_score_threshold,
    )
    curated.write.mode("overwrite").parquet(args.output)
    stats["output_rows"] = spark.read.parquet(args.output).count()
    if args.stats:
        os.makedirs(os.path.dirname(args.stats) or ".", exist_ok=True)
        with open(args.stats, "w") as f:
            json.dump(stats, f, indent=2)
    print(json.dumps(stats))
    return stats


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="training-data curation pipeline")
    p.add_argument("--source", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--stats", default=None)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--languages", default=None, help="comma list, e.g. en,de")
    p.add_argument("--jaccard-threshold", type=float, default=0.7)
    p.add_argument(
        "--max-dup-5gram-frac", type=float, default=None,
        help="enable the Gopher repetition gate on the dup-5-gram fraction",
    )
    p.add_argument(
        "--model-score-threshold", type=float, default=None,
        help="enable the classifier-last hashed-n-gram model-quality stage",
    )
    p.add_argument(
        "--lm-bits-threshold", type=float, default=None,
        help="enable the bigram-LM quality gate (max integer-surprisal "
        "bits per transition)",
    )
    p.add_argument(
        "--lm-train-source", default=None,
        help="parquet reference corpus to train the LM on (default: the "
        "--source corpus itself)",
    )
    return p


if __name__ == "__main__":
    run_dataprep(_parser().parse_args())
