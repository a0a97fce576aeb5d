"""Statistical n-gram LM quality scoring (perplexity-proxy filter).

The CCNet/KenLM-style curation stage the heuristic and classifier gates
don't cover: train a bigram language model on a reference corpus, score
every document by how surprised the model is (bits per transition — low =
fluent under the reference distribution, high = gibberish/boilerplate-
mismatch), and filter on the score. The classic scheme scores documents by
float log-probabilities, which can never hash-gate across engines (the
repo's rule: no cross-row float sums). This implementation quantizes each
transition's add-one-smoothed surprisal to INTEGER bits:

    pen(w1 -> w2) = bitlen(c1(w1) + V) - bitlen(c2(w1, w2) + 1)

where ``bitlen`` is the binary-magnitude (``int.bit_length`` ==
``length(bin(x))`` in Spark SQL and DuckDB), ``c1``/``c2`` are reference
unigram/bigram counts, and ``V`` is the reference unigram vocabulary size —
an integer floor of log2(1/P_addone) per transition, exact and identical in
every engine. A document's ``bits_total`` is an int64 sum (order-free), and
the single ``bits_total / n_transitions`` division happens only at the end,
so the driver gate hash-matches scores bit-for-bit.

Tokenization is the model scorer's proven portable contract
(``quality_model._grams_of``): single-space split, empty fields survive —
Spark ``split(text, ' ')`` == DuckDB ``string_split`` == Python
``str.split(' ')``. Grams are identified by the portable 60-bit md5 key;
both engines count BY KEY, so even a hash collision merges identically.

Scale shape:

- **train** — one Arrow-batched ``mapInPandas`` pass emits per-partition
  pre-aggregated (kind, key, count) partials (a hot gram is one partial per
  task — map-side combine by construction), one groupBy folds them, and the
  model keeps only the top-K unigrams/bigrams (ORDER BY count DESC, key —
  deterministic tie-break) via TakeOrdered: the LM state is K-bounded and
  BROADCASTABLE no matter the corpus size. Unseen grams score with count 0,
  exactly what add-one smoothing is for.
- **score** — the K-bounded count dicts ship once per executor
  (``SparkContext.broadcast``), and one ``mapInPandas`` pass walks each
  document's transitions row-locally: linear in corpus tokens, zero
  shuffle, zero joins (the same cost class as the md5 model scorer, with
  the same cross-batch gram->key memo).

The reference repo has no text/LM surface; this extends the curation
matrix per the brief (training-data pipeline stages).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

import pandas as pd

__all__ = ["NGramLM", "train_bigram_lm", "lm_quality_score"]

#: cross-batch gram -> 60-bit-key memo (speed-only; results identical on/off
#: — same contract as quality_model's bucket cache, pinned by tests)
_KEY_CACHE_MAX = 500_000
_key_cache: dict = {}


def _gram_key(g: str, cache: Optional[dict]) -> int:
    if cache is not None:
        v = cache.get(g)
        if v is None:
            v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            if len(cache) < _KEY_CACHE_MAX:
                cache[g] = v
        return v
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)


@dataclass
class NGramLM:
    """K-bounded bigram LM: unigram/bigram counts keyed by the portable
    60-bit md5 key, plus the reference vocabulary size V (distinct unigram
    keys BEFORE the top-K cap — the add-one denominator must not shrink
    when the cap drops tail grams)."""

    unigrams: dict  # key -> count (top_unigrams most frequent)
    bigrams: dict  # key -> count (top_bigrams most frequent)
    vocab_size: int

    def transition_bits(self, w1: str, w2: str, cache: Optional[dict] = None) -> int:
        c1 = self.unigrams.get(_gram_key(w1, cache), 0)
        c2 = self.bigrams.get(_gram_key(w1 + " " + w2, cache), 0)
        return (c1 + self.vocab_size).bit_length() - (c2 + 1).bit_length()

    def doc_bits(self, text: str, cache: Optional[dict] = None) -> tuple:
        """(n_transitions, bits_total) of one document."""
        toks = text.split(" ")
        n = len(toks) - 1
        if n <= 0:
            return 0, 0
        total = 0
        for i in range(n):
            total += self.transition_bits(toks[i], toks[i + 1], cache)
        return n, total


def train_bigram_lm(
    df,
    text_col: str = "text",
    top_unigrams: int = 50_000,
    top_bigrams: int = 200_000,
    flush_at: int = 2_000_000,
) -> NGramLM:
    """Fit the K-bounded bigram LM on a reference corpus (typically the
    train split — compose with ``dataops.assign_split``). NULL text rows
    are ignored. ``flush_at`` bounds each task's partial-dict memory
    LOSSLESSLY (flushed partials are extra shuffle rows the groupBy folds —
    pinned identical by test_train_flush_bound_is_lossless). See module
    docstring for the distributed shape."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if top_unigrams < 1 or top_bigrams < 1:
        raise ValueError("top_unigrams/top_bigrams must be positive")

    schema = T.StructType(
        [
            T.StructField("kind", T.ByteType()),
            T.StructField("k", T.LongType()),
            T.StructField("c", T.LongType()),
        ]
    )

    def emit(uni: dict, bi: dict) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "kind": [0] * len(uni) + [1] * len(bi),
                "k": list(uni.keys()) + list(bi.keys()),
                "c": list(uni.values()) + list(bi.values()),
            }
        ).astype({"kind": "int8", "k": "int64", "c": "int64"})

    def partials(batches):
        # flush_at is captured BY VALUE into the pickled closure (a module
        # global would re-resolve to the default on re-imported workers)
        # LOSSLESS memory bound: when the partial dicts outgrow the cap,
        # flush them as extra partial rows and reset — the downstream
        # groupBy folds duplicates, so a task whose distinct-gram universe
        # exceeds memory degrades to more shuffle rows, never an OOM
        uni: dict = {}
        bi: dict = {}
        cache = _key_cache
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    continue
                toks = text.split(" ")
                for w in toks:
                    k = _gram_key(w, cache)
                    uni[k] = uni.get(k, 0) + 1
                for i in range(len(toks) - 1):
                    k = _gram_key(toks[i] + " " + toks[i + 1], cache)
                    bi[k] = bi.get(k, 0) + 1
            if len(uni) + len(bi) > flush_at:
                yield emit(uni, bi)
                uni, bi = {}, {}
        yield emit(uni, bi)

    counts = (
        df.select(text_col)
        .mapInPandas(partials, schema=schema)
        .groupBy("kind", "k")
        .agg(F.sum("c").alias("c"))
    ).persist()
    try:
        uni_df = counts.filter(F.col("kind") == 0)
        vocab_size = uni_df.count()
        top_u = uni_df.orderBy(F.desc("c"), "k").limit(top_unigrams).collect()
        top_b = (
            counts.filter(F.col("kind") == 1)
            .orderBy(F.desc("c"), "k")
            .limit(top_bigrams)
            .collect()
        )
    finally:
        counts.unpersist()
    return NGramLM(
        unigrams={r["k"]: r["c"] for r in top_u},
        bigrams={r["k"]: r["c"] for r in top_b},
        vocab_size=vocab_size,
    )


def lm_quality_score(
    df,
    lm: NGramLM,
    text_col: str = "text",
):
    """Append [n_transitions long, bits_total long, bits_per_token double]
    to ``df`` — ALL input columns pass through (the model scorer's
    filter-shaped contract: gate on the score with no join). Documents
    with fewer than 2 tokens score (0, 0, NULL); NULL text likewise keeps
    its row with a NULL score (the NULL contract of
    quality_model.model_quality_score). The LM dicts ride one
    SparkContext.broadcast; per-row work is row-local Python over Arrow
    batches, linear in corpus tokens."""
    from pyspark.sql import types as T

    from .dataops import _ensure_parallelism

    if lm.vocab_size <= 0:
        raise ValueError("LM has an empty vocabulary (trained on no text?)")
    bc = df.sparkSession.sparkContext.broadcast(
        (lm.unigrams, lm.bigrams, lm.vocab_size)
    )
    schema = T.StructType(
        list(df.schema)
        + [
            T.StructField("n_transitions", T.LongType()),
            T.StructField("bits_total", T.LongType()),
            T.StructField("bits_per_token", T.DoubleType()),
        ]
    )

    def score(batches):
        model = NGramLM(*bc.value)
        cache = _key_cache
        for pdf in batches:
            ns, bits, bpt = [], [], []
            for text in pdf[text_col]:
                if text is None or (isinstance(text, float) and pd.isna(text)):
                    ns.append(0)
                    bits.append(0)
                    bpt.append(None)
                    continue
                n, total = model.doc_bits(text, cache)
                ns.append(n)
                bits.append(total)
                bpt.append(total / n if n > 0 else None)
            out = pdf.copy()
            out["n_transitions"] = pd.array(ns, dtype="int64")
            out["bits_total"] = pd.array(bits, dtype="int64")
            out["bits_per_token"] = pd.array(bpt, dtype="float64")
            yield out

    return _ensure_parallelism(df).mapInPandas(score, schema=schema)
