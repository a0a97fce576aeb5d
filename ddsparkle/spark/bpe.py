"""BPE tokenizer training and encoding on Spark.

The tokenizer-fitting stage of a training-data pipeline (Sennrich,
Haddow & Birch, "Neural Machine Translation of Rare Words with Subword
Units", ACL 2016): learn ``n_merges`` byte-pair merges from corpus word
frequencies, then encode text with the learned ranked merge table.

Scale shape (the part that must survive 100 TB):

- the corpus-scale work is ONE word-count groupBy (single-space split in
  the scan projection, explode row-local, map-side-combined partials — a
  billion-occurrence stopword is one partial per task);
- the word table is capped to ``top_words`` with the deterministic
  (count DESC, word ASC) tie-break — the same bounded-state contract as
  :mod:`.ngram_lm`'s top-K caps, making the training state driver-safe and
  the merge table BROADCASTABLE;
- the merge loop itself runs driver-side over the capped (word, freq)
  dict: BPE training is inherently sequential small-state (this is also
  how reference implementations train — on word counts, in memory), so
  distributing the ~K-row loop would only add per-round scheduling;
- encoding is one Arrow-batched ``mapInPandas`` pass with a per-batch
  distinct-word memo (Zipfian corpora amortize the merge walk over
  distinct words) — row-local, zero shuffle, linear in corpus bytes.

Determinism / cross-engine exactness: tokens are the repo's portable
single-space split (empty fields dropped explicitly on both engines);
pair counting is integer; the per-round argmax tie-breaks by
(count DESC, left ASC, right ASC) on code-point string order — so a SQL
engine replays the ENTIRE training: the ``doc_bpe_merges`` twin unrolls
every round (pair count -> argmax -> greedy merge application as a
parity-in-island window rule) and the learned merge table hash-matches
exactly. Greedy application (leftmost-first, non-overlapping: 'aaaa' +
(a,a) -> [aa, aa]) is the parity rule the twin mirrors.

Simplifications vs production BPE (documented contract, not drift risk):
no end-of-word marker (word-internal merges only) and character — not
byte — initial symbols; both choices keep the twin replayable and neither
changes the algorithm's structure.

No reference counterpart (sketches-java has no text pipeline); this is a
brief-driven pipeline stage like the LM/classifier quality gates.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd

__all__ = ["word_counts", "train_bpe", "apply_merges", "bpe_encode"]


def word_counts(df, text_col: str = "text", top_words: Optional[int] = None):
    """(word, freq) from a single-space split of ``text_col`` (empty
    fields dropped, NULL text ignored), optionally capped to the
    ``top_words`` most frequent with the (freq DESC, word ASC) tie-break.
    One scan, map-side-combined groupBy; the cap is a TakeOrdered over the
    already-aggregated table."""
    from pyspark.sql import functions as F

    wc = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    if top_words is not None:
        wc = wc.orderBy(F.desc("freq"), "word").limit(int(top_words))
    return wc


def _greedy_merge(tokens: list, left: str, right: str) -> list:
    """One leftmost-first non-overlapping pass merging (left, right) ->
    left+right — the canonical BPE apply ('aaaa' + (a,a) -> [aa, aa]);
    equals the twin's keep-odd-rank-within-island window rule."""
    out = []
    i, n = 0, len(tokens)
    while i < n:
        if i + 1 < n and tokens[i] == left and tokens[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def train_bpe(df, text_col: str = "text", n_merges: int = 16, top_words: int = 2000):
    """Learn ``n_merges`` BPE merges from the corpus. Returns a list of
    ``(rank, left, right, pair_count)`` tuples (rank 1-based, in learned
    order); stops early if no adjacent pair remains (the twin's empty-CTE
    cascade produces the identical shorter table). Pair counts include
    overlapping occurrences ('aaa' contributes (a,a) twice), the classic
    get_stats convention."""
    rows = word_counts(df, text_col, top_words).collect()
    vocab = {r["word"]: (list(r["word"]), int(r["freq"])) for r in rows}
    merges = []
    for rank in range(1, int(n_merges) + 1):
        counts: dict = {}
        for toks, freq in vocab.values():
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        best_c = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == best_c)
        merges.append((rank, left, right, best_c))
        for w, (toks, freq) in vocab.items():
            if len(toks) > 1:
                vocab[w] = (_greedy_merge(toks, left, right), freq)
    return merges


def apply_merges(tokens: list, merges: Sequence) -> list:
    """Encode one pre-split token list by applying each learned merge in
    rank order (greedy leftmost-first per rank) — the training replay, so
    a word seen in training encodes to exactly its final training state."""
    for m in merges:
        _, left, right = m[0], m[1], m[2]
        if len(tokens) < 2:
            break
        tokens = _greedy_merge(tokens, left, right)
    return tokens


def bpe_encode(
    df,
    merges: Sequence,
    text_col: str = "text",
    out_tokens_col: str = "n_bpe_tokens",
    tokens_col: Optional[str] = None,
):
    """Apply a learned merge table to the corpus: appends the BPE token
    COUNT (and, if ``tokens_col`` is set, the token array) per row. One
    Arrow-batched mapInPandas pass; each distinct word in a batch is
    encoded once through a cross-row memo (the md5-scorer memo pattern),
    then counts fold per row. NULL text yields NULL count."""
    from pyspark.sql import types as T

    ranked = [(m[1], m[2]) for m in sorted(merges, key=lambda m: m[0])]
    fields = list(df.schema) + [T.StructField(out_tokens_col, T.LongType())]
    if tokens_col is not None:
        fields.append(T.StructField(tokens_col, T.ArrayType(T.StringType())))
    schema = T.StructType(fields)
    cols = [f.name for f in schema]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def word_tokens(w: str) -> list:
            t = memo.get(w)
            if t is None:
                t = list(w)
                for left, right in ranked:
                    if len(t) < 2:
                        break
                    t = _greedy_merge(t, left, right)
                memo[w] = t
            return t

        for pdf in batches:
            if not len(pdf):
                continue
            n_out = np.zeros(len(pdf), object)
            toks_out = [None] * len(pdf)
            for i, txt in enumerate(pdf[text_col]):
                if txt is None or (isinstance(txt, float) and np.isnan(txt)):
                    n_out[i] = None
                    continue
                toks: list = []
                for w in txt.split(" "):
                    if w:
                        toks.extend(word_tokens(w))
                n_out[i] = len(toks)
                if tokens_col is not None:
                    toks_out[i] = toks
            res = pdf.copy()
            res[out_tokens_col] = n_out
            if tokens_col is not None:
                res[tokens_col] = toks_out
            yield res[cols]

    return df.mapInPandas(encode, schema=schema)
