"""BPE training/encoding: greedy-merge law, deterministic tie-breaks,
training replay on encode, and the Spark word-count/encode paths
(see ddsparkle/spark/bpe.py)."""

import pytest

from ddsparkle.spark.bpe import _greedy_merge, apply_merges, bpe_encode, train_bpe

pytestmark = pytest.mark.spark


def test_greedy_merge_is_leftmost_nonoverlapping():
    assert _greedy_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert _greedy_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert _greedy_merge(list("aaaaa"), "a", "a") == ["aa", "aa", "a"]
    assert _greedy_merge(list("ababab"), "a", "b") == ["ab", "ab", "ab"]
    assert _greedy_merge(["x"], "a", "b") == ["x"]
    assert _greedy_merge([], "a", "b") == []
    # merged token does not cascade within the same pass
    assert _greedy_merge(list("aab"), "a", "a") == ["aa", "b"]


def _ref_train(word_freqs: dict, n_merges: int):
    """Independent brute-force reference: same algorithm written against a
    list-of-symbol-lists representation (no shared code with train_bpe's
    vocab dict walk)."""
    state = [(list(w), f) for w, f in sorted(word_freqs.items())]
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for toks, f in state:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(sorted(counts), key=lambda p: (-counts[p], p))
        merges.append((rank, best[0], best[1], counts[best]))
        state = [(_greedy_merge(t, best[0], best[1]), f) for t, f in state]
    return merges, {"".join(t): t for t, _ in state}


def test_train_matches_reference_and_encode_replays_training(spark):
    corpus = [
        ("low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3).strip(),
        "low low newest newest banana bananas",
        None,
        "  ",  # only empty fields
    ]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = train_bpe(df, n_merges=10, top_words=100)

    freqs = {}
    for t in corpus:
        if t:
            for w in t.split(" "):
                if w:
                    freqs[w] = freqs.get(w, 0) + 1
    want, final_state = _ref_train(freqs, 10)
    assert got == want

    # encoding a trained word reproduces its final training tokenization
    for w in freqs:
        assert apply_merges(list(w), got) == final_state[w]


def test_train_early_stop_when_no_pairs(spark):
    df = spark.createDataFrame([("a b c a",)], "text string")
    got = train_bpe(df, n_merges=50, top_words=10)
    assert got == []  # all words single chars -> no adjacent pairs ever


def test_tie_break_is_count_then_lexicographic(spark):
    # 'ab' and 'cd' both appear twice; (a,b) < (c,d) lexicographically
    df = spark.createDataFrame([("ab ab cd cd",)], "text string")
    got = train_bpe(df, n_merges=1, top_words=10)
    assert got == [(1, "a", "b", 2)]


def test_bpe_encode_counts_and_tokens(spark):
    df = spark.createDataFrame(
        [(1, "low lower"), (2, ""), (3, None)], "id long, text string"
    )
    merges = [(1, "l", "o", 7), (2, "lo", "w", 7)]
    out = {
        r["id"]: r
        for r in bpe_encode(df, merges, tokens_col="toks").collect()
    }
    assert out[1]["toks"] == ["low", "low", "e", "r"]
    assert out[1]["n_bpe_tokens"] == 4
    assert out[2]["n_bpe_tokens"] == 0 and out[2]["toks"] == []
    assert out[3]["n_bpe_tokens"] is None and out[3]["toks"] is None
