"""Deterministic synthetic multi-turn transcript tables (FIXTURES.md section 1).

Schema per BASELINE.json ``input_hint``:
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp

Generation is distributed: conversations are sharded over Spark tasks with
``spark.range(n_convs).mapInPandas``, and every conversation's content is a
pure function of ``(seed, conv_index)`` — so any partitioning, any cluster
size, and any re-run produce byte-identical rows (the "per-turn text equality
under stable turn ordering" invariant is testable against a local pandas
re-generation).

Skew profiles (FIXTURES.md section 1.2):
- ``tiny``    : ~1k convs, turns/conv ~ geometric(mean 10)
- ``skewed``  : one hot conv_id holding ~20% of all turns
- ``bench``   : 0.1% of convs hold ~30% of turns

Planted near-duplicates: every conversation whose index ``% NEAR_DUP_STRIDE
== NEAR_DUP_RESIDUE`` gets an overlay twin (``conv_id`` suffixed ``d``, one
day later) whose every ``NEAR_DUP_PERTURB_EVERY``-th turn has its length —
hence text and content digest — perturbed by one character. Twins of short
conversations (no perturbable turn) are EXACT duplicates. The overlay is a
pure function of the base conversation's (seed, index, n_turns), so both
generation paths stay byte-identical under any partitioning; it gives the
conversation-dedup operators real planted positives (exact and fuzzy)
instead of relying on coincidental length collisions.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

__all__ = ["transcripts_df", "generate_conversations_pandas", "PROFILES"]

_BASE_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (microseconds)
_ROLES = np.array(["user", "assistant", "system", "tool"])
_TOOLS = np.array(["search", "code", "browser", "calculator"])

PROFILES = {
    # name: (mean_turns_per_conv, hot_share, hot_conv_fraction)
    "tiny": (10.0, 0.0, 0.0),
    "skewed": (10.0, 0.20, None),  # None -> single hot conversation
    "bench": (10.0, 0.30, 0.001),
}

NEAR_DUP_STRIDE = 200
NEAR_DUP_RESIDUE = 7
NEAR_DUP_PERTURB_EVERY = 5


def _turn_counts(rng: np.random.Generator, n_convs: int, mean_turns: float) -> np.ndarray:
    # geometric with the given mean, at least 1 turn
    p = 1.0 / mean_turns
    return rng.geometric(p, n_convs).astype(np.int64)


def _conv_arrays(seed: int, conv_index: int, n_turns: int) -> dict:
    """All rows of one conversation as arrays — pure function of
    (seed, conv_index), so any batching/partitioning yields identical rows."""
    rng = np.random.default_rng((seed << 20) ^ conv_index)
    turn_idx = np.arange(n_turns, dtype=np.int32)
    # roles: user/assistant alternating; idx 0 occasionally system; ~8% tool
    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    if n_turns > 0 and rng.random() < 0.2:
        roles[0] = "system"
    tool_mask = rng.random(n_turns) < 0.08
    roles[tool_mask] = "tool"
    tools = np.full(n_turns, None, dtype=object)
    tools[tool_mask] = rng.choice(_TOOLS, tool_mask.sum())
    # text lengths ~ lognormal(5.5, 1.2) clipped to [1, 1e5]; text is a
    # repeated-token string of exactly that length
    lengths = np.clip(rng.lognormal(5.5, 1.2, n_turns), 1, 100_000).astype(np.int64)
    # timestamps: base + conversation offset + cumulative gaps in [50ms, 600s]
    gaps_s = np.clip(rng.pareto(1.5, n_turns) * 0.5 + 0.05, 0.05, 600.0)
    start_us = _BASE_EPOCH_US + (conv_index % 86_400) * 1_000_000
    ts_us = start_us + np.cumsum((gaps_s * 1e6).astype(np.int64))
    return {
        "conv_id": f"conv{conv_index:010d}",
        "turn_idx": turn_idx,
        "role": roles,
        "tool": tools,
        "lengths": lengths,
        "ts_us": ts_us,
    }


def _overlay_conv(seed: int, conv_index: int, n_turns: int) -> dict:
    """Near-duplicate twin of conversation ``conv_index``: same turns, one
    day later, with every ``NEAR_DUP_PERTURB_EVERY``-th turn's length (hence
    text content and md5 digest) off by one character. Pure function of the
    base conversation's inputs — no extra rng draws, so adding/removing the
    overlay can never shift any other conversation's content."""
    base = _conv_arrays(seed, conv_index, n_turns)
    out = {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in base.items()}
    out["conv_id"] = f"conv{conv_index:010d}d"
    mask = (out["turn_idx"] % NEAR_DUP_PERTURB_EVERY) == NEAR_DUP_PERTURB_EVERY - 1
    ln = out["lengths"]
    ln[mask] = np.where(ln[mask] < 100_000, ln[mask] + 1, ln[mask] - 1)
    out["ts_us"] = out["ts_us"] + 86_400_000_000
    return out


def _convs_for_index(seed: int, conv_index: int, n_turns: int) -> list[dict]:
    """Base conversation plus (for the planted-dup residue class) its
    overlay twin — the single shared expansion point for the distributed and
    local generation paths."""
    convs = [_conv_arrays(seed, conv_index, n_turns)]
    if n_turns > 0 and conv_index % NEAR_DUP_STRIDE == NEAR_DUP_RESIDUE:
        convs.append(_overlay_conv(seed, conv_index, n_turns))
    return convs


def _assemble_frame(convs: list[dict]) -> pd.DataFrame:
    """Concatenate per-conversation arrays into one DataFrame (one pandas
    allocation per batch instead of per conversation)."""
    n_each = [len(c["turn_idx"]) for c in convs]
    conv_ids = np.repeat(np.array([c["conv_id"] for c in convs], object), n_each)
    lengths = np.concatenate([c["lengths"] for c in convs]) if convs else np.empty(0, np.int64)
    texts = [("tok " * ((ln + 3) // 4))[:ln] for ln in lengths.tolist()]
    return pd.DataFrame(
        {
            "conv_id": pd.array(conv_ids, dtype="string"),
            "turn_idx": np.concatenate([c["turn_idx"] for c in convs]),
            "role": pd.array(np.concatenate([c["role"] for c in convs]), dtype="string"),
            "text": pd.array(texts, dtype="string"),
            "tool": pd.array(np.concatenate([c["tool"] for c in convs]), dtype="string"),
            "ts": pd.to_datetime(np.concatenate([c["ts_us"] for c in convs]), unit="us"),
        }
    )


def _conv_frame(seed: int, conv_index: int, n_turns: int) -> pd.DataFrame:
    return _assemble_frame([_conv_arrays(seed, conv_index, n_turns)])


def _profile_turn_counts(seed: int, n_convs: int, profile: str, target_turns: int | None):
    mean_turns, hot_share, hot_frac = PROFILES[profile]
    rng = np.random.default_rng(seed)
    counts = _turn_counts(rng, n_convs, mean_turns)
    if hot_share > 0:
        base_total = int(counts.sum())
        extra = int(base_total * hot_share / (1 - hot_share))
        if hot_frac is None:
            counts[0] += extra  # one hot conversation
        else:
            n_hot = max(1, int(n_convs * hot_frac))
            counts[:n_hot] += extra // n_hot
    if target_turns is not None:
        # deterministic proportional rescale to ~target_turns total
        scale = target_turns / max(int(counts.sum()), 1)
        counts = np.maximum(1, (counts * scale).astype(np.int64))
    return counts


def generate_conversations_pandas(
    seed: int, conv_indexes: np.ndarray, turn_counts: np.ndarray
) -> pd.DataFrame:
    """Local (driver/test) generation of a set of conversations."""
    convs = [
        c
        for ci, tc in zip(conv_indexes, turn_counts)
        for c in _convs_for_index(seed, int(ci), int(tc))
    ]
    if not convs:
        return _assemble_frame([_conv_arrays(seed, 0, 0)])
    return _assemble_frame(convs)


def transcripts_df(
    spark,
    n_convs: int = 1000,
    profile: str = "tiny",
    seed: int = 42,
    target_turns: int | None = None,
    partitions: int | None = None,
):
    """Distributed deterministic transcript DataFrame.

    Turn counts for all conversations are computed on the driver (an int64
    array, ~8 B/conv — fine up to 10^8 convs; beyond that, derive counts
    inside tasks from the rng instead) and broadcast; each task generates its
    conversations independently.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    counts = _profile_turn_counts(seed, n_convs, profile, target_turns)
    bc = spark.sparkContext.broadcast(counts)
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )

    # Deterministic permutation id -> conv_index so that hot conversations
    # (profile skew puts them at low indexes) spread evenly across generator
    # partitions/files instead of packing one straggler file. The table's
    # key-level skew is preserved; only file-level balance changes — matching
    # real ingests, where a conversation's turns don't all land in one file.
    a = 2654435761 % n_convs  # Knuth multiplicative constant
    while math.gcd(a, n_convs) != 1:
        a += 1

    def gen(batches):
        all_counts = bc.value
        # assemble ~64k-turn frames: one pandas/Arrow allocation per chunk,
        # while each conversation's rows stay a pure function of its index
        for pdf in batches:
            convs: list[dict] = []
            acc = 0
            for i in pdf["id"].to_numpy():
                ci = (int(i) * a + 12345) % n_convs
                for c in _convs_for_index(seed, ci, int(all_counts[ci])):
                    convs.append(c)
                    acc += len(c["turn_idx"])
                if acc >= 65536:
                    yield _assemble_frame(convs)
                    convs, acc = [], 0
            if convs:
                yield _assemble_frame(convs)

    n_parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_convs, numPartitions=n_parts)
    return base.mapInPandas(gen, schema=schema)
