"""Distributed BPE tokenizer training — the consumer of the vocabulary
table (`textstats.token_frequencies` is its input relation).

The classic scaling trick (HuggingFace tokenizers, SentencePiece in BPE
mode): merges are learned from the WORD-FREQUENCY table, not the raw
corpus. One corpus pass collapses 100 TB of text into a
vocabulary-bounded (word, count) table; every merge round then operates
on that small table only. Spark shape:

* corpus → word counts: one explode + map-side-combined groupBy
  (identical shape to ``token_frequencies``);
* per merge round: ONE pair-count aggregate over the word table
  (overlapping adjacent pairs, counts weighted by word frequency) + a
  distributed argmax (``orderBy().limit(1)`` plans
  TakeOrderedAndProject) + a broadcast-free merge application expressed
  as a SQL fold over each word's symbol array;
* the loop state (word → symbol array) is lazily ``localCheckpoint``-ed
  per round, dup_clusters-style, so round plans stay flat and the
  checkpoint materializes inside the next round's aggregate job.

``apply_bpe`` (encoding a corpus with the learned merges) is the one
deliberate Pandas-UDF: BPE encoding is an inherently iterative per-word
loop over merge ranks — no built-in expresses it, and the merge table is
tiny (closure-broadcast), so an Arrow-batched UDF is the right tool per
the UDF policy (SURVEY.md §3).

Correctness: the trainer is pinned against a pure-Python reference BPE
(tests/test_dataops.py) and the first-round pair-count relation is
oracle-gated through DuckDB (driver query ``bpe_pair_counts``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def word_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, cnt) over lowercased whitespace tokens — the BPE training
    input relation. Vocabulary-sized output, map-side combined."""
    out = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def pair_counts(state: DataFrame) -> DataFrame:
    """(a, b, n) adjacent-symbol pair counts over a (cnt, syms) state
    frame, weighted by word count; overlapping pairs all count (the BPE
    convention: [x,x,x] contributes two (x,x) positions)."""
    return (
        state.select(
            "cnt",
            F.explode(
                F.expr(
                    "CASE WHEN size(syms) >= 2 THEN "
                    "transform(sequence(1, size(syms)-1),"
                    " i -> struct(syms[i-1] AS a, syms[i] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("n"))
    )


# SQL fold applying ONE merge (__a, __b) → __ab to a symbol array,
# left-to-right and non-overlapping ([x,x,x] with merge (x,x) → [xx, x]) —
# the exact classic BPE application order. The pending-symbol buffer makes
# the fold linear; the merge symbols are COLUMNS (__a/__b/__ab), never
# interpolated text, so arbitrary corpus symbols cannot break the expr.
_MERGE_FOLD = """
    aggregate(
      syms,
      named_struct('out', cast(array() as array<string>),
                   'buf', cast(null as string)),
      (acc, x) -> if(acc.buf is null,
                     named_struct('out', acc.out, 'buf', x),
                     if(acc.buf = __a and x = __b,
                        named_struct('out', concat(acc.out, array(__ab)),
                                     'buf', cast(null as string)),
                        named_struct('out', concat(acc.out, array(acc.buf)),
                                     'buf', x))),
      acc -> if(acc.buf is null, acc.out, concat(acc.out, array(acc.buf)))
    )
"""


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 32,
    min_pair_count: int = 2,
    min_word_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list [(a, b), ...]; ties in pair count break on
    (a, b) lexicographically, so training is deterministic and
    partitioning-independent.

    Cost shape: one corpus pass, then per round one aggregate job over
    the vocabulary-sized state (the driver argmax collects exactly ONE
    row per round). Each round's ``localCheckpoint`` materializes a new
    vocabulary-sized state; superseded rounds' blocks are released by
    Spark's ContextCleaner after the Python reference drops on
    reassignment and a JVM GC cycle runs — transient accumulation is
    bounded by GC cadence × state size (vocabulary rows), not the round
    count; a very long run (hundreds of merges) on a storage-tight
    cluster can force collection periodically if the executor storage
    tab shows superseded RDDs lingering."""
    state = (
        word_counts(df, text_col, min_word_count)
        .select("cnt", F.split("w", "").alias("syms"))
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            pair_counts(state)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        state = (
            state.withColumn("__a", F.lit(a))
            .withColumn("__b", F.lit(b))
            .withColumn("__ab", F.lit(a + b))
            .withColumn("syms", F.expr(_MERGE_FOLD))
            .drop("__a", "__b", "__ab")
            .localCheckpoint(eager=False)
        )
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Encode the corpus with a learned merge list: per whitespace word,
    repeatedly apply the best-ranked applicable merge (the standard BPE
    encode loop). Adds ``out`` (array<string>) and ``n_<out>`` (int).

    Pandas-UDF by design: the encode loop is iterative per word (merge
    rank lookup until fixpoint) — no built-in expresses it; the merge
    rank table is tiny and ships in the closure."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            ranked = [(ranks[p], i) for i, p in enumerate(pairs) if p in ranks]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    @pandas_udf("array<string>")
    def bpe_udf(texts: pd.Series) -> pd.Series:
        out_rows = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().strip().split():
                toks.extend(encode_word(w))
            out_rows.append(toks)
        return pd.Series(out_rows)

    d = df.withColumn(out, bpe_udf(F.col(text_col)))
    return d.withColumn(f"n_{out}", F.size(F.col(out)))
