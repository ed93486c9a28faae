"""Distributed BPE merge learning (round 2): learn byte-pair-encoding
merges from the corpus with DataFrame ops only.

The tokenizer-training step of an LLM data pipeline: start from
characters, repeatedly count adjacent symbol pairs (weighted by word
frequency) and merge the most frequent pair. The per-iteration work is
Spark-shaped:

  - pair counting: explode adjacent symbol pairs over the (word, freq)
    vocabulary — map-side combinable groupBy, shuffle keyed by pair;
  - argmax: global top-1 via TakeOrderedAndProject (one row to the
    driver per merge — bounded, like IVF/k-means training state);
  - merge application: a left-to-right greedy fold over each word's
    symbol array (F.aggregate with a (out, pending) struct accumulator —
    correct for overlapping runs like 'aaa'), JVM-side, no Python row
    path; the vocabulary relation is localCheckpointed per round so the
    iterative lineage never grows.

At 100 TB the vocabulary aggregate (distinct words x freq) is the only
big shuffle and happens ONCE; every merge round then runs over the
|vocab|-row relation, which is orders of magnitude smaller than the
corpus — the same asymmetry real BPE trainers (GPT-2's, SentencePiece)
exploit. Rows-only query (iterative, not SQL-expressible);
tests/test_bpe.py checks the merge table exactly against a pure-Python
reference BPE on the same vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources.readers import load_table
from .text import tokens_expr

QUERIES: dict = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _adjacent_pairs(col: F.Column) -> F.Column:
    """array<struct<a,b>> of adjacent element pairs of a string array."""
    n = F.size(col)
    return F.zip_with(
        F.slice(col, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(col, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )


def _merge_pair(col: F.Column, a: str, b: str) -> F.Column:
    """Replace adjacent (a, b) with a||b, greedy left-to-right — the BPE
    application rule. A fold with a (out, pending) accumulator: 'pending'
    carries the previous unmerged symbol so runs like 'aaa' merge once,
    not twice."""
    merged = F.lit(a + b)
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pending"),
    )

    def step(acc, x):
        hit = (acc["pending"] == F.lit(a)) & (x == F.lit(b))
        flushed = F.when(
            acc["pending"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pending"])))
        return F.when(
            hit,
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("pending"),
            ),
        ).otherwise(
            F.struct(flushed.alias("out"), x.alias("pending"))
        )

    def finish(acc):
        return F.when(acc["pending"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pending"]))
        )

    return F.aggregate(col, init, step, finish)


def word_vocabulary(docs: DataFrame) -> DataFrame:
    """(word, freq) over the engine-wide tokenizer — the ONE corpus-sized
    aggregate; everything iterative happens on this small relation."""
    return (
        docs.select(F.explode(tokens_expr("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_bpe_merges(docs: DataFrame, n_merges: int = 10) -> list[tuple[str, str, int]]:
    """[(left, right, pair_count)] in merge order. Deterministic: ties on
    pair_count break lexicographically (a, b)."""
    vocab = word_vocabulary(docs)
    # lazy checkpoints: materialized by the next round's top-1 action, so
    # each merge round runs ONE job instead of two (measured 18.1 -> 12.5s
    # on q144 at sf0.1)
    syms = vocab.select(
        "freq", F.expr("filter(split(word, ''), x -> x <> '')").alias("syms")
    ).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] <= 0:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        syms = syms.withColumn("syms", _merge_pair(F.col("syms"), a, b)).localCheckpoint(eager=False)
    return merges


@query("q140_bpe_learn_merges", None)  # rows-only: iterative argmax loop
def q140_bpe_learn_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = 10
) -> DataFrame:
    """Learned BPE merge table: (rank, left, right, merged, pair_count).
    See module docstring for the scale argument."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=n_merges)
    rows = [
        (i + 1, a, b, a + b, n) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


def apply_bpe_merges(col: F.Column, merges: list[tuple[str, str, int]]) -> F.Column:
    """Encode a symbol array with a learned merge table: apply each merge
    in rank order (the BPE encode rule). Builds a chained JVM expression —
    merge depth is the table length, so keep tables O(10-100) per
    expression; longer tables would batch through intermediate columns."""
    out = col
    for a, b, _ in merges:
        out = _merge_pair(out, a, b)
    return out


@query("q144_bpe_encode", None)  # rows-only: depends on the learned table
def q144_bpe_encode(
    spark: SparkSession, sf_dir: str, n_merges: int = 8
) -> DataFrame:
    """Tokenize the corpus with the merges q140 learned: per document,
    symbol counts before/after and the compression ratio. The chained
    fold encode runs over the DISTINCT VOCABULARY (|V| rows), not the
    corpus' token occurrences — the encoded lengths then broadcast-join
    back onto the exploded tokens, so the expensive expression touches
    |V| rows and the corpus-sized pass is a broadcast lookup + integer
    sums (measured 18s -> 7s at sf0.1 vs encoding per-occurrence; the
    same vocab/corpus asymmetry the learn step exploits)."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=n_merges)
    chars = F.expr("filter(split(word, ''), x -> x <> '')")
    encoded_vocab = (
        word_vocabulary(docs)
        .select("word", chars.alias("chars"))
        .select(
            "word",
            F.size("chars").alias("w_before"),
            F.size(apply_bpe_merges(F.col("chars"), merges)).alias("w_after"),
        )
    )
    toks = docs.select("doc_id", F.explode(tokens_expr("text")).alias("word"))
    return (
        toks.join(F.broadcast(encoded_vocab), on="word")
        .groupBy("doc_id")
        .agg(
            F.sum("w_before").alias("n_symbols_before"),
            F.sum("w_after").alias("n_symbols_after"),
        )
        .withColumn(
            "compression",
            F.col("n_symbols_after").cast("double") / F.col("n_symbols_before"),
        )
        .orderBy("doc_id")
    )
