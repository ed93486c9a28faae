"""Exact differential test for distributed BPE merge learning (q140):
the Spark merge table must equal a pure-Python reference BPE run on the
same (word, freq) vocabulary, including tie-breaks."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _ref_merge_word(s: list[str], a: str, b: str) -> list[str]:
    # greedy left-to-right with a pending carry — mirrors _merge_pair's fold
    out: list[str] = []
    pending: str | None = None
    for x in s:
        if pending == a and x == b:
            out.append(a + b)
            pending = None
        else:
            if pending is not None:
                out.append(pending)
            pending = x
    if pending is not None:
        out.append(pending)
    return out


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        # max count, ties broken lexicographically on (a, b)
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        syms = {w: _ref_merge_word(s, a, b) for w, s in syms.items()}
    return merges


def test_bpe_merge_table_matches_reference(spark):
    from project_1_greentech_logistics_data_pipeline_spark.operators.bpe import (
        learn_bpe_merges,
        word_vocabulary,
    )
    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        load_table,
    )

    docs = load_table(spark, SF, "documents")
    vocab = {r.word: r.freq for r in word_vocabulary(docs).collect()}
    got = learn_bpe_merges(docs, n_merges=8)
    want = _ref_bpe(vocab, 8)
    assert got == want


def test_q140_query_shape(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q140_bpe_learn_merges"](spark, SF)
    rows = df.collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.merged == r.left + r.right for r in rows)
    assert all(rows[i].pair_count > 0 for i in range(len(rows)))


def test_bpe_encode_matches_reference(spark):
    """Applying the learned merges in Spark gives the same per-word symbol
    sequences as the Python reference encode."""
    from project_1_greentech_logistics_data_pipeline_spark.operators.bpe import (
        apply_bpe_merges,
        learn_bpe_merges,
        word_vocabulary,
    )
    from project_1_greentech_logistics_data_pipeline_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    merges = learn_bpe_merges(docs, n_merges=8)
    words = word_vocabulary(docs).select("word")
    enc = words.withColumn(
        "enc",
        apply_bpe_merges(F.expr("filter(split(word, ''), x -> x <> '')"), merges),
    )
    for r in enc.collect():
        s = list(r.word)
        for a, b, _ in merges:
            s = _ref_merge_word(s, a, b)
        assert list(r.enc) == s, r.word


def test_q144_compression_bounds(spark):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q144_bpe_encode"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_symbols_after <= r.n_symbols_before
        assert 0 < r.compression <= 1


def test_merge_pair_fold_property(spark):
    """Property: the JVM aggregate()-fold merge equals the Python
    reference on adversarial symbol arrays — overlapping runs ('aaa'),
    pair-at-start/end, repeated pairs, and symbols absent entirely."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from project_1_greentech_logistics_data_pipeline_spark.operators.bpe import (
        _merge_pair,
    )
    from pyspark.sql import functions as F

    sym = st.sampled_from(["a", "b", "c", "ab"])
    arrays = st.lists(sym, min_size=0, max_size=12)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(arrays, min_size=1, max_size=8))
    def check(batch):
        df = spark.createDataFrame([(a,) for a in batch], "syms array<string>")
        got = [
            list(r.m)
            for r in df.select(
                _merge_pair(F.col("syms"), "a", "b").alias("m")
            ).collect()
        ]
        want = [_ref_merge_word(a, "a", "b") for a in batch]
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    check()
