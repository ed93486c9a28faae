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
