"""Determinism under repartitioning: every declared query must return the
SAME rows regardless of shuffle-partition count.

This is the distributed-correctness failure class the DuckDB oracle
differential can only catch by luck: an unsorted collect_list, a first()
without an ordering, a float sum whose grouping is partition-dependent, or
a row_number over a non-total order all produce results that depend on how
the data happens to be split. Running each query at 32 and again at 7
shuffle partitions (coprime, so group-to-partition assignments genuinely
differ) and comparing full sorted row sets pins partition-independence for
the whole surface.

Float cells are compared exactly — the declared queries route float
aggregates through decimal(38,6) casts or round() precisely so that
partition count cannot perturb them; a tolerance here would mask the very
bug class this test exists for.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _canon(rows):
    def key(t):
        return tuple((x is None, str(x)) for x in t)

    return sorted((tuple(r) for r in rows), key=key)


def test_results_independent_of_shuffle_partitions(spark):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    diffs = []
    for name, fn in qs.items():
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _canon(fn(spark, SF_DIR).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            b = _canon(fn(spark, SF_DIR).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        if a != b:
            first = next(
                (i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                min(len(a), len(b)),
            )
            diffs.append(
                f"{name}: {len(a)} vs {len(b)} rows; first divergence at "
                f"row {first}: {a[first] if first < len(a) else '<none>'} != "
                f"{b[first] if first < len(b) else '<none>'}"
            )
    assert not diffs, "partition-dependent results:\n" + "\n".join(diffs)
