#!/usr/bin/env python
"""Scale probe: measure how the dedup/similarity scale paths grow as the
corpus multiplies, holding per-document duplicate density constant.

Motivation: the driver testdata tops out at sf0.1 (5k documents). The
100 TB design claims in the dedup/ANN docstrings (banded candidates,
never all-pairs) are plan-shape arguments; this probe turns them into
MEASURED scaling curves by synthesizing m-fold corpora and timing the
declared query functions unmodified.

Corpus construction (deterministic, derived from the driver's sf0.1
tables — no hand-rolled distributions):

- documents x m: copy k in [0, m) offsets doc_id by k*10^7 and rewrites
  every token t -> "t_k" (suffixing). Within-copy Jaccard structure is
  EXACTLY preserved; cross-copy token vocabularies are disjoint, so true
  near-dup pairs grow linearly in m — the regime of a real corpus where
  a document's duplicate count does not grow with corpus size. (Naive
  replication without the rewrite would make every doc an exact dup of
  its m-1 copies: true pairs would grow quadratically and no algorithm
  could look linear.)
- embeddings x m: copy k offsets vec_id and circularly shifts the vector
  by k dims — norms and coordinate distributions preserved, cross-copy
  cosine decorrelated.

For each (query, m) the probe times the declared query function on a
fresh plan with the same session hygiene bench.py uses, and records
output rows (for the dedup queries, pairs found — linear growth here
confirms the candidate generator, not just the clock).

Usage:
  python scripts/scale_probe.py                     # default probe set
  python scripts/scale_probe.py --scales 1,2,4 --queries q45,q46
Writes JSON lines to stdout and the working dir /tmp/p1gl_scale/.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/p1gl_scale"

# (query name, scales to run). The exact-quadratic baseline q44 is probed
# only at small m — its growth is the point of contrast, not a surprise.
DEFAULT_PROBES = {
    "q44_ngram_jaccard_neardup": (1, 2),
    "q45_minhash_lsh_neardup": (1, 2, 4, 8),
    "q46_simhash_neardup": (1, 2, 4, 8),
    "q143_substring_containment": (1, 2, 4, 8),
    "q47_embedding_cosine_neardup": (1, 2, 4),
    "q74_knn_ivf": (1, 2, 4, 8),
    "q132_semantic_dedup_clustered": (1, 2, 4, 8),
}


def build_corpus(spark, m: int) -> str:
    """Materialize the m-fold corpus under WORK/x{m}; idempotent per run."""
    from pyspark.sql import functions as F

    out_dir = os.path.join(WORK, f"x{m}")
    marker = os.path.join(out_dir, "_BUILT")
    if os.path.exists(marker):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    parts = []
    for k in range(m):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 10_000_000))
        if k > 0:
            c = c.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", rf"$1_{k}")
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(c)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(max(4, 4 * m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    eparts = []
    for k in range(m):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 10_000_000))
        if k > 0:
            c = c.withColumn(
                "embedding",
                F.expr(
                    f"concat(slice(embedding, {k % 16} + 1, size(embedding) - {k % 16}),"
                    f" slice(embedding, 1, {k % 16}))"
                ),
            )
        eparts.append(c)
    ue = eparts[0]
    for p in eparts[1:]:
        ue = ue.unionByName(p)
    ue.repartition(max(4, 2 * m)).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )
    open(marker, "w").close()
    return out_dir


def release(spark) -> None:
    gc.collect()
    spark.catalog.clearCache()
    try:
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(False)
    except Exception:
        pass
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default=None, help="comma list, overrides per-query defaults")
    ap.add_argument("--queries", default=None, help="comma list of query names")
    args = ap.parse_args()

    probes = dict(DEFAULT_PROBES)
    if args.queries:
        keep = {q.strip() for q in args.queries.split(",")}
        probes = {
            k: v for k, v in probes.items() if k in keep or k.split("_")[0] in keep
        }
    if args.scales:
        scales = tuple(int(s) for s in args.scales.split(","))
        probes = {k: scales for k in probes}

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from project_1_greentech_logistics_data_pipeline_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("scale-probe")
    qs = em.queries()

    needed = sorted({m for sc in probes.values() for m in sc})
    dirs = {m: build_corpus(spark, m) for m in needed}

    results = []
    for name, sc in probes.items():
        fn = qs[name]
        for m in sc:
            release(spark)
            t0 = time.perf_counter()
            df = fn(spark, dirs[m])
            n = df.count()
            sec = round(time.perf_counter() - t0, 2)
            rec = {"query": name, "scale": m, "sec": sec, "rows": int(n)}
            results.append(rec)
            print(json.dumps(rec), flush=True)

    with open(os.path.join(WORK, "scale_probe_results.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
