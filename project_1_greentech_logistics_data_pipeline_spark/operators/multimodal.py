"""Multimodal columns (SURVEY §2.10): image/audio/video as opaque binary +
typed metadata, with Pandas-UDF feature extraction over mapInPandas.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, or NotImplementedError when strict) — but the
Spark-side plumbing is real and tested: schema (binary + mime + map metadata),
Arrow batch shape through mapInPandas, partition-preserving narrow execution,
and the metadata path (byte length, content hash, mime grouping) runs
entirely JVM-side with an exact DuckDB oracle.

At 100 TB: binary payloads ride in parquet with the metadata columns;
decode/feature-extract is mapInPandas (Arrow batches, no per-row pickling);
filters on mime/meta prune at the scan before any Python runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune
from ..sources.readers import load_table

QUERIES: dict = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from documents: text bytes stand in for the
    opaque payload (no codecs in this environment); mime derives from source.
    The column shape is the real contract: content binary, mime string,
    meta map<string,string>."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.struct(
            F.col("text").cast("binary").alias("content"),
            F.concat(F.lit("image/fake-"), F.col("source")).alias("mime"),
            F.create_map(
                F.lit("lang"), F.col("lang"),
                F.lit("source"), F.col("source"),
                F.lit("n_chars"), F.col("n_chars").cast("string"),
            ).alias("meta"),
        ).alias("media"),
    )


_Q50_SQL = """
SELECT
  CONCAT('image/fake-', source) AS mime,
  COUNT(*) AS n_assets,
  CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
  MIN(SHA256(text)) AS min_sha256
FROM documents
GROUP BY 1
"""


@query("q50_multimodal_meta", _Q50_SQL)
def q50_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata path over the media column: size, hash, mime rollup — all
    JVM-side on the binary payload, no decode needed."""
    tune(spark)
    m = media_table(spark, sf_dir)
    return (
        m.select(
            F.col("media.mime").alias("mime"),
            F.octet_length(F.col("media.content")).alias("nbytes"),
            F.lower(F.sha2(F.col("media.content"), 256)).alias("sha"),
        )
        .groupBy("mime")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
            F.min("sha").alias("min_sha256"),
        )
    )


# --- stubbed decode / feature extraction ------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("nbytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 8


def decode_media(content: bytes, mime: str) -> dict:
    """REAL decoder entry point — requires image/audio codecs that are not
    installed in this environment."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg) not present in "
        "this environment; use fake_decode for deterministic plumbing tests"
    )


def fake_decode(content: bytes, mime: str) -> dict:
    """Deterministic stand-in for decode: 'dimensions' and a feature vector
    derived from the bytes, so the distributed plumbing is fully testable."""
    n = len(content)
    acc = 2166136261
    for byte in content[:256]:  # FNV-1a over a bounded prefix
        acc = ((acc ^ byte) * 16777619) % (1 << 32)
    feature = []
    h = acc
    for _ in range(FEATURE_DIM):
        h = (h * 1103515245 + 12345) % (1 << 31)
        feature.append((h / float(1 << 31)) * 2.0 - 1.0)
    return {
        "width": (acc % 1920) + 1,
        "height": ((acc >> 8) % 1080) + 1,
        "feature": feature,
    }


def extract_features(media_df: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    strict=True routes through the real (NotImplementedError) decoder."""
    decoder = decode_media if strict else fake_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "mime": [], "nbytes": [],
                "width": [], "height": [], "feature": [],
            }
            for media_id, media in zip(pdf["media_id"], pdf["media"]):
                content = media["content"]
                mime = media["mime"]
                d = decoder(bytes(content), mime)
                out["media_id"].append(media_id)
                out["mime"].append(mime)
                out["nbytes"].append(len(content))
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return media_df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


@query("q51_media_features", None)  # Pandas-UDF fake decode -> rows-only
def q51_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode->feature-extract over media assets (stubbed decode, real
    plumbing), then a JVM-side rollup of the extracted features."""
    tune(spark)
    feats = extract_features(media_table(spark, sf_dir))
    return (
        feats.groupBy("mime")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
            F.round(F.avg("width"), 2).alias("avg_width"),
            F.round(F.avg("height"), 2).alias("avg_height"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped-map Pandas UDF (applyInPandas) with an EXACT SQL oracle
# ---------------------------------------------------------------------------


@query(
    "q75_grouped_zscore_pandas",
    """
SELECT event_id, user_id,
  CAST(ROUND(
    (value - AVG(value) OVER w) / (STDDEV_SAMP(value) OVER w), 4)
  AS DOUBLE) AS zscore
FROM events
WINDOW w AS (PARTITION BY user_id)
QUALIFY COUNT(*) OVER w > 1
""",
)
def q75_grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score via applyInPandas — the grouped-map UDAF surface
    (SURVEY §2.9), deliberately in pandas to pin down the escape hatch's
    contract: one shuffle on the group key, each group an Arrow batch, numpy
    math inside. (The same metric is expressible as a JVM window — that
    equivalence IS the oracle, so this Pandas-UDF path is exactly checked,
    not rows-only.) Scale caveat encoded here: a group must fit in one
    executor's memory — keys are users, not a global key.

    pandas' default std ddof=1 == STDDEV_SAMP; single-event users divide by
    NULL stddev in SQL and are dropped on both sides (QUALIFY n>1); rounding
    to 4dp absorbs summation-order jitter between numpy and DuckDB."""
    import pandas as pd

    from pyspark.sql import types as T

    tune(spark)
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["event_id", "user_id"]].assign(zscore=0.0)
        z = (pdf["value"] - pdf["value"].mean()) / pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z.round(4)}
        )

    return e.groupBy("user_id").applyInPandas(_z, schema=schema)
