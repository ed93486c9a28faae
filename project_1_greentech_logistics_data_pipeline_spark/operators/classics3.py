"""TPC-H gap shapes (round 2): Q6, Q12, Q15, Q20 equivalents.

Completes the classic-warehouse coverage begun in classics.py/classics2.py
with the four canonical shapes those modules did not yet declare:

- Q6  — single-table selective scan + global aggregate (pure
  pushdown/codegen showcase: no join, no group-by shuffle).
- Q12 — fact-fact join + conditional aggregation. The testdata has no
  l_shipmode/l_commitdate/l_receiptdate, so the grouping key is a derived
  ship-latency bucket (datediff(l_shipdate, o_orderdate)) — same shape:
  join, CASE-bucketed counts per group.
- Q15 — aggregate-then-argmax: per-supplier revenue view, top supplier(s)
  by a global MAX scalar (decorrelated as a 1-row broadcast, never a
  second fact scan).
- Q20 — nested correlated-aggregate join chain. No partsupp table (and a
  fixed share threshold is vacuous on this testdata), so the correlated
  predicate is the per-part argmax supplier share — identical plan shape:
  fact aggregates + correlated per-part aggregate threshold + join chain
  up to the dimensions, all from one lineitem shuffle.

All aggregates use the decimal(38,6) deterministic-sum convention
(functions/deterministic.py) so exact hash comparison vs DuckDB holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.deterministic import dsum
from ..session import tune
from ..sources.readers import load_table

QUERIES: dict = {}


def query(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q126: TPC-H Q6 — forecast revenue change (scan + filter + global agg).
# ---------------------------------------------------------------------------

_Q126_SQL = """
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q126_tpch_q6_forecast_revenue", _Q126_SQL)
def q126_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6. The whole query is one scan: every predicate reaches the
    parquet reader (min/max row-group skipping on l_shipdate at scale), the
    projection prunes to 4 columns, and the aggregate is a partial+final
    pair with no group key — a two-row exchange. The 100 TB cost is the IO
    the pushdown skips, nothing else."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q127: TPC-H Q12 shape — ship-latency buckets x order-priority counts.
# ---------------------------------------------------------------------------

_Q127_SQL = """
SELECT
  CASE
    WHEN DATEDIFF('day', o.o_orderdate, l.l_shipdate) < 0 THEN 'early'
    WHEN DATEDIFF('day', o.o_orderdate, l.l_shipdate) <= 90 THEN 'ontime'
    ELSE 'late'
  END AS ship_bucket,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
ORDER BY ship_bucket
"""


@query("q127_tpch_q12_ship_latency", _Q127_SQL)
def q127_tpch_q12_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + CASE-bucketed conditional counts. Both
    inputs are fact tables, but orders projects to 3 columns before the
    join; at sf the filtered side still broadcasts under AQE, and at 100 TB
    this is the one query here that earns a shuffle join on l_orderkey —
    which bucketing (sources/bucketing.py) amortizes across runs. The
    group-by has 3 groups: partial aggregation collapses it map-side."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(lag < 0, "early").when(lag <= 90, "ontime").otherwise("late")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bucket.alias("ship_bucket"), high.alias("is_high"))
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


# ---------------------------------------------------------------------------
# q128: TPC-H Q15 — top supplier by quarterly revenue.
# ---------------------------------------------------------------------------

_Q128_SQL = """
WITH revenue AS (
  SELECT
    l_suppkey AS supplier_no,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
      AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


@query("q128_tpch_q15_top_supplier", _Q128_SQL)
def q128_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15. The revenue view is one fact aggregate (|suppliers|
    rows); the global MAX is a 1-row aggregate of THAT view, broadcast
    into an equality filter — the decorrelated form that never rescans
    lineitem. Ties are kept, as the spec requires. Revenue equality is
    exact because both sides sum in decimal(38,6)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q129: TPC-H Q20 shape — dominant suppliers of red parts.
# ---------------------------------------------------------------------------

_Q129_SQL = """
WITH part_totals AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_partkey
),
supplier_part AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sup_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
dominant AS (
  SELECT sp.l_partkey, sp.l_suppkey, sp.sup_qty / pt.total_qty AS share
  FROM supplier_part sp
  JOIN part_totals pt ON sp.l_partkey = pt.l_partkey
  WHERE sp.sup_qty = (SELECT MAX(sup_qty) FROM supplier_part m
                      WHERE m.l_partkey = sp.l_partkey)
)
SELECT d.l_partkey AS p_partkey, s.s_suppkey, s.s_name, d.share
FROM dominant d
JOIN part p ON p.p_partkey = d.l_partkey
JOIN supplier s ON s.s_suppkey = d.l_suppkey
WHERE p.p_name LIKE '%red%'
ORDER BY p_partkey, s_suppkey
"""


@query("q129_tpch_q20_dominant_supplier", _Q129_SQL)
def q129_tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: correlated per-part aggregate threshold (argmax
    supplier share) -> join chain up to the dimensions. Decorrelated the
    scale-first way: the correlated subquery becomes WINDOW aggregates
    (per-part total and max) over the one (part, supplier) aggregate —
    lineitem is scanned and shuffled exactly once BY CONSTRUCTION, with
    no self-join (the join-back form plans two scans because each branch
    gets different pushed null-filters, defeating exchange reuse). The
    window sum goes through decimal so the share and the max-equality
    tie-keeping are bit-identical on both engines. Red-part filter and
    supplier lookup broadcast. (The original Q20 'availqty > 50% of
    shipped' predicate is vacuous on this testdata — no supplier reaches
    50% at any sf — so the threshold is the always-defined per-part
    argmax, the same correlated-aggregate shape.)"""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    sp = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("sup_qty"))
    )
    wp = Window.partitionBy("l_partkey")
    enriched = sp.select(
        "l_partkey",
        "l_suppkey",
        "sup_qty",
        F.sum(F.col("sup_qty").cast("decimal(38,6)")).over(wp).cast("double").alias("total_qty"),
        F.max("sup_qty").over(wp).alias("max_qty"),
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    return (
        enriched.filter(F.col("sup_qty") == F.col("max_qty"))
        .join(F.broadcast(red), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            (F.col("sup_qty") / F.col("total_qty")).alias("share"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


# ---------------------------------------------------------------------------
# q197: discount-quantity elasticity proxy per brand.
# ---------------------------------------------------------------------------

_Q197_SQL = """
WITH joined AS (
  SELECT p.p_brand, l.l_discount AS x, l.l_quantity AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
sums AS (
  SELECT p_brand,
         CAST(COUNT(*) AS DOUBLE) AS k,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y * y AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM joined GROUP BY p_brand
)
SELECT p_brand,
       CAST(k AS BIGINT) AS n_lines,
       (k * sxy - sx * sy)
         / (SQRT(k * sxx - sx * sx) * SQRT(k * syy - sy * sy)) AS discount_qty_corr
FROM sums
ORDER BY p_brand
"""


@query("q197_discount_elasticity", _Q197_SQL)
def q197_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do discounts move volume? Per-brand Pearson correlation of
    discount vs quantity — the elasticity screening that decides where a
    pricing team looks next. Broadcast part join, then one aggregate of
    decimal-exact component sums per brand (the q178/q188 discipline —
    builtin corr() is float-accumulation-ordered and not reproducible).
    Near-zero correlations on this synthetic data are themselves the
    honest answer: the generator draws discount and quantity
    independently."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand", F.col("l_discount").alias("x"), F.col("l_quantity").alias("y")
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    sums = joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.col("x") * F.col("y")).alias("sxy"),
        dec(F.col("x") * F.col("x")).alias("sxx"),
        dec(F.col("y") * F.col("y")).alias("syy"),
    )
    r = (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("k") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "p_brand",
        F.col("k").cast("bigint").alias("n_lines"),
        r.alias("discount_qty_corr"),
    ).orderBy("p_brand")


# ---------------------------------------------------------------------------
# q198: RFM segmentation (recency/frequency/monetary quintile codes).
# ---------------------------------------------------------------------------

_Q198_SQL = """
WITH cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey,
         NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM cust
)
SELECT r_score, f_score, m_score,
       CONCAT(r_score, f_score, m_score) AS rfm_code,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


@query("q198_rfm_segmentation", _Q198_SQL)
def q198_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quintile-score customers on recency, frequency,
    and monetary value, then count each of the up-to-125 segments — the
    workhorse marketing segmentation. One customer aggregate; the three
    NTILE windows are global but run over the |customers| relation, not
    facts; o_custkey tie-breaks make every quintile boundary
    deterministic (NTILE without a total order is not reproducible)."""
    o = _t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    scored = cust.select(
        F.ntile(5).over(Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            "r_score",
            "f_score",
            "m_score",
            F.concat("r_score", "f_score", "m_score").alias("rfm_code"),
            "n_customers",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# q201: shipping SLA compliance by order priority.
# ---------------------------------------------------------------------------

_Q201_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (DATEDIFF('day', o.o_orderdate, l.l_shipdate)
                             BETWEEN 0 AND 30) AS BIGINT) AS n_within_30d,
       CAST(COUNT(*) FILTER (DATEDIFF('day', o.o_orderdate, l.l_shipdate)
                             BETWEEN 0 AND 30) AS DOUBLE) / COUNT(*)
         AS sla_rate,
       CAST(MEDIAN(DATEDIFF('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE)
         AS median_lag_days
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@query("q201_shipping_sla", _Q201_SQL)
def q201_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLA scorecard: per priority class, the share of lineitems shipped
    within 30 days of order placement and the median lag — the
    operational metric a logistics pipeline publishes (and exactly what
    the reference's telemetry never aggregates). Orders project to two
    columns before the fact join; conditional counts and the exact
    median ride one aggregate; day-lags are integer date arithmetic."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("lag_days").between(0, 30), 1).otherwise(0)).alias(
                "n_within_30d"
            ),
            (
                F.sum(
                    F.when(F.col("lag_days").between(0, 30), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("sla_rate"),
            F.median("lag_days").alias("median_lag_days"),
        )
        .orderBy("o_orderpriority")
    )
