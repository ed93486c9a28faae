"""Local mirror of the driver's DuckDB differential check.

Runs a declared Spark query and its oracle SQL on the same sf dir, then
compares row count, column names, and order-insensitive values (floats to a
tolerance when exact match fails — the declared queries aim for exact via
decimal-cast aggregates, so the tolerance path flags anything suspicious).
"""

from __future__ import annotations

import math
import struct
from pathlib import Path

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def spark_canon_type(dt) -> str:
    """Canonical physical-type string for a Spark DataType.

    Must agree with duckdb_canon_type for types the driver's serialized
    hash treats as equal; any divergence (int64 vs HUGEINT/DECIMAL, int vs
    float, float32 vs float64) is exactly the hash-drift class that bit
    q22 (r1) and q89/q127 (r2)."""
    from pyspark.sql import types as T

    # Integer widths are NOT distinguished: driver-green rows exist with
    # int32 on one side and int64 on the other (q82/q83/q88/q198 r2), so
    # the driver's serialized hash collapses integer widths. What it does
    # NOT collapse is int vs DECIMAL/HUGEINT vs float (q22 r1, q89/q127 r2).
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_canon_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_canon_type(dt.keyType)},{spark_canon_type(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{spark_canon_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def duckdb_canon_type(at) -> str:
    """Canonical physical-type string for a pyarrow DataType from DuckDB."""
    import pyarrow as pa

    if pa.types.is_integer(at):
        return "int"
    if pa.types.is_float64(at):
        return "float64"
    if pa.types.is_float32(at):
        return "float32"
    if pa.types.is_decimal(at):
        return f"decimal({at.precision},{at.scale})"
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return "string"
    if pa.types.is_boolean(at):
        return "bool"
    if pa.types.is_date(at):
        return "date"
    if pa.types.is_timestamp(at):
        return "timestamp"
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return f"list<{duckdb_canon_type(at.value_type)}>"
    if pa.types.is_map(at):
        return f"map<{duckdb_canon_type(at.key_type)},{duckdb_canon_type(at.item_type)}>"
    if pa.types.is_struct(at):
        inner = ",".join(
            f"{at.field(i).name}:{duckdb_canon_type(at.field(i).type)}"
            for i in range(at.num_fields)
        )
        return f"struct<{inner}>"
    return str(at)


def schema_type_mismatches(s_schema, sql: str, con) -> list:
    """Exact physical-type diff between a Spark schema and the DuckDB
    oracle's Arrow schema (column-name matched). Returns a list of
    (col, spark_type, duckdb_type) divergences."""
    arrow_schema = con.execute(
        f"SELECT * FROM ({sql}) AS __t LIMIT 0"
    ).arrow().schema
    d_types = {f.name: duckdb_canon_type(f.type) for f in arrow_schema}
    out = []
    for f in s_schema.fields:
        st = spark_canon_type(f.dataType)
        ot = d_types.get(f.name)
        if ot is not None and st != ot:
            out.append((f.name, st, ot))
    return out


def physical_type_mismatches(sdf, sql: str, con) -> list:
    """Back-compat wrapper over :func:`schema_type_mismatches`."""
    return schema_type_mismatches(sdf.schema, sql, con)


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Tag floats so int != float (the driver's serialized hash
        # distinguishes 44474 from 44474.0; Python == does not), and
        # compare the IEEE BYTES of the 1e-9-rounded value rather than the
        # value: the driver hashes serialized bytes, so -0.0 vs +0.0 is a
        # driver red even though Python == calls them equal (q122's
        # four-round driver-only red; round() preserves the zero's sign,
        # struct.pack exposes it).
        return ("f", struct.pack("<d", round(v, 9)))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


_NEG_ZERO = struct.pack("<d", -0.0)


def _negzero_cols(cols, rows) -> set:
    """Column names holding an IEEE -0.0 cell (recursing into lists).

    A -0.0 anywhere in an oracle-backed output is latent hash drift: the
    engines' ROUND implementations disagree on the sign of a
    rounded-to-zero negative (Spark BigDecimal +0.0, DuckDB float -0.0),
    so even when both sides agree TODAY, other data can split them. The
    source must normalize with functions.deterministic.pos_zero (+ 0.0)."""

    def hit(v):
        if isinstance(v, float):
            return struct.pack("<d", v) == _NEG_ZERO
        if isinstance(v, (list, tuple)):
            return any(hit(x) for x in v)
        return False

    return {cols[i] for r in rows for i, v in enumerate(r) if hit(v)}


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare(spark, sf_dir: str, fn, sql: str, name: str = "?", cached=None) -> None:
    """``cached`` (optional ``(columns, schema, rows)`` from the session
    SurfaceCache) replaces the Spark-side build+collect — the rows were
    produced by the same fn under the same default config; every
    assertion below is unchanged."""
    if cached is not None:
        s_cols, s_schema, s_rows = cached
    else:
        sdf = fn(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_schema = sdf.schema
        s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    type_diffs = schema_type_mismatches(s_schema, sql, con)
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert not type_diffs, (
        f"{name}: physical type drift (driver hash would differ even on "
        f"equal values): {type_diffs}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    nz = {
        side: cols
        for side, cols in (
            ("spark", _negzero_cols(s_cols, s_rows)),
            ("duckdb", _negzero_cols(d_cols, d_rows)),
        )
        if cols
    }
    assert not nz, (
        f"{name}: -0.0 cells (latent driver hash drift — normalize the "
        f"source with pos_zero / '+ 0.0'): {nz}"
    )
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(sn, dn)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sn[mismatches[0]]} duckdb={dn[mismatches[0]]}"
    )
