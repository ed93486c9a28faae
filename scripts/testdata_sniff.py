#!/usr/bin/env python
"""Start-of-round testdata sanity sniff (per-round ritual step 1).

The driver regenerates /root/testdata each round; physical encodings and
NULL shapes have drifted across rounds (events.ts shipped as both
TIMESTAMP(NANOS) and TIMESTAMP(MICROS); readers footer-sniff, see
sources/readers.py::_events_ts_unit). This script prints, per scale
factor:

- each table's row count and the PHYSICAL type of every timestamp column
  (from the parquet footer, not the logical schema),
- the oracle-precondition profile the query surface depends on:
  documents.doc_id uniqueness (q51's recursive-CTE oracle joins on it),
  NULL counts for documents.text/source (the twin-filter and '||'
  NULL-propagation contracts), embeddings.vec_id uniqueness,
- quick anomaly flags (empty tables, all-1970 timestamps = a reader
  bypassed the unit sniff).

Read-only; uses pyarrow + duckdb, no Spark session.

Usage: python scripts/testdata_sniff.py [sf0.001 sf0.01 sf0.1]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
ROOT = "/root/testdata"


def sniff(sf: str, ts_units: set[str]) -> list[str]:
    issues: list[str] = []
    d = os.path.join(ROOT, sf)
    con = duckdb.connect()
    print(f"== {d} ==")
    for t in TABLES:
        path = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(path):
            issues.append(f"{sf}/{t}: MISSING")
            continue
        f = pq.ParquetFile(path)
        n = f.metadata.num_rows
        ts_cols = []
        sch = f.schema_arrow
        for field in sch:
            ft = str(field.type)
            if ft.startswith("timestamp"):
                ts_cols.append(f"{field.name}:{ft}")
                # 'timestamp[us]' -> 'us'; feeds the OK line so the
                # start-of-round artifact records which footer encodings
                # this round's testdata shipped with (they have drifted
                # between ns and us across driver rounds)
                ts_units.add(ft.split("[", 1)[-1].rstrip("]").split(",")[0])
        print(f"  {t:<10} rows={n:<8} {' '.join(ts_cols)}")
        if n == 0:
            issues.append(f"{sf}/{t}: EMPTY")
    # Oracle preconditions — query the three relevant parquet files
    # directly (no views: duckdb binds views eagerly, so a single missing
    # TPC-H file would kill checks it has nothing to do with), and convert
    # any failure into an ISSUES entry instead of a traceback: unforeseen
    # drift (renamed column, corrupt footer) is exactly what must land in
    # the report.
    def q(table: str, sql: str):
        try:
            return con.execute(
                sql.format(src=f"read_parquet('{d}/{table}.parquet')")
            ).fetchone()
        except Exception as exc:
            issues.append(f"{sf}/{table}: precondition query failed — {exc}")
            return None

    docs = q(
        "documents",
        # COALESCE each SUM: on a 0-row table SUM is NULL and the profile
        # line would print 'non_ascii_text=None' instead of zeros (the
        # EMPTY issue fires separately)
        "SELECT COUNT(*), COUNT(DISTINCT doc_id), "
        "COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0), "
        "COALESCE(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END), 0), "
        "COALESCE(SUM(CASE WHEN TRIM(COALESCE(text,'x')) = '' THEN 1 ELSE 0 END), 0), "
        "COALESCE(SUM(CASE WHEN STRLEN(text) <> LENGTH(text) THEN 1 ELSE 0 END), 0) "
        "FROM {src}",
    )
    if docs:
        print(
            f"  documents: n={docs[0]} distinct_doc_id={docs[1]} "
            f"null_text={docs[2]} null_source={docs[3]} blank_text={docs[4]} "
            f"non_ascii_text={docs[5]}"
        )
        if docs[0] != docs[1]:
            issues.append(
                f"{sf}: documents.doc_id NOT unique ({docs[0]} rows, {docs[1]} ids) — "
                "q51's recursive-CTE oracle precondition broken (see "
                "test_q51_oracle_preconditions_hold_in_testdata)"
            )
        if docs[2] or docs[3]:
            print(
                "    note: NULL text/source present — twin-filter and '||' "
                "NULL-propagation contracts are exercised this round"
            )
        if docs[5]:
            issues.append(
                f"{sf}: {docs[5]} documents.text rows contain non-ASCII — "
                "Java (Spark) uses full/context-sensitive Unicode case "
                "mapping, DuckDB simple per-codepoint (ß→SS vs ẞ, final "
                "sigma, İ); every LOWER()-keyed oracle (fingerprints, q209 "
                "normalization, tokenize-lowercase) may diverge — see "
                "test_case_mapping_engines_diverge_on_non_ascii"
            )
    part = q(
        "part",
        "SELECT COALESCE(SUM(CASE WHEN STRLEN(p_name) <> LENGTH(p_name) "
        "THEN 1 ELSE 0 END) + SUM(CASE WHEN STRLEN(p_type) <> "
        "LENGTH(p_type) THEN 1 ELSE 0 END), 0) FROM {src}",
    )
    if part and part[0]:
        issues.append(
            f"{sf}: non-ASCII in part.p_name/p_type — q20's UPPER/LOWER "
            "outputs may diverge between engines (same class as above)"
        )
    emb = q("embeddings", "SELECT COUNT(*), COUNT(DISTINCT vec_id) FROM {src}")
    if emb and emb[0] != emb[1]:
        issues.append(f"{sf}: embeddings.vec_id NOT unique")
    ev = q("events", "SELECT MIN(ts), MAX(ts), COUNT(*) FROM {src}")
    if ev:
        print(f"  events: ts range {ev[0]} .. {ev[1]} n={ev[2]}")
        if ev[1] is not None and str(ev[1]).startswith("1970"):
            issues.append(
                f"{sf}: ALL events.ts in 1970 — a reader bypassed the unit "
                "sniff (readers.py::_events_ts_unit)"
            )
    return issues


def main() -> int:
    sfs = sys.argv[1:] or ["sf0.001", "sf0.01", "sf0.1"]
    all_issues: list[str] = []
    ts_units: set[str] = set()
    for sf in sfs:
        # one bad scale factor must not hide the others' reports
        try:
            all_issues += sniff(sf, ts_units)
        except Exception as exc:
            all_issues.append(f"{sf}: sniff aborted — {exc}")
    units = ",".join(sorted(ts_units)) or "none-seen"
    if all_issues:
        print(f"ISSUES: (ts footers: {units})")
        for i in all_issues:
            print(" -", i)
        return 1
    print(f"OK: no anomalies (ts footers: {units})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
