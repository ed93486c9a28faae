#!/usr/bin/env python
"""Capture .explain("formatted") for a list of declared queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence files).

Usage: python scripts/capture_plans.py <tag> <suffix> q73_neardup_clusters ...
Plans are captured at sf0.001 (the PLAN_AUDIT census scale — see the r14
memory note: a census at the wrong sf shows phantom scale-factor drift).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    from project_1_greentech_logistics_data_pipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("plan-capture", master="local[4]")
    qs = entry_mod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
