"""Central query registry: name -> (spark_fn, oracle_sql | None).

Assembles the per-module QUERIES dicts into the driver contract surface
(__spark_entry__.py::queries/oracle_sql). Import order is the display order
in CORRECTNESS reports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _collect() -> dict[str, tuple[Callable, str | None]]:
    out: dict[str, tuple[Callable, str | None]] = {}
    from .operators import relational

    modules = [relational]
    for modname in ("scalar", "temporal", "classics", "classics2", "subqueries", "dedup", "similarity", "text", "multimodal", "pipeline_queries"):
        try:
            mod = __import__(f"{__package__}.operators.{modname}", fromlist=[modname])
            modules.append(mod)
        except ImportError:
            continue
    for mod in modules:
        for name, pair in getattr(mod, "QUERIES", {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in _collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in _collect().items() if sql is not None}
