"""Plan-inspection helpers: capture explain() output as a string so tests
can assert physical-plan properties (pushdown reached the scan, dimension
joins broadcast, top-k avoided a global sort, narrow pipelines stayed
shuffle-free) instead of trusting that they did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession.sparkContext._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def plan_has(df: DataFrame, *needles: str, mode: str = "formatted") -> dict[str, bool]:
    text = explain_str(df, mode)
    return {n: (n in text) for n in needles}


def strip_initial_plan_sections(plan: str) -> str:
    """Drop every '== Initial Plan ==' BLOCK from a simple-mode explain of
    an executed adaptive plan, keeping all Final Plan content.

    A naive split at the first marker is wrong for cache-bearing queries:
    an InMemoryTableScan prints its cached relation's own nested
    AdaptiveSparkPlan (with its own Final/Initial markers) INSIDE the outer
    final plan, so the first '== Initial Plan ==' can appear long before
    the outer tree ends and a split truncates later join branches. Blocks
    are delimited by tree indentation instead: a section's content is
    drawn AT the marker's indent and deeper ('+- == Initial Plan ==' at
    column 3, its first operator also at column 3), so a marker's block is
    every subsequent line at indent >= the marker's; the outer tree
    resumes strictly shallower (markers stack for nested cached plans).

    Belt-and-braces for marker ORDER: Spark 4.1.2 prints Final before
    Initial at every nesting level (asserted against a live explainString
    in tests/test_plans.py so a version change fails loudly), but a
    '== Final Plan ==' marker at indent <= an active Initial marker's
    indent ALSO terminates that skip here — if a future Spark reorders
    the sections or emits a same-indent Final sibling after an Initial
    block, its content is kept rather than silently dropped."""

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-"))

    out: list[str] = []
    skips: list[int] = []  # indents of active Initial-Plan markers
    for line in plan.splitlines():
        if not line.strip():
            continue
        ind = indent(line)
        while skips and ind < skips[-1]:
            skips.pop()
        if "== Final Plan ==" in line:
            while skips and skips[-1] >= ind:
                skips.pop()
            # a DEEPER Final marker inside a still-active Initial skip is
            # part of the skipped block (a cached plan nested in Initial
            # content) — drop it with its block (review-caught leak)
            if not skips:
                out.append(line)
            continue
        if "== Initial Plan ==" in line:
            skips.append(ind)
            continue
        if skips:
            continue
        out.append(line)
    return "\n".join(out)


def audit_query_plans(spark, sf_dir: str) -> list[dict]:
    """Physical-plan census over every declared query: exchanges (shuffles),
    join strategies, codegen presence, scan pushdown. The per-query scale
    story, measured from the plan rather than asserted in prose."""
    import __spark_entry__ as entrymod

    rows = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            # execute first: under AQE the pre-execution plan is
            # isFinalPlan=false and carries no codegen '*(n)' markers; only
            # the final adaptive plan shows what actually ran. Must be
            # collect() — df.write executes a COPY of the plan, leaving
            # df's own queryExecution unfinalized.
            df.collect()
            # simple mode prints each operator once (formatted repeats them
            # in the detail section, doubling counts); codegen spans only
            # appear as '*(n)' stage prefixes in simple mode.
            # Census the FINAL adaptive sections only: explainString on an
            # executed AQE plan prints '== Final Plan ==' AND '== Initial
            # Plan ==' (r1-r6 audits counted both, roughly doubling every
            # figure), and cache-bearing queries nest MORE marker pairs
            # inside each InMemoryTableScan — see
            # strip_initial_plan_sections. Cached subtrees that ran once at
            # materialization stay counted in every consuming query's row
            # (the census answers "what does executing this query's plan
            # contain", not "what did this query add"). A ReusedExchange
            # line references its original as ', Exchange hash...' — drop
            # those lines too: a reuse reads an existing shuffle's output,
            # it does not repartition again.
            plan = strip_initial_plan_sections(explain_str(df, mode="simple"))
            plan = "\n".join(
                l for l in plan.splitlines() if "ReusedExchange" not in l
            )
            formatted = explain_str(df)
        except Exception as exc:  # plan build itself failed — surface it
            rows.append({"query": name, "error": str(exc)[:120]})
            continue
        rows.append(
            {
                "query": name,
                # broadcast exchanges replicate a small side — not shuffles
                "exchanges": plan.count("Exchange") - plan.count("BroadcastExchange"),
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "bnlj": plan.count("BroadcastNestedLoopJoin"),
                "codegen": "*(" in plan,
                "pushed_filters": "PushedFilters: [" in formatted
                and not all(
                    seg.startswith("]")
                    for seg in formatted.split("PushedFilters: [")[1:]
                ),
                "python_udf": ("ArrowEvalPython" in plan)
                or ("MapInPandas" in plan)
                or ("FlatMapGroupsInPandas" in plan)
                or ("PythonUDTF" in plan),
                "top_k": "TakeOrderedAndProject" in plan,
            }
        )
    return rows


def audit_markdown(spark, sf_dir: str) -> str:
    rows = audit_query_plans(spark, sf_dir)
    out = [
        "# PLAN_AUDIT — physical-plan census of every declared query",
        "",
        f"Generated from explain() at `{sf_dir}`. Columns:",
        "exchanges = SHUFFLE boundaries (broadcast exchanges excluded — they",
        "replicate a small side, not repartition the data); bhj/smj/bnlj =",
        "join strategies chosen; codegen = whole-stage codegen present;",
        "pushed = filters reached the scan; pyudf = Arrow/Pandas stage",
        "present (the deliberate escape hatches); topk =",
        "TakeOrderedAndProject.",
        "",
        "| query | exchanges | bhj | smj | bnlj | codegen | pushed | pyudf | topk |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            out.append(f"| {r['query']} | ERROR: {r['error']} | | | | | | | |")
            continue
        out.append(
            "| {query} | {exchanges} | {bhj} | {smj} | {bnlj} | {codegen} | "
            "{pushed_filters} | {python_udf} | {top_k} |".format(**{
                k: ("y" if v is True else "" if v is False else v)
                for k, v in r.items()
            })
        )
    return "\n".join(out) + "\n"
