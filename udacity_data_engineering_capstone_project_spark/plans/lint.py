"""Plan linter: mechanical pre-flight checks for the plan shapes that
work at test scale and melt at 100 TB.

Every rule here encodes a failure mode this engine hit (or designed
around) during its own scale probes; the linter makes the checklist a
function instead of a review habit, so a pipeline can gate CI on
`assert_scalable(df)` before a 1000-executor run:

- ``cartesian-product``: a physical CartesianProduct multiplies
  partitions; at any real scale it is almost always a missing join
  condition.
- ``row-python-udf``: BatchEvalPython is a row-at-a-time Python UDF —
  the 10-100x-slower path that every Arrow-vectorized kernel in this
  repo exists to avoid (ArrowEvalPython / mapInPandas do not trigger
  this rule).
- ``global-window``: a window with an EMPTY partition spec moves every
  row to one task (Spark itself warns at runtime; the linter catches
  it before the job). Size-aware: over a dimension-sized input
  (optimizer estimate <= ``GLOBAL_WINDOW_MAX_BYTES``) this is the
  accepted contiguous-surrogate-key idiom and only warns; over a
  large or unknowable-external input it is an error.
- ``global-sort``: a global Sort not feeding a limit is a full-data
  range-shuffle + sort; top-k should be TakeOrderedAndProject and
  clustering should be a write-time sortWithinPartitions.
- ``exact-percentile``: F.percentile buffers every value of the column
  in one aggregation state — the wall `winsorize`/`numeric_drift`
  auto-gate around (use approx_percentile above memory scale).

The linter reads the ANALYZED logical plan (rules about intent) plus
the executed plan string (rules about physical strategy) — both
driver-side, no job runs. Findings are dicts with ``rule``,
``severity`` ("error" | "warning"), and ``detail``. `assert_scalable`
raises on errors and is the CI shape.

Honest scope: this is a linter, not a prover — it flags known-bad
patterns; a clean report does not certify a plan (skew, bucket-size
misconfiguration, and data-dependent blowups need the scale probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Above this optimizer estimate a partition-less window stops being
#: the small-dimension surrogate-key idiom and becomes a one-task wall.
GLOBAL_WINDOW_MAX_BYTES = 64 * 1024 * 1024


def _walk(node, parent=None):
    yield node, parent
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i), node)


def _simple_name(node) -> str:
    return node.getClass().getSimpleName().removesuffix("$")


def lint_plan(df: DataFrame) -> list[dict]:
    """Lint one DataFrame's plan; returns findings (possibly empty).

    Uses the analyzed (pre-optimization) logical plan for intent rules
    so findings survive optimizer rewrites of the surrounding plan,
    and the executed plan string for physical-strategy rules.
    """
    findings: list[dict] = []
    qe = df._jdf.queryExecution()
    logical = qe.analyzed()

    for node, parent in _walk(logical):
        name = _simple_name(node)
        if name == "Window":
            if node.partitionSpec().isEmpty():
                try:
                    est = node.child().stats().sizeInBytes()
                    est = est if isinstance(est, int) else int(est.toString())
                except Exception:
                    est = (1 << 63) - 1
                small = est <= GLOBAL_WINDOW_MAX_BYTES
                findings.append(
                    {
                        "rule": "global-window",
                        "severity": "warning" if small else "error",
                        "detail": (
                            "window with empty PARTITION BY moves every "
                            "row to one task; "
                            + (
                                "tolerable while the input stays "
                                "dimension-sized (estimated "
                                f"{est} B), but a latent wall"
                                if small
                                else "partition on a key or decompose "
                                "(see cap_tokens_per_group's prefix sum)"
                            )
                        ),
                    }
                )
        elif name == "Sort":
            is_global = getattr(node, "global")()
            parent_name = _simple_name(parent) if parent is not None else ""
            if is_global and parent_name not in (
                "GlobalLimit",
                "LocalLimit",
                "Limit",
            ):
                findings.append(
                    {
                        "rule": "global-sort",
                        "severity": "warning",
                        "detail": "global ORDER BY without a limit is a "
                        "full-data range shuffle + sort; use "
                        "TakeOrderedAndProject (orderBy+limit) or "
                        "sortWithinPartitions for write clustering",
                    }
                )
        elif name == "Aggregate":
            exprs = node.aggregateExpressions()
            for i in range(exprs.size()):
                sql = exprs.apply(i).sql()
                if "percentile(" in sql and "approx_percentile(" not in sql:
                    findings.append(
                        {
                            "rule": "exact-percentile",
                            "severity": "warning",
                            "detail": "exact percentile buffers every "
                            "value of the column in one aggregation "
                            f"state ({sql[:80]}); use approx_percentile "
                            "or a size gate above memory scale",
                        }
                    )

    plan_str = qe.executedPlan().toString()
    final = plan_str.split("== Initial Plan ==")[0]
    if "CartesianProduct" in final:
        findings.append(
            {
                "rule": "cartesian-product",
                "severity": "error",
                "detail": "CartesianProduct multiplies partition counts; "
                "add a join condition or broadcast the (verified-small) "
                "side",
            }
        )
    if "BatchEvalPython" in final:
        findings.append(
            {
                "rule": "row-python-udf",
                "severity": "warning",
                "detail": "row-at-a-time Python UDF (BatchEvalPython); "
                "use pandas_udf / mapInPandas (ArrowEvalPython) for "
                "10-100x throughput",
            }
        )
    return findings


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> list[dict]:
    """Raise ValueError if `lint_plan` finds any error-severity issue
    not named in ``allow``; returns the (possibly non-empty) warning
    list otherwise — the CI gate shape:

        warnings = assert_scalable(my_pipeline_output)
    """
    findings = lint_plan(df)
    errors = [
        f
        for f in findings
        if f["severity"] == "error" and f["rule"] not in allow
    ]
    if errors:
        raise ValueError(
            "plan fails scale lint: "
            + "; ".join(f"[{f['rule']}] {f['detail']}" for f in errors)
        )
    return [f for f in findings if f["severity"] != "error"]


def plan_summary(df: DataFrame) -> dict:
    """Mechanical inventory of a plan's physical cost drivers — the
    numbers a reviewer pulls from `.explain("formatted")` by eye,
    machine-readable so dashboards and regression tests can pin them:

    - ``exchanges``: shuffle count (each is a full network pass at
      100 TB) and ``reused_exchanges`` (runtime-shared subtrees that
      LOOK duplicated in the static plan — see BASELINE's
      static-scan-count lesson).
    - ``scans``: parquet/file scans with their pushed filters and read
      schemas — a scan whose ReadSchema lists every column for a
      2-column projection is a pruning failure.
    - ``wholestage_codegen_spans``: fused JVM pipelines (wider = more
      of the plan stays compiled).
    - ``python_evals``: Arrow-batched + row-at-a-time Python stages
      (the latter also carries a lint warning).
    - ``broadcast_joins`` / ``sortmerge_joins`` / ``bnl_joins``: join
      strategy mix.

    Driver-side only; no job runs. Counts come from the EXECUTED plan
    (post-AQE-initial), the same surface `lint_plan`'s physical rules
    read.
    """
    qe = df._jdf.queryExecution()
    plan_str = qe.executedPlan().toString()
    final = plan_str.split("== Initial Plan ==")[0]
    import re as _re

    pushed = _re.findall(r"PushedFilters: \[([^\]]*)\]", final)
    schemas = _re.findall(r"ReadSchema: ([^\n]+)", final)
    return {
        "exchanges": final.count("Exchange "),
        "reused_exchanges": final.count("ReusedExchange"),
        "scans": final.count("Scan "),
        "scan_pushed_filters": [p for p in pushed],
        "scan_read_schemas": [s.strip() for s in schemas],
        "wholestage_codegen_spans": len(
            set(_re.findall(r"WholeStageCodegen \((\d+)\)", final))
        ),
        "python_evals": {
            "arrow": final.count("ArrowEvalPython")
            + final.count("MapInPandas")
            + final.count("FlatMapGroupsInPandas"),
            "row": final.count("BatchEvalPython"),
        },
        "broadcast_joins": final.count("BroadcastHashJoin"),
        "sortmerge_joins": final.count("SortMergeJoin"),
        "bnl_joins": final.count("BroadcastNestedLoopJoin"),
    }
