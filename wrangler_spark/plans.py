"""Plan auditing — the scale review a 100 TB operator runs BEFORE the
cluster does.

``audit(df)`` inspects a DataFrame's formatted physical plan and
returns the scale-relevant features (exchanges, join strategies,
windows, Python evaluation, scan pushdown) plus the warnings the
repo's own plan disciplines encode (tools/explain_check.py gates the
shipped queries with the same rules; this module is the USER-facing
form for recipes and ad-hoc frames). It reads the plan text Spark
prints — no private APIs — so it works on any DataFrame, lazy, without
executing it.

The disciplines, as warnings:

- **Python in the hot path** (BatchEvalPython / ArrowEvalPython):
  row-at-a-time Python is ~10-100x slower than JVM expressions; Arrow
  batches are acceptable only where semantics need Python.
- **Cartesian product**: almost always an un-keyed join bug; the one
  sanctioned shape is crossJoin(broadcast(<1-row stats frame>)), which
  compiles to BroadcastNestedLoopJoin, not CartesianProduct.
- **Global window**: a window function whose partition spec is empty
  funnels the whole input through ONE task — the classic scale-killer
  (every top-k/prefix-sum in this repo is a two-phase aggregate or a
  partitioned scan instead).
- **Unpushed filters**: a parquet scan whose PushedFilters is empty
  while the query filters above it reads data it will throw away.

Counting exchanges/joins is informational — shuffles are not wrong,
they are the thing to budget."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame) -> str:
    """The formatted physical plan, as a string (lazy — nothing runs)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanReport:
    features: dict = field(default_factory=dict)
    warnings: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.warnings

    def render(self) -> str:
        lines = [
            "plan audit: " + ("OK" if self.ok else f"{len(self.warnings)} warning(s)")
        ]
        for k in sorted(self.features):
            lines.append(f"  {k}: {self.features[k]}")
        for w in self.warnings:
            lines.append(f"  ! {w}")
        return "\n".join(lines)


def _top_level_lists(s: str) -> list[str]:
    """The top-level ``[...]`` lists of an argument string."""
    lists, depth, start = [], 0, None
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                lists.append(s[start : i + 1])
    return lists


def _global_windows(plan: str) -> int:
    """Window operators with NO partition spec, in EITHER plan dialect.
    A partitioned Window renders THREE top-level lists — [functions],
    [partition-exprs], [sort-order] — a global one renders two (the
    partition list is omitted entirely, measured on Spark 4.x), and
    either shape can also surface an explicitly empty ``[]``. The
    formatted dialect (.explain('formatted')) puts the lists on an
    ``Arguments:`` line inside the operator's block; the tree dialect
    (StreamingQuery.explain / plain .explain()) puts them inline on the
    ``Window [...]`` node line."""
    n = 0
    # formatted dialect: per-operator blocks
    for block in plan.split("\n\n"):
        if not re.search(r"^\(\d+\) Window\b", block, re.M):
            continue
        m = re.search(r"^Arguments: (.*)$", block, re.M)
        if not m:
            continue
        lists = _top_level_lists(m.group(1))
        if len(lists) < 3 or lists[1].strip() == "[]":
            n += 1
    # tree dialect: inline node lines like "+- Window [fns], [part], [ord]"
    for line in plan.splitlines():
        m = re.search(r"(?:^|[\s\-+*(\d)])Window (\[.*)$", line)
        if m and not line.lstrip().startswith("("):
            lists = _top_level_lists(m.group(1))
            if len(lists) < 3 or lists[1].strip() == "[]":
                n += 1
    return n


def _audit_plan(plan: str, streaming: bool = False) -> PlanReport:
    """The shared rule engine over a physical-plan string (either
    dialect — see :func:`_global_windows`)."""
    feats = {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
        or plan.count("Exchange "),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "windows": len(re.findall(r"^\(\d+\) Window\b", plan, re.M))
        + len(re.findall(r"(?:^|[\s\-+*])Window \[", plan, re.M)),
        "python_evals": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "cartesian_products": plan.count("CartesianProduct"),
        "file_scans": len(re.findall(r"^\(\d+\) Scan\b", plan, re.M))
        or len(re.findall(r"FileScan\b", plan)),
    }
    if streaming:
        feats["stateful_ops"] = (
            plan.count("FlatMapGroupsInPandasWithState")
            + plan.count("FlatMapGroupsWithState")
            + plan.count("StateStoreSave")
            + plan.count("SessionWindowStateStore")
        )
        feats["watermarks"] = plan.count("EventTimeWatermark")
    warnings = []
    if plan.count("BatchEvalPython"):
        warnings.append(
            "row-at-a-time Python UDF in the plan (BatchEvalPython) — "
            "rewrite with built-in functions or an Arrow pandas_udf"
        )
    if feats["cartesian_products"]:
        warnings.append(
            "CartesianProduct join — add an equi-join key, or broadcast a "
            "bounded side explicitly"
        )
    gw = _global_windows(plan)
    if gw:
        warnings.append(
            f"{gw} window(s) with an EMPTY partition spec — the whole input "
            "funnels through one task; use a two-phase aggregate (top-k) or "
            "a distributed prefix scan instead"
        )
    empty_pushdown = len(re.findall(r"PushedFilters: \[\]", plan))
    filters = len(re.findall(r"^\(\d+\) Filter\b", plan, re.M))
    if empty_pushdown and filters:
        warnings.append(
            f"{empty_pushdown} parquet scan(s) with PushedFilters: [] below "
            "Filter operators — predicates are not reaching the scan "
            "(non-deterministic expression, or a filter on a derived column)"
        )
    if streaming and plan.count("StateStoreSave") and not feats["watermarks"]:
        warnings.append(
            "streaming aggregation state (StateStoreSave) with NO "
            "EventTimeWatermark upstream — state never expires and grows "
            "with the stream's key space (fine only for complete-mode "
            "dashboards over a bounded key set; add withWatermark otherwise)"
        )
    return PlanReport(feats, warnings)


def audit(df: DataFrame) -> PlanReport:
    """Audit a DataFrame's physical plan for the scale hazards the
    package's own operators are gated against. Lazy — inspects the
    plan, never executes it. ``report.render()`` prints the summary;
    ``report.ok`` is the boolean gate."""
    return _audit_plan(plan_text(df))


def stream_plan_text(query) -> str:
    """The last-executed micro-batch's physical plan of a STARTED
    StreamingQuery — ``query.explain()`` prints client-side, so the
    capture needs no private APIs. Empty/placeholder until the first
    micro-batch has run."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        query.explain()
    return buf.getvalue()


def audit_stream(query) -> PlanReport:
    """:func:`audit` for a running StreamingQuery: inspects the last
    micro-batch's physical plan (tree dialect), adds the streaming
    features (stateful operators, watermarks), and applies the same
    scale warnings — the stateful ops are exactly where an accidental
    per-key global window or an unwatermarked aggregation hurts most.
    Before the first micro-batch there is no plan yet; the report says
    so instead of warning on an empty string."""
    plan = stream_plan_text(query)
    if not plan.strip() or "No physical plan" in plan:
        return PlanReport(
            {"micro_batches_planned": 0},
            ["no micro-batch has executed yet — run one trigger, then audit"],
        )
    return _audit_plan(plan, streaming=True)


def estimate(df: DataFrame) -> dict:
    """Catalyst's OWN cost estimate for a frame, before anything runs:
    {"size_bytes": int | None, "rows": int | None} from the optimized
    logical plan's statistics (file sizes × filter/project selectivity
    heuristics; ``rows`` is present when the sources carry row counts —
    parquet footers, CBO-analyzed tables — else None).

    The pre-flight companion to :func:`audit`: audit says whether the
    SHAPE survives scale, estimate says what Catalyst thinks the size
    is — a join whose estimate comes back orders of magnitude above the
    inputs is the un-keyed-join bug before it runs. Estimates are
    heuristics, not measurements; trust them for orders of magnitude."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    size = int(str(stats.sizeInBytes()))
    rc = stats.rowCount()
    rows = int(str(rc.get())) if rc is not None and rc.isDefined() else None
    return {"size_bytes": size, "rows": rows}
