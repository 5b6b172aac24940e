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


# a Window operator line in the formatted plan, e.g.
#   (12) Window
# followed later by "Arguments: [<funcs>], [<partition spec>], [<order>]"
_WINDOW_ARGS = re.compile(
    r"^\(\d+\) Window\b.*?^Arguments: (\[.*)$", re.M | re.S
)


def _global_windows(plan: str) -> int:
    """Window operators with NO partition spec. A partitioned Window's
    formatted Arguments render THREE top-level lists — [functions],
    [partition-exprs], [sort-order] — a global one renders two (the
    partition list is omitted entirely, measured on Spark 4.x), and
    either shape can also surface an explicitly empty ``[]``."""
    n = 0
    for block in plan.split("\n\n"):
        if not re.search(r"^\(\d+\) Window\b", block, re.M):
            continue
        m = re.search(r"^Arguments: (.*)$", block, re.M)
        if not m:
            continue
        # split the top-level bracketed lists
        lists, depth, start = [], 0, None
        for i, ch in enumerate(m.group(1)):
            if ch == "[":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    lists.append(m.group(1)[start : i + 1])
        if len(lists) < 3 or lists[1].strip() == "[]":
            n += 1
    return n


def audit(df: DataFrame) -> PlanReport:
    """Audit a DataFrame's physical plan for the scale hazards the
    package's own operators are gated against. Lazy — inspects the
    plan, never executes it. ``report.render()`` prints the summary;
    ``report.ok`` is the boolean gate."""
    plan = plan_text(df)
    feats = {
        "exchanges": len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M)),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "windows": len(re.findall(r"^\(\d+\) Window\b", plan, re.M)),
        "python_evals": plan.count("BatchEvalPython") + plan.count("ArrowEvalPython"),
        "cartesian_products": plan.count("CartesianProduct"),
        "file_scans": len(re.findall(r"^\(\d+\) Scan\b", plan, re.M)),
    }
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
    return PlanReport(feats, warnings)
