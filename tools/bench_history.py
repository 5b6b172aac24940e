"""Bench history with noise bars — the cross-round regression judge.

This box shows ~48% cold-run spread (BENCH_SCALING.md), so a single
round-over-round delta routinely reads as a 'regression' that is pure
noise (BENCH_r10's suite aggregate whipsawed 54.6K -> 47.8K driver vs
60.2K solo on identical output rows). The durable signal is the
per-query MEDIAN across runs with the MAD as the noise bar: a change
is real when it clears the median by more than ~2-3 MADs, not when it
beats last run's single sample.

Source: ``BENCH_HISTORY.jsonl`` — ``bench.py`` appends its FULL payload
(cold + extras) after every run, so both the driver's per-round
invocation and solo runs accumulate here. (The driver's own
``BENCH_r*.json`` records keep only a truncated ``tail`` of the stdout
line — per-query colds are NOT recoverable from them, which is exactly
why this ledger exists.) Each entry is labelled with a round hint
(count of BENCH_r files at append time + 1) so the table reads
"which round was this run part of".

Output: ``BENCH_HISTORY.md`` — one row per query: the last ``MAX_COLS``
runs' cold seconds, the median and MAD over ALL runs at the default sf,
and the latest run's distance from the median in MAD units. Regenerated
by ``bench.py`` after every run and runnable standalone:

    PYTHONPATH=. python tools/bench_history.py
"""

from __future__ import annotations

import glob
import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HISTORY_JSONL = os.path.join(REPO, "BENCH_HISTORY.jsonl")
HISTORY_MD = os.path.join(REPO, "BENCH_HISTORY.md")
MAX_COLS = 12


def _official_queries(payload: dict) -> dict[str, float]:
    # pre-r13 payloads: single cold pass; r13+: per-query median of 3
    out = dict(payload.get("queries") or {})
    out.update(payload.get("queries_extra") or {})
    return {k: float(v) for k, v in out.items()}


def _round_hint() -> int:
    return len(glob.glob(os.path.join(REPO, "BENCH_r*.json"))) + 1


def append_local_run(payload: dict) -> None:
    """Record one bench.py run (called by bench.py after printing its
    JSON line; file writes only, stdout stays clean)."""
    row = {
        "round_hint": _round_hint(),
        "sf": payload.get("sf"),
        "queries": _official_queries(payload),
        "rows_per_sec": payload.get("rows_per_sec"),
        "cleanse_rps": payload.get("cleanse_recipe_rows_per_sec"),
    }
    with open(HISTORY_JSONL, "a") as fh:
        fh.write(json.dumps(row) + "\n")


def load_runs(sf: float = 0.1) -> list[dict]:
    """All recorded runs at the given sf, oldest first."""
    runs = []
    try:
        lines = open(HISTORY_JSONL).read().splitlines()
    except OSError:
        return []
    for ln in lines:
        if not ln.strip():
            continue
        try:
            row = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if row.get("sf") == sf and row.get("queries"):
            runs.append(row)
    return runs


def render_md() -> str:
    runs = load_runs()
    shown = runs[-MAX_COLS:]
    names: list[str] = []
    for r in runs:
        for n in r["queries"]:
            if n not in names:
                names.append(n)
    labels = [f"r{r.get('round_hint', '?')}.{i}" for i, r in enumerate(shown)]
    lines = [
        "# BENCH_HISTORY — per-query cold seconds across bench runs (sf0.1)",
        "",
        "Each column is one bench.py run (labelled rN.i = i-th recorded run",
        "while round N was in progress — the driver's per-round run and any",
        "solo runs both append). Median/MAD are over ALL recorded runs, not",
        "just the shown columns. With ~48% cold-run spread on this box,",
        "treat |last Δ| <= ~3 MAD as noise; judge regressions against the",
        "median, never a single cold sample. (The driver's own BENCH_r*.json",
        "keep only a truncated stdout tail, so this ledger is the canonical",
        "per-query series from round 11 onward.)",
        "",
        "| query | " + " | ".join(labels) + " | median | MAD | last Δ(MADs) |",
        "|---|" + "---|" * (len(labels) + 3),
    ]
    for name in names:
        series = [r["queries"].get(name) for r in runs]
        present = [v for v in series if v is not None]
        med = statistics.median(present) if present else None
        mad = (
            statistics.median([abs(v - med) for v in present])
            if len(present) >= 3
            else None
        )
        last = series[-1] if series else None
        if last is not None and med is not None and mad:
            delta = f"{(last - med) / mad:+.1f}"
        else:
            delta = ""
        cells = [
            "" if r["queries"].get(name) is None else f"{r['queries'][name]}"
            for r in shown
        ]
        lines.append(
            f"| {name} | " + " | ".join(cells)
            + f" | {'' if med is None else round(med, 3)}"
            + f" | {'' if mad is None else round(mad, 3)} | {delta} |"
        )
    if runs:
        agg = ", ".join(
            f"r{r.get('round_hint','?')}.{i}={r.get('rows_per_sec')}"
            for i, r in enumerate(shown)
        )
        lines += ["", f"Suite rows_per_sec per run: {agg}"]
    lines += [
        "",
        "## Attributions",
        "",
        "- **dedup_ngram_word creep (r11 5.76 -> r12 8.88)** — adjudicated",
        "  r13: NOT a code regression. The default ngram path is",
        "  plan-identical to r10 (the r11 governor and r12 budget branches",
        "  are behind `None` defaults and add no operators); idle-box r13",
        "  re-runs measured warm 6.51/7.06/8.27 s (median 7.06), matching",
        "  the mid-r11 ledger columns, and the 5.76 figure is the single",
        "  earliest r11.0 sample on a quiet box. The apparent monotone",
        "  creep tracks ledger column index — box load accumulates later",
        "  in each round (r12.8-.11 were inside the window where EVERY",
        "  query inflated 2-5x). The r13 median-of-3 bench change exists",
        "  precisely so this class of artifact stops reading as a trend.",
        "",
        "Generated by tools/bench_history.py (bench.py regenerates it per run).",
    ]
    return "\n".join(lines) + "\n"


def regenerate() -> None:
    with open(HISTORY_MD, "w") as fh:
        fh.write(render_md())


if __name__ == "__main__":
    regenerate()
    print(f"wrote {HISTORY_MD}")
