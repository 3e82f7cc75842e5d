"""Round-over-round bench comparator (VERDICT r03 next-round item 4).

Compares two bench records and writes a markdown diff flagging likely
regressions. Accepts either format:

- a full bench record as written by ``bench.py`` to ``BENCH_LOCAL.json``
  (``{"value": ..., "queries": {...}, "run_spread": {...}}``), or
- a driver artifact ``BENCH_r{N}.json`` (``{"n": ..., "tail": "..."}``) —
  the driver keeps only a 2,000-char stdout tail, so per-query timings are
  recovered best-effort from the tail text (entries that scrolled off the
  front of the tail are simply absent and reported as "no prior number").

This host shows minutes-long CPU-steal bursts (documented in bench.py), so
a single inflated ratio is not proof of a plan regression: the report
carries each side's run_spread when available, and only ratios above
``--threshold`` (default 1.5) on queries whose own run spread is below the
steal ratio are flagged as ``REGRESSION?``; the rest land in the noise
section.

Usage:
    python tools/benchdiff.py OLD.json NEW.json [-o BENCHDIFF.md]
"""

from __future__ import annotations

import argparse
import json
import re
import sys

#: A truncated driver tail still holds dozens of `"name": float` pairs;
#: recovering fewer than this many suggests the regex missed the format
#: (or the tail was cut mid-record) — warn rather than silently triage
#: against a near-empty prior.
_SUSPICIOUS_RECOVERY_FLOOR = 10


def load_legs(path: str) -> dict[str, dict[str, float]]:
    """Per-leg wall times of the multi-commit gated cycles, when the
    record carries them (bench.py's BENCH_LOCAL.json since r11; driver
    tails don't)."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:
        return {}
    legs = rec.get("legs")
    return legs if isinstance(legs, dict) else {}


def load_runs(path: str) -> dict[str, list[float]]:
    """Raw per-query run lists, when the record carries them (bench.py's
    BENCH_LOCAL.json; driver tails don't)."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except Exception:
        return {}
    runs = rec.get("runs")
    return runs if isinstance(runs, dict) else {}


def load_timings(path: str) -> tuple[dict[str, float], dict[str, float], float | None]:
    """Return (timings, run_spread, total) from either record format."""
    with open(path) as f:
        rec = json.load(f)
    if "queries" in rec and isinstance(rec["queries"], dict):
        return dict(rec["queries"]), dict(rec.get("run_spread", {})), rec.get("value")
    tail = rec.get("tail", "")
    if not tail:
        parsed = rec.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            return dict(parsed["queries"]), {}, parsed.get("value")
        return {}, {}, None
    # Driver tail recovery: timings precede the "run_spread" key; anything
    # after it is a spread ratio, not a timing. Both sections are flat
    # `"name": float` pairs, so split first, then regex.
    cut = tail.find('"run_spread"')
    timing_text = tail[:cut] if cut >= 0 else tail
    spread_text = tail[cut:] if cut >= 0 else ""
    pair = re.compile(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)')
    timings = {m.group(1): float(m.group(2)) for m in pair.finditer(timing_text)}
    spreads = {m.group(1): float(m.group(2)) for m in pair.finditer(spread_text)}
    # Drop non-query scalar keys the tail may include (sf, value, n, cpus,
    # and compact_line's q_dropped truncation marker).
    for k in ("sf", "value", "n", "cpus", "rc", "q_dropped"):
        timings.pop(k, None)
        spreads.pop(k, None)
    if len(timings) < _SUSPICIOUS_RECOVERY_FLOOR:
        print(
            f"benchdiff: WARNING recovered only {len(timings)} timings from "
            f"truncated tail {path!r} — regression triage is partial",
            file=sys.stderr,
        )
    return timings, spreads, None


def diff(
    old_path: str, new_path: str, threshold: float, steal_ratio: float
) -> str:
    old, old_spread, old_total = load_timings(old_path)
    new, new_spread, new_total = load_timings(new_path)
    lines = [
        "# BENCHDIFF",
        "",
        f"- old: `{old_path}` ({len(old)} query timings"
        + (f", total {old_total}s" if old_total is not None else ", total unrecorded")
        + ")",
        f"- new: `{new_path}` ({len(new)} query timings"
        + (f", total {new_total}s" if new_total is not None else ", total unrecorded")
        + ")",
        f"- regression threshold: {threshold}x on queries with run spread < {steal_ratio}",
        "",
    ]
    overlap = sorted(set(old) & set(new))
    if old_total is not None and new_total is not None:
        common_old = sum(old[q] for q in overlap)
        common_new = sum(new[q] for q in overlap)
        if common_old > 0:
            lines.append(
                f"Common-query total: {common_old:.1f}s -> {common_new:.1f}s "
                f"({common_new / common_old:.2f}x)."
            )
            lines.append("")
    new_runs = load_runs(new_path)
    flagged, improved, noisy = [], [], []
    for q in overlap:
        if old[q] <= 0:
            continue
        ratio = new[q] / old[q]
        spread = max(old_spread.get(q, 1.0), new_spread.get(q, 1.0))
        def _row(note: str = "") -> str:
            return (
                f"| {q} | {old[q]:.2f} | {new[q]:.2f} | {ratio:.2f}x "
                f"| {spread:.2f} | {note} |"
            )
        if ratio > threshold:
            # "unstable" must not mean "unexamined" (the r12 sql_entry
            # hole): a steal burst inflates SOME runs, so when even the
            # MINIMUM new run exceeds threshold*old the drift cannot be
            # explained by noise — escalate it to the regression table
            # with the min noted in its own column (a cell-count-true
            # row, not an annotation glued onto the spread cell).
            qruns = new_runs.get(q)
            floor = min(qruns) if qruns else None
            if spread > steal_ratio and (
                floor is None or floor <= threshold * old[q]
            ):
                noisy.append(_row())
            else:
                note = (
                    f"min run {floor:.2f} > {threshold}x old"
                    if spread > steal_ratio else ""
                )
                flagged.append(_row(note))
        elif ratio < 1 / threshold:
            improved.append(_row())
    header = (
        "| query | old s | new s | ratio | max spread | note |\n"
        "|---|---|---|---|---|---|"
    )
    if flagged:
        lines += [
            "## REGRESSION? (ratio > threshold; runs stable, or even the "
            "min run exceeds it)",
            "", header, *flagged, "",
        ]
    else:
        lines += ["No stable-run regressions above threshold.", ""]
    if noisy:
        lines += ["## Above threshold but steal-noisy (spread > steal ratio)", "", header, *noisy, ""]
    if improved:
        lines += ["## Improved", "", header, *improved, ""]
    only_new = sorted(set(new) - set(old))
    if only_new:
        lines += [f"No prior number ({len(only_new)}): " + ", ".join(only_new), ""]
    # Per-leg breakdown of the gated storage cycles (r10 verdict item 6):
    # a cycle query's growth is attributable to a specific commit leg
    # from the record alone — leg-vs-leg when both sides carry legs,
    # new-side legs otherwise.
    old_legs, new_legs = load_legs(old_path), load_legs(new_path)
    if new_legs:
        lines += ["## Gated-cycle legs (sec, last timed run)", ""]
        for q in sorted(new_legs):
            nl = new_legs[q]
            ol = old_legs.get(q, {})
            if ol:
                lines.append(
                    f"- **{q}**: "
                    + ", ".join(
                        f"{leg} {ol.get(leg, float('nan')):.2f}->{nl[leg]:.2f}"
                        if leg in ol else f"{leg} {nl[leg]:.2f} (new)"
                        for leg in nl
                    )
                )
            else:
                lines.append(
                    f"- **{q}**: "
                    + ", ".join(f"{leg} {v:.2f}" for leg, v in nl.items())
                )
        lines.append("")
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("-o", "--out", default="BENCHDIFF.md")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--steal-ratio", type=float, default=1.5)
    args = ap.parse_args()
    report = diff(args.old, args.new, args.threshold, args.steal_ratio)
    with open(args.out, "w") as f:
        f.write(report)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
