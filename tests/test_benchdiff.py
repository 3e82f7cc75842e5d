"""tools/benchdiff.py: record loading (both formats) and regression triage."""

from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent


def _import_from(directory: Path, name: str):
    """Import ``name`` with ``directory`` on sys.path only for the duration
    of the import — the path entry never leaks into the rest of the pytest
    session (it could shadow installed modules for unrelated tests)."""
    if name in sys.modules:
        return sys.modules[name]
    entry = str(directory)
    sys.path.insert(0, entry)
    try:
        return importlib.import_module(name)
    finally:
        sys.path.remove(entry)


_benchdiff = _import_from(_REPO_ROOT / "tools", "benchdiff")
diff, load_timings = _benchdiff.diff, _benchdiff.load_timings


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_full_record(tmp_path):
    p = _write(
        tmp_path,
        "full.json",
        {
            "value": 3.0,
            "queries": {"a": 1.0, "b": 2.0},
            "run_spread": {"a": 1.1, "b": 2.0},
        },
    )
    t, s, total = load_timings(p)
    assert t == {"a": 1.0, "b": 2.0} and s["b"] == 2.0 and total == 3.0


def test_load_driver_tail_recovers_partial_timings(tmp_path):
    # A truncated driver artifact: the head of the JSON line is gone, the
    # tail carries the last timings then the full run_spread section.
    tail = (
        '"q_two": 0.5, "q_three": 1.5}, "run_spread": '
        '{"q_one": 1.0, "q_two": 9.9, "q_three": 1.2}, "sf": 0.1}'
    )
    p = _write(tmp_path, "driver.json", {"n": 4, "rc": 0, "tail": tail})
    t, s, total = load_timings(p)
    assert t == {"q_two": 0.5, "q_three": 1.5}  # q_one scrolled off
    assert s["q_two"] == 9.9 and "sf" not in t and total is None


def test_diff_separates_stable_regressions_from_steal_noise(tmp_path):
    old = _write(
        tmp_path,
        "old.json",
        {"value": 3.0, "queries": {"a": 1.0, "b": 1.0, "c": 1.0},
         "run_spread": {"a": 1.0, "b": 1.0, "c": 1.0}},
    )
    new = _write(
        tmp_path,
        "new.json",
        # a: stable 2x regression; b: 2x but steal-noisy; c: improved 2x
        {"value": 3.5, "queries": {"a": 2.0, "b": 2.0, "c": 0.5, "d": 1.0},
         "run_spread": {"a": 1.1, "b": 7.0, "c": 1.0, "d": 1.0}},
    )
    report = diff(old, new, 1.5, 1.5)
    assert "REGRESSION?" in report
    reg_section = report.split("REGRESSION?")[1].split("##")[0]
    assert "| a |" in reg_section and "| b |" not in reg_section
    noisy_section = report.split("steal-noisy")[1].split("##")[0]
    assert "| b |" in noisy_section
    assert "| c |" in report.split("Improved")[1]
    assert "No prior number (1): d" in report


def test_bench_compact_line_fits_driver_tail():
    """The driver keeps a 2,000-char stdout tail; the bench line must always
    parse from it — with per-query detail when it fits, without when not."""
    compact_line = _import_from(_REPO_ROOT, "bench").compact_line

    few = {f"q{i}": 1.234 for i in range(10)}
    line = compact_line(12.3, few, 0.1)
    rec = json.loads(line)
    assert rec["queries"]["q0"] == 1.23 and rec["value"] == 12.3
    assert len(line) <= 1995

    many = {f"very_long_query_name_{i:04d}": 123.456 for i in range(200)}
    line = compact_line(999.9, many, 0.1)
    rec = json.loads(line)  # still one parseable line...
    assert len(line) <= 1995  # ...that fits the tail
    assert rec["value"] == 999.9
    # graceful degradation: the slowest entries that fit survive, with an
    # explicit marker for how many were cut
    assert rec["q_dropped"] == 200 - len(rec["queries"])
    assert len(rec["queries"]) > 0


def test_bench_line_keeps_detail_at_current_query_count():
    """Regression guard for the r02/r03 'parsed: null' incident: with the
    CURRENT registered query set and worst-case timing widths, the compact
    line must still fit the driver's 2,000-char tail WITH per-query detail
    (detail silently dropping is the next failure mode after truncation)."""
    entry_mod = _import_from(_REPO_ROOT, "__spark_entry__")
    compact_line = _import_from(_REPO_ROOT, "bench").compact_line

    worst = {name: 999.99 for name in entry_mod.queries()}
    line = compact_line(99999.999, worst, 0.1)
    rec = json.loads(line)
    assert len(line) <= 1995
    kept = rec.get("queries", {})
    assert len(kept) + rec.get("q_dropped", 0) == len(worst)
    assert len(kept) >= 0.6 * len(worst), (
        "per-query detail no longer fits the driver tail even at reduced "
        "precision — trim query-name lengths or rethink the compact format"
    )
    # realistic widths (sub-10s timings) must keep FULL detail
    realistic = {name: 1.234 for name in entry_mod.queries()}
    rec = json.loads(compact_line(54.18, realistic, 0.1))
    assert len(rec["queries"]) == len(realistic) and "q_dropped" not in rec


def test_noisy_query_with_high_minimum_run_escalates_to_regression(tmp_path):
    """The r12 sql_entry hole: a query whose spread exceeds the steal
    ratio but whose MINIMUM raw run still exceeds threshold*old cannot be
    explained by a steal burst (bursts inflate some runs, not all) — it
    must land in the REGRESSION table, annotated, not be parked as noisy.
    Without raw runs in the record the min is unknowable and the old
    noisy triage stands."""
    old = _write(
        tmp_path, "old.json",
        {"value": 2.0, "queries": {"a": 0.4, "b": 0.4},
         "run_spread": {"a": 1.0, "b": 1.0}},
    )
    new = _write(
        tmp_path, "new.json",
        # both spread-noisy and 5x on the median; a's min run (1.9) is
        # itself ~5x old, b's min run (0.5) is burst-explainable
        {"value": 4.0, "queries": {"a": 2.0, "b": 2.0},
         "run_spread": {"a": 2.6, "b": 8.0},
         "runs": {"a": [1.9, 2.0, 4.9], "b": [0.5, 2.0, 4.0]}},
    )
    report = diff(old, new, 1.5, 1.5)
    reg_section = report.split("REGRESSION?")[1].split("##")[0]
    assert "| a |" in reg_section and "min run 1.90" in reg_section
    assert "| b |" not in reg_section
    noisy_section = report.split("steal-noisy")[1].split("##")[0]
    assert "| b |" in noisy_section
    # the annotation rides its own `note` column: every row in these
    # tables must carry exactly the header's cell count (a glued-on
    # annotation used to merge into the spread cell / add a sixth cell
    # against a five-column header, rendering misaligned markdown)
    for section in (reg_section, noisy_section):
        widths = {
            ln.count("|") for ln in section.splitlines() if ln.startswith("|")
        }
        assert widths == {7}, f"misaligned table rows: {widths}"
