"""Local twin of the driver's t2 correctness gate: every queries() entry with
an oracle must match DuckDB on row count, column names, and order-insensitive
value hash (at sf0.001 for speed; the driver runs sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows, cols):
    """Sort columns by name, canonicalize values, return a sortable list."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # repr = shortest round-trip: stricter than any plausible
                # driver hash, so passing here implies passing there
                v = "NaN" if math.isnan(v) else repr(v)
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(SF_DIR)
    res = con.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"column names differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count {len(srows)} vs oracle {len(drows)}"
    sn, dn = _normalize(srows, scols), _normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_queries_oracle_contract():
    """Structural guard on the driver contract: no duplicate keys, every
    oracle belongs to a declared query, and every query carries an oracle —
    approximate ops (approx_users, approx_percentiles) are hash-checked via
    tolerance certificates, so nothing is rows-only anymore. Catches
    accidental drops during the per-round window rotation."""
    q = list(entry_mod.queries())
    o = entry_mod.oracle_sql()
    assert len(q) == len(set(q))
    assert set(o) <= set(q)
    assert set(q) - set(o) == set()
    # the driver records the first 50 keys — the window must stay full
    assert len(q) >= 50
