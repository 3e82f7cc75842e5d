"""Surrogate-key generation.

Reference computes MD5 hex digests driver-side in Python
(``airflow/utils/common.py:8-19`` — ``generate_attraction_id`` /
``generate_type_id``; also post ids from text,
``fb_scraper/facebook_scraper.py:58``). Spark's built-in ``md5()`` keeps it
JVM-side and distributed — zero Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Field separator for multi-column keys; a control char that cannot appear in
#: the reference's name/type strings, so concat is collision-safe.
_SEP = ""


def md5_id(col: Column) -> Column:
    """``hashlib.md5(value.encode()).hexdigest()`` equivalent (common.py:8-19)."""
    return F.md5(col.cast("string"))


def surrogate_key(*cols: Column) -> Column:
    """Deterministic multi-column surrogate key: md5 over separator-joined
    string representations. NULL components become '' (concat_ws semantics) —
    callers needing NULL-propagation should pre-filter, as the reference's
    id generators only ever run on NOT NULL names."""
    return F.md5(F.concat_ws(_SEP, *[c.cast("string") for c in cols]))
