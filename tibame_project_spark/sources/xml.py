"""XML source (S13 — the reference parses CWA monthly weather XML reports
with BeautifulSoup in a notebook, ``weatherINFO/a1-2.ipynb`` cells 1-9).

No spark-xml package exists in this container, so ingestion is a
driver-side stdlib parse → ``spark.createDataFrame`` — appropriate for the
reference's workload (one small government XML report per month). For
lake-scale XML, swap this for ``spark.read.format("xml")`` (spark-xml /
Spark 4 built-in) keeping the same row-tag contract.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def _local(tag: str) -> str:
    """Strip the XML namespace: '{uri}name' → 'name'."""
    return tag.rsplit("}", 1)[-1]


def _rows(root: ET.Element, row_tag: str) -> Iterable[dict[str, str | None]]:
    for el in root.iter():
        if _local(el.tag) == row_tag:
            row: dict[str, str | None] = dict(el.attrib)
            for child in el:
                # leaf text wins; nested structure flattens one level
                row[_local(child.tag)] = (child.text or "").strip() or None
            yield row


def read_xml(
    spark: SparkSession,
    source: str,
    row_tag: str,
    *,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Parse ``source`` (path or literal XML text) into a DataFrame with one
    row per ``row_tag`` element: attributes + one column per child element
    (all strings unless a schema casts them). Namespaces are stripped."""
    text = source
    if not source.lstrip().startswith("<"):
        with open(source, encoding="utf-8") as fh:
            text = fh.read()
    rows = list(_rows(ET.fromstring(text), row_tag))
    from tibame_project_spark.localdf import local_rows_df

    if schema is not None:
        if isinstance(schema, str) or not rows:
            return spark.createDataFrame(rows, schema)  # type: ignore[arg-type]
        cols = [f.name for f in schema.fields]
        return local_rows_df(
            spark, [tuple(r.get(c) for c in cols) for r in rows], schema
        )
    if not rows:
        raise ValueError(f"no <{row_tag}> elements found and no schema given")
    cols = sorted({k for r in rows for k in r})
    data = [tuple(r.get(c) for c in cols) for r in rows]
    return local_rows_df(
        spark, data, ", ".join(f"{c} string" for c in cols)
    )
