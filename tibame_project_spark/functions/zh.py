"""Chinese text analytics (F21 — the reference declares jieba + snownlp in
``airflow/requirements.txt:9-10`` with no committed call-site; fuzzywuzzy is
the only one used, covered by operators.joins.fuzzy_top1_join).

This module makes the declared surface real as Arrow-batched pandas UDFs —
the one place Python in the hot path is justified (no JVM jieba/snownlp).
Both libraries are import-gated: absent (as in this container) the UDFs fall
back to deterministic heuristics so plumbing, schema, and tests stay real:

* tokenize_zh → jieba.lcut, else contiguous CJK bigrams + non-CJK words
* sentiment_zh → snownlp sentiment in [0,1], else a polarity-lexicon ratio
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, StringType

try:  # pragma: no cover - not present in this container
    import jieba  # type: ignore

    _HAS_JIEBA = True
except ImportError:
    jieba = None
    _HAS_JIEBA = False

try:  # pragma: no cover - not present in this container
    from snownlp import SnowNLP  # type: ignore

    _HAS_SNOWNLP = True
except ImportError:
    SnowNLP = None
    _HAS_SNOWNLP = False

_CJK = r"一-鿿"
_TOKEN_RE = re.compile(rf"[{_CJK}]+|[^\s{_CJK}]+")

#: Minimal polarity lexicon for the fallback sentiment heuristic.
_POS = ("好", "棒", "讚", "美", "喜歡", "推薦", "推")
_NEG = ("差", "爛", "糟", "貴", "失望", "雷")


def _fallback_tokens(text: str) -> list[str]:
    """CJK runs become character bigrams (unigram if length 1); non-CJK runs
    stay whole words — a deterministic stand-in for dictionary segmentation."""
    out: list[str] = []
    for run in _TOKEN_RE.findall(text):
        if re.match(rf"[{_CJK}]", run):
            if len(run) == 1:
                out.append(run)
            else:
                out.extend(run[i : i + 2] for i in range(len(run) - 1))
        else:
            out.append(run)
    return out


def _fallback_sentiment(text: str) -> float:
    pos = sum(text.count(w) for w in _POS)
    neg = sum(text.count(w) for w in _NEG)
    if pos + neg == 0:
        return 0.5
    return pos / (pos + neg)


def _tokenize_batch(texts: pd.Series) -> pd.Series:
    if _HAS_JIEBA:
        return texts.map(lambda t: jieba.lcut(t) if t else [])
    return texts.map(lambda t: _fallback_tokens(t) if t else [])


def _sentiment_batch(texts: pd.Series) -> pd.Series:
    if _HAS_SNOWNLP:
        return texts.map(lambda t: float(SnowNLP(t).sentiments) if t else 0.5)
    return texts.map(lambda t: _fallback_sentiment(t) if t else 0.5)


# UDFs are wrapped per call (not at import): pandas_udf registration needs an
# active SparkSession, and this module must import session-free.

def tokenize_zh(col: Column) -> Column:
    """zh tokenization (jieba when installed, CJK-bigram fallback here)."""
    return pandas_udf(_tokenize_batch, ArrayType(StringType()))(col)


def sentiment_zh(col: Column) -> Column:
    """zh sentiment in [0,1] (snownlp when installed, lexicon ratio here)."""
    return pandas_udf(_sentiment_batch, DoubleType())(col)
