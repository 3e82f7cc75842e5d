"""Text-analysis scalars for the training-data pipeline tier.

The reference only *declared* text analytics (jieba/snownlp in
``airflow/requirements.txt:9-11``, no committed call-site) — this module makes
the surface real, as pure column expressions so every one of them is
oracle-checkable against DuckDB SQL and stays inside codegen at 100 TB.

All functions operate on a whitespace-tokenizable text column (the driver's
``documents.text``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small + hard-coded so the SQL oracle can replicate
#: them verbatim.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

#: Punctuation set counted by the quality score (explicit, not \p{Punct},
#: so Spark and DuckDB agree bit-for-bit).
_PUNCT_RE = r"[.,!?;:]"

STOPWORDS = LANG_MARKERS["en"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array (not ['''])."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, _PUNCT_RE, ""))


def _marker_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are (English) stopwords, 0.0 for empty docs."""
    toks = tokens(text)
    return F.when(F.size(toks) > 0, _marker_hits(toks, STOPWORDS) / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + punctuation
    restraint + stopword presence. Left unrounded — a single IEEE division
    of exact operands is deterministic across engines, whereas round()
    half-modes are not."""
    n_tok = token_count(text)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        F.length(text) > 0, punct_count(text) / F.length(text)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio < 0.1, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.0, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: argmax of per-language marker hits with a
    CJK-character override; deterministic tie-break en>es>de>fr; 'und' when
    nothing matches."""
    toks = tokens(text)
    hits = {lang: _marker_hits(toks, words) for lang, words in LANG_MARKERS.items()}
    has_cjk = F.length(F.regexp_replace(text, r"[^一-鿿]", "")) > 0
    best = F.greatest(*hits.values())
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["es"] == best, F.lit("es"))
        .when(hits["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


#: BPE-ish pre-tokenization regex (GPT-2-style, simplified to the subset
#: Java regex and RE2 evaluate identically — no lookaheads, no \p classes):
#: a leading-space-glued letter run, digit run, or punctuation run.
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (the unit an LLM tokenizer would merge from) —
    the training-data token counter that whitespace splitting undercounts."""
    return F.regexp_extract_all(text, F.lit(BPE_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


#: Rolling-hash parameters: base 31, modulus 2^56 — acc*31+cp < 2^62 stays
#: inside a 64-bit long with no overflow under ANSI arithmetic.
_RH_MOD = 1 << 56


def rolling_hash(text: Column) -> Column:
    """Order-SENSITIVE polynomial rolling hash (Rabin-Karp) over the
    document's code points: h = Σ cp_i · 31^(n-i) mod 2^56. Complements
    ``fingerprint`` (order-insensitive bag-of-words md5): reordered tokens
    change this value but not that one. F.ascii returns the full code point
    (matching SQL ord()), so the hash is identical cross-engine for any
    unicode text."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * 31 + F.ascii(c), F.lit(_RH_MOD)),
    )
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(h)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted, lowercased
    token bag. Robust to token reordering/whitespace — the batch analog of a
    rolling-hash content fingerprint, chosen so the DuckDB oracle can compute
    the identical value."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.transform(tokens(text), F.lower))))
