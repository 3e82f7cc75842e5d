"""PII detection/redaction — the C4-style scrub pass a training-data
pipeline runs before release.

Pure column expressions (regexp_extract_all / regexp_replace chains), so the
scrub stays inside whole-stage codegen and is oracle-checkable. Patterns are
deliberately RE2-safe (no lookaround, no backreferences) so Java regex
(Spark) and RE2 (DuckDB) match the identical spans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RE2-safe patterns. Order of application matters: emails first (an email
#: contains digit runs a phone pattern could claim), then IPs, then phones.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
#: international-ish phone: optional +, 9-15 digits with separators
PHONE_RE = r"\+?[0-9][0-9()\-\. ]{7,13}[0-9]"

_TOKENS = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """(n_emails, n_ips, n_phones) — counted on the progressively-redacted
    text exactly as ``scrub_pii`` applies it, so counts and redaction
    always agree."""
    n_email = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(after_email, F.lit(IPV4_RE), 0))
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    n_phone = F.size(F.regexp_extract_all(after_ip, F.lit(PHONE_RE), 0))
    return n_email, n_ip, n_phone


def scrub_pii(text: Column) -> Column:
    """Redact emails → IPs → phones with typed placeholder tokens."""
    out = text
    for pat, tok in _TOKENS:
        out = F.regexp_replace(out, pat, tok)
    return out
