"""PII detection and scrubbing for training-data curation.

A 100 TB corpus-prep pipeline redacts personally-identifiable strings
before anything downstream sees the text.  These are pure JVM-side
regex expressions (`regexp_count` / `regexp_replace`) — no Python in
the hot path, no shuffle: the whole scrub is a map-only stage that
whole-stage-codegens into the scan.

The reference repo has no PII surface (its data is traffic-sensor
telemetry, not text); this module is part of the beyond-reference LLM
training-data operator family (SURVEY.md §2 addendum), alongside
operators/text.py and operators/curation.py.

Pattern notes: every pattern sticks to the regex subset with identical
semantics in Java (Spark) and RE2 (DuckDB oracle) — character classes,
bounded repetition, `\\b` word boundaries; no lookaround, no backrefs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RFC-ish email — intentionally permissive (curation favors recall).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

#: NANP phone number, dash-separated (e.g. 512-555-0147).
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"

#: Dotted-quad IPv4.  Deliberately allows out-of-range octets (999.…):
#: redacting a near-IP is cheaper than leaking a real one.
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IPV4_TOKEN = "<IP>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII hit counts over the ORIGINAL text (so categories
    are counted independently of scrub order)."""
    t = _c(text)
    return {
        "n_emails": F.regexp_count(t, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(t, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(t, F.lit(IPV4_RE)),
    }


def scrub_pii(text: Column | str) -> Column:
    """Replace every PII match with its redaction token.

    Email runs first: an email's domain can contain dotted digit runs
    that the IPv4 pattern would otherwise shred mid-address.  Phone and
    IPv4 cannot overlap each other (dash- vs dot-separated)."""
    t = _c(text)
    t = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t = F.regexp_replace(t, PHONE_RE, PHONE_TOKEN)
    t = F.regexp_replace(t, IPV4_RE, IPV4_TOKEN)
    return t
