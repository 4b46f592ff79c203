"""PII scrubbing expressions (emails + IPv4) — the redaction pass web
pretraining pipelines (C4, Dolma, RefinedWeb) run between extraction and
dedup. Pure native Catalyst `regexp_replace`/`regexp_count` chains: the
whole scrub stays inside whole-stage codegen with zero exchanges (same
plan class as gopher_quality_flags), so at 10^12 docs it is a free rider
on the extraction scan.

The patterns are deliberately restricted to a regex subset with
IDENTICAL semantics in Java regex (Spark) and RE2 (the DuckDB oracle):
character classes, bounded repetition, and ASCII word boundaries only —
no lookaround, no backreferences. Order matters: emails are redacted
BEFORE IPv4s so a digit-bearing address can never be half-eaten by the
IP pass.

The reference has no PII surface (it consumes ann-benchmarks vectors);
this is part of the engine-level corpus-pipeline tier (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"


def scrub(text: Column) -> Column:
    """Text with emails then IPv4s replaced by redaction tokens."""
    redacted = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    return F.regexp_replace(redacted, IPV4_RE, IPV4_TOKEN)


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_RE))


def ipv4_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_RE))
