"""PII scrubbing for training-data preparation (north-star extension).

A regex redaction bank over text columns: emails, US-style SSNs, phone
numbers, IPv4 addresses. All patterns are RE2-compatible (no lookaround
or backreferences) so the exact same expressions run under Spark's Java
regex and DuckDB's RE2 — which is what lets the catalog query verify
redaction verbatim against the oracle.

Scale: pure ``regexp_replace`` chains — per-row, whole-stage-codegen'd,
no UDFs, no shuffle. Order matters and is part of the contract: SSN
before phone (an SSN matches the loose phone shape), email before IP
(domains can look like dotted quads in degenerate inputs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in application order — a list, not a dict, so
# the order is explicit and testable.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # no leading \b: a word boundary cannot precede '(' in the
    # parenthesized area-code form
    (r"(\+?[0-9]{1,2}[-. ])?(\([0-9]{3}\)|\b[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def redact_pii(text: Column) -> Column:
    """Apply the full redaction bank in order."""
    out = text
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_flags(text: Column) -> Column:
    """Struct of per-category booleans (did the text contain each PII
    kind) — the audit column a curation pipeline keeps when it drops or
    rewrites documents."""
    names = ("has_email", "has_ssn", "has_phone", "has_ip")
    return F.struct(
        *[
            F.regexp_like(text, F.lit(pat)).alias(name)
            for name, (pat, _) in zip(names, PII_PATTERNS)
        ]
    )
