"""PII detection + redaction for training-corpus cleaning: emails, IPv4
addresses and US-style phone numbers replaced by typed placeholder
tokens, with per-document match counts (computed on the ORIGINAL text)
for audit/metrics.

Pure whole-stage-codegen regexp chains (no shuffle, no Python); the
patterns deliberately stay inside the Java-regex ∩ RE2 common subset
(no backreferences, no lookaround) so the DuckDB oracle replays them
verbatim. Redaction order is email -> IPv4 -> phone: emails may contain
digits/dots that the later patterns would chew on; the placeholder
tokens themselves match none of the patterns, so the chain is
idempotent.

Scope note (documented heuristic, not a guarantee): international phone
formats, obfuscated emails ("a at b dot com"), IPv6 and personal names
need NER-grade tooling; this operator is the regex tier every pipeline
runs first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

_ORDER = ((EMAIL_RE, "<EMAIL>", "n_emails"),
          (IPV4_RE, "<IP>", "n_ips"),
          (PHONE_RE, "<PHONE>", "n_phones"))


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Adds ``n_emails/n_ips/n_phones`` (match counts on the original
    text) and ``out_col`` (the redacted text)."""
    t = F.col(text_col)
    out = df
    red = t
    for pat, token, cnt in _ORDER:
        out = out.withColumn(cnt, F.regexp_count(t, F.lit(pat)).cast("long"))
        red = F.regexp_replace(red, pat, token)
    return out.withColumn(out_col, red)


def luhn_audit(df: DataFrame, num_col: str = "num") -> DataFrame:
    """Luhn mod-10 checksum audit -> (is_valid, n, min_num,
    max_num): the card/IMEI/account-number format validator as a
    data-quality census (the checksum sibling of the regex-shape
    validators in this module — a string can LOOK like a PAN and
    still fail its check digit). Pure codegen: the doubled-digit
    sum is one aggregate() fold over the digit positions, right-
    aligned so position parity is length-independent; non-digit or
    empty inputs count as invalid by contract."""
    n = F.length(F.col(num_col))
    term = (
        "aggregate(sequence(1, length({c})), 0, (acc, i) -> acc + "
        "CASE WHEN i % 2 = 1 THEN ascii(substring({c}, "
        "length({c}) - i + 1, 1)) - 48 "
        "ELSE CASE WHEN 2 * (ascii(substring({c}, "
        "length({c}) - i + 1, 1)) - 48) > 9 "
        "THEN 2 * (ascii(substring({c}, length({c}) - i + 1, 1)) "
        "- 48) - 9 "
        "ELSE 2 * (ascii(substring({c}, length({c}) - i + 1, 1)) "
        "- 48) END END)").format(c=num_col)
    ok = (n > 0) & F.col(num_col).rlike("^[0-9]+$") \
        & (F.expr(term) % 10 == 0)
    return (df.select(ok.alias("is_valid"), F.col(num_col))
            .groupBy("is_valid")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min(num_col).alias("min_num"),
                 F.max(num_col).alias("max_num")))
