"""PII detection / redaction over document text — the scrubbing pass a
training-data pipeline runs before anything ships to a training run.

Pure Catalyst expressions (regexp_count / regexp_replace, JVM-side,
whole-stage codegen); patterns are deliberately simple character-class
regexes that behave identically under Java regex (Spark) and RE2
(DuckDB oracle) — both leftmost-first — so the gate can value-check
counts AND redacted text.  A real deployment extends PATTERNS or
plugs an NER model in via mapInPandas without changing the shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: pattern name -> (regex, replacement token).  Order matters: earlier
#: patterns are redacted first (an email is matched before its digits
#: could be mistaken for a phone).
PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,14}\d", "<PHONE>"),
]


def pii_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII hit counts: doc_id | n_email | n_ipv4 | n_phone
    | n_pii."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(rx)).cast("long").alias(f"n_{name}")
        for name, rx, _ in PATTERNS
    ]
    out = docs.select(F.col(id_col).alias("doc_id"), *counts)
    total = None
    for name, _, _ in PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return out.withColumn("n_pii", total)


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Documents with PII spans replaced by type tokens; original
    columns preserved, ``text`` rewritten in place (row-local map —
    no shuffle, safe at any scale)."""
    col = F.col(text_col)
    for _, rx, token in PATTERNS:
        col = F.regexp_replace(col, rx, token)
    return docs.withColumn(text_col, col)
