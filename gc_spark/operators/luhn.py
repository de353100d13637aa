"""Payment-card (PAN) detection with Luhn checksum validation.

A digit-run regex alone drowns in false positives (timestamps, IDs,
phone numbers); the Luhn check (ISO/IEC 7812 — public standard) kills the
overwhelming majority of non-card 13-19 digit runs, which is why every
DLP scanner pairs the two. This is the structured-PII complement to the
email/phone redaction in functions/text.redact_pii_col.

The checksum is a pure expression fold (aggregate over a 1..len sequence,
digit doubling with the >9 - 9 correction) — whole-stage codegen, no UDF.
Candidates are rare relative to corpus size, so the explode is cheap; the
operator is map-side only (no shuffle). Detected PANs are emitted MASKED
(first6 + '*' + last4) — the detector must not itself become the leak.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAN_RE = r"\d{13,19}"


def luhn_valid_col(cand: Column) -> Column:
    """True iff the digit string passes the Luhn checksum. Fold from the
    RIGHT (reverse + 1-based index): even positions double, subtract 9
    when the doubled digit exceeds 9, total must be ≡ 0 mod 10."""
    rev = F.reverse(cand)
    term = lambda j: (  # noqa: E731
        F.when(
            j % 2 == 0,
            F.when(
                rev.substr(j, F.lit(1)).cast("int") * 2 > 9,
                rev.substr(j, F.lit(1)).cast("int") * 2 - 9,
            ).otherwise(rev.substr(j, F.lit(1)).cast("int") * 2),
        ).otherwise(rev.substr(j, F.lit(1)).cast("int"))
    )
    total = F.aggregate(
        F.sequence(F.lit(1), F.length(cand)),
        F.lit(0),
        lambda acc, j: acc + term(j),
    )
    return total % 10 == 0


def pan_findings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, masked, n_digits, luhn_valid) — one row per 13-19 digit run.
    The raw PAN never leaves the operator: masked = first6 + '*' + last4."""
    cand = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(PAN_RE), 0)
    ).alias("_cand")
    occ = df.select(F.col(id_col), cand)
    c = F.col("_cand")
    masked = F.concat(
        F.substring(c, 1, 6),
        F.lit("*"),
        F.substring(c, -4, 4),
    )
    return occ.select(
        id_col,
        masked.alias("masked"),
        F.length(c).alias("n_digits"),
        luhn_valid_col(c).alias("luhn_valid"),
    )
