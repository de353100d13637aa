"""Consistent PII pseudonymization: replace every occurrence of an
identifier (emails here; any regex class plugs in) with a SALTED-HASH
pseudonym that is stable corpus-wide — the anonymization step that keeps
referential structure ("same author across documents") while unlinking
identity, and the standard alternative to q47's destructive redaction
(public practice: keyed/pseudorandom pseudonymization, e.g. GDPR Art. 4(5)
style key-separated pseudonyms).

Pseudonym = 'user-' + sha256(salt | identifier)[:12] + '@anon.invalid'.
Rotating the salt unlinks releases from each other; dropping the salt is
the key destruction that makes the mapping irrecoverable.

Scale shape: pseudonym assignment is PURE MAP-SIDE (a hash, no mapping
table, no global rank window, no shuffle) — this is why keyed hashing
beats sequential 'user1/user2' naming at 10^10 docs, where the compact-
name approach needs a vocabulary-wide ordered rank. The stats rollup
(n_docs, first_doc per identifier) is one aggregate over the extracted
occurrences, vocabulary-sized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonym_map(
    df: DataFrame,
    pattern: str,
    salt: str = "r3",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(pii, pseudonym, n_docs, first_doc) for every identifier matching
    `pattern` anywhere in the corpus."""
    occ = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).alias(
            "pii"
        ),
    )
    pseudo = F.concat(
        F.lit("user-"),
        F.substring(F.sha2(F.concat(F.lit(salt + "|"), F.col("pii")), 256), 1, 12),
        F.lit("@anon.invalid"),
    )
    return occ.groupBy("pii").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.min(id_col).alias("first_doc"),
    ).select("pii", pseudo.alias("pseudonym"), "n_docs", "first_doc")


def apply_pseudonyms(
    df: DataFrame,
    pattern: str,
    salt: str = "r3",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, text) with every `pattern` match rewritten to its pseudonym —
    map-side: each match hashes in place via one regexp split/fold, no
    join against a mapping table."""
    # regexp_replace can't compute per-match replacements, so fold the
    # extracted distinct matches: replace each one in the text. Longest
    # match first — if one identifier is a substring of another (b@c.com
    # inside ab@c.com), replacing the shorter first would corrupt the
    # longer occurrence and leak a partial identifier.
    matches = F.array_sort(
        F.array_distinct(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
        ),
        lambda l, r: F.when(F.length(l) != F.length(r), F.length(r) - F.length(l))
        .when(l < r, F.lit(-1))
        .when(l > r, F.lit(1))
        .otherwise(F.lit(0)),
    )
    rewritten = F.aggregate(
        matches,
        F.col(text_col),
        lambda acc, m: F.replace(
            acc,
            m,
            F.concat(
                F.lit("user-"),
                F.substring(F.sha2(F.concat(F.lit(salt + "|"), m), 256), 1, 12),
                F.lit("@anon.invalid"),
            ),
        ),
    )
    return df.select(F.col(id_col), rewritten.alias(text_col))
