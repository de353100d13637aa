"""Encoding-quality triage for crawled text: mojibake, lossy decodes,
control-character junk.

Crawl corpora are full of double-decoded UTF-8 (bytes decoded as
Latin-1/cp1252 → "cafÃ©", "â€™"), U+FFFD replacement characters from lossy
decodes, and stray control bytes from binary content mislabeled as text.
All three are cheap, high-precision signals a training-data pipeline
filters or re-decodes on (public practice: ftfy's mojibake heuristics,
CCNet/C4 charset filtering).

Everything is whole-stage-codegen regexp counting — one map pass, no
shuffle, no Python. The digraph alternation is a FIXED list of the most
common UTF-8-as-Latin-1 artifacts so the SQL oracle can count the exact
same literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The classic UTF-8-bytes-read-as-Latin-1/cp1252 digraphs ('e-acute' et al
# read as two Latin-1 chars) and the right-quote/dash/ellipsis family, plus
# the double-decoded NBSP. Fixed literals, not a byte-range regex.
# Each artifact spelled with explicit escapes (several contain invisible
# codepoints: \u009d, \u00ad). No alternative is a prefix of another, so
# leftmost-first (Java) and RE2 (DuckDB) count identically.
MOJIBAKE_PATTERN = "|".join(
    [
        "\u00c3\u00a9",  # e-acute read as Latin-1
        "\u00c3\u00a8",
        "\u00c3\u00a1",
        "\u00c3\u00a4",
        "\u00c3\u00b6",
        "\u00c3\u00bc",
        "\u00c3\u00b1",
        "\u00c3\u00a7",
        "\u00c3\u00ad",
        "\u00c3\u00b3",
        "\u00c3\u00ba",
        "\u00e2\u0080\u0099",  # curly apostrophe
        "\u00e2\u0080\u0098",
        "\u00e2\u0080\u009c",
        "\u00e2\u0080\u009d",
        "\u00e2\u0080\u0093",  # dashes
        "\u00e2\u0080\u0094",
        "\u00e2\u0080\u00a6",  # ellipsis
        "\u00c2\u00a0",  # double-decoded NBSP
    ]
)
REPLACEMENT_CHAR = "�"
# C0 controls except tab/newline/carriage-return
CTRL_PATTERN = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def encoding_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_mojibake, n_replacement, n_ctrl, nonascii_ratio, verdict).

    verdict precedence: mojibake > lossy_decode (U+FFFD present) >
    binary_junk (control bytes) > clean."""
    t = F.col(text_col)
    n_moji = F.regexp_count(t, F.lit(MOJIBAKE_PATTERN))
    n_repl = F.regexp_count(t, F.lit(REPLACEMENT_CHAR))
    n_ctrl = F.regexp_count(t, F.lit(CTRL_PATTERN))
    n_nonascii = F.length(F.regexp_replace(t, "[\\x00-\\x7f]", ""))
    ratio = F.when(
        F.length(t) > 0, F.round(n_nonascii / F.length(t), 6)
    ).otherwise(F.lit(0.0))
    verdict = (
        F.when(n_moji > 0, F.lit("mojibake"))
        .when(n_repl > 0, F.lit("lossy_decode"))
        .when(n_ctrl > 0, F.lit("binary_junk"))
        .otherwise(F.lit("clean"))
    )
    return df.select(
        F.col(id_col),
        n_moji.alias("n_mojibake"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_ctrl"),
        ratio.alias("nonascii_ratio"),
        verdict.alias("verdict"),
    )
