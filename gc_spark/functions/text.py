"""Text kernels: ascii_clean (byte-exact), squash_spaces, fix_oprs,
display-title concat.

Reference parity targets:
  - ascii_clean     GCSpider.py:133-140 (nbsp/quote fixes → ascii-ignore → strip)
  - squash_spaces   air_force_spider.py:23 (r'\\s*[\\n\\t\\r\\s+]\\s*' → ' ')
  - fix_oprs        dod_issuances_spider.py:46-56 (strip phones + emails)
  - display_title   doc_item_fields.py:42 (doc_type + " " + doc_num + ": " + doc_title)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

PHONE_RE = r"\(?\b[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b"
EMAIL_RE = r"[\w.+-]+@[\w-]+\.[\w.-]+"


def ascii_clean(text: str) -> str:
    """Scalar twin, reference GCSpider.py:133-140 verbatim semantics."""
    return (
        text.replace(" ", " ")
        .replace("’", "'")
        .replace("&#39;", "'")
        .replace("&nbsp;", " ")
        .encode("ascii", "ignore")
        .decode("ascii")
        .strip()
    )


@pandas_udf(StringType())
def ascii_clean_udf(s: pd.Series) -> pd.Series:
    """Vectorized ascii_clean: pandas str ops end-to-end (Arrow batches)."""
    out = (
        s.str.replace(" ", " ", regex=False)
        .str.replace("’", "'", regex=False)
        .str.replace("&#39;", "'", regex=False)
        .str.replace("&nbsp;", " ", regex=False)
        .str.encode("ascii", errors="ignore")
        .str.decode("ascii")
        .str.strip()
    )
    return out


def squash_spaces_col(col: Column) -> Column:
    """air_force_spider.py:23 — collapse whitespace runs, native regexp."""
    return F.regexp_replace(col, r"\s*[\n\t\r\s+]\s*", " ")


def fix_oprs_col(col: Column) -> Column:
    """dod_issuances_spider.py:46-56 — remove phone numbers and emails,
    then squash leftover space runs and trim."""
    no_phone = F.regexp_replace(col, PHONE_RE, "")
    no_email = F.regexp_replace(no_phone, EMAIL_RE, "")
    return F.trim(F.regexp_replace(no_email, r"\s+", " "))


def display_title_col(doc_type: Column, doc_num: Column, doc_title: Column) -> Column:
    """doc_item_fields.py:42 / us_code_spider.py:135."""
    return F.concat(doc_type, F.lit(" "), doc_num, F.lit(": "), doc_title)


def display_map_col(col: Column, mapping: dict[str, str], default: Column | None = None) -> Column:
    """C13 display-type lookup maps (dod_issuances_spider.py:30-40,
    jcs_pubs_spider.py:22-34): a small dict as a literal create_map lookup —
    stays in codegen, no join."""
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    looked = F.create_map(*pairs)[col]
    return F.coalesce(looked, default if default is not None else col)


def squash_spaces(text: str) -> str:
    import re

    return re.sub(r"\s*[\n\t\r\s+]\s*", " ", text)


# -- training-data kernels ---------------------------------------------------

ROLLING_BASE = 257
ROLLING_MOD = 2_147_483_647  # 2^31 - 1: h*B + c stays < 2^40, exact in int64


def rolling_hash_col(col: Column) -> Column:
    """Polynomial rolling hash over the characters of a string:
    h = fold(h * 257 + code(c)) mod (2^31 - 1) — the classic Rabin-Karp
    document fingerprint. Pure JVM expressions (split + aggregate fold), and
    the modulus keeps every intermediate exact in signed-64 arithmetic, so
    ANSI SQL / DuckDB reproduces it bit-for-bit (list_reduce twin)."""
    chars = F.split(col, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % ROLLING_MOD,
    )


BPE_ISH_PATTERN = r"\w+|[^\w\s]"


def bpe_ish_tokens_col(col: Column) -> Column:
    """BPE-ish token segmentation: runs of word characters OR single
    non-space symbols — the pre-tokenization split BPE vocabularies apply
    before merges. regexp_extract_all keeps the pattern inside RE2's subset,
    so DuckDB (regexp_extract_all) reproduces it exactly. Returns the token
    array; count with F.size."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bind_once(arr: Column, f) -> Column:
    """Let-binding for array expressions: evaluate `arr` ONCE per row and
    pass the bound value to `f`. Spark's higher-order functions are
    interpreted (CodegenFallback) and re-evaluate any non-lambda-variable
    subtree on EVERY element access — referencing an O(len) array (or
    worse, an array of sha256s) inside a transform/filter lambda turns a
    linear kernel into a quadratic one (measured: winnowing 99.7 s -> 1.8 s
    at sf0.1). Lambda ARGUMENTS are bound values, so wrapping the array in
    a 1-element outer array and transforming over it gives the binding:
    transform(array(arr), x -> f(x))[0]."""
    return F.transform(F.array(arr), f)[0]


def word_ngrams_col(col: Column, n: int) -> Column:
    """Word n-gram array (native; shares the shingle shape of
    operators/text_dedup._shingles but parameterized on n). Token array
    bound once (bind_once) so each n-gram slice is O(n), not a re-split."""
    toks = F.split(F.trim(col), r"\s+")
    return bind_once(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    )


def top_ngram_frac_col(col: Column, n: int) -> Column:
    """Gopher-style repetition metric: occurrences of the MOST frequent word
    n-gram divided by total n-grams. Catches boilerplate / template spam
    (nav bars, cookie banners, SEO keyword stuffing).

    Computed as the longest equal-run of the SORTED n-gram array — one
    array_sort + one aggregate fold with a (prev, run, best) struct
    accumulator: O(n log n) per row instead of the naive
    O(distinct * total) count-per-distinct (which also duplicates the
    n-gram subtree per reference — measured 8x slower at sf0.1). Entirely
    map-side, no shuffle, so at 100 TB it rides the same scan as every
    other per-doc metric. The DuckDB oracle keeps the naive list_max form
    (struct-typed fold accumulators aren't expressible in list_reduce);
    both compute the same max frequency."""
    g = word_ngrams_col(col, n)
    run = F.aggregate(
        F.array_sort(g),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return F.round(run["best"].cast("double") / F.size(g), 6)


def dup_word_frac_col(col: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier word:
    1 - distinct/total (Gopher's duplicate-content family)."""
    toks = F.split(F.trim(col), r"\s+")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
    )


# RE2-safe PII patterns (no lookarounds): both engines run them verbatim
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}-\d{4}\b"


def redact_pii_col(col: Column) -> Column:
    """PII scrub for training corpora: emails then phone-shaped digit runs
    replaced by typed placeholder tokens. Order matters (the email pattern
    would otherwise leave its host part eligible for the phone pattern);
    both regexes stay inside RE2's subset so the oracle is exact."""
    no_email = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def count_pattern_col(col: Column, pattern: str) -> Column:
    """Occurrence count of an RE2 pattern (len of extract_all — the form
    DuckDB shares, avoiding engine-specific regexp_count semantics)."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def char_entropy_col(col: Column) -> Column:
    """Shannon entropy (bits/char) of the character distribution — a cheap
    quality/noise signal for training corpora: near-zero for degenerate
    repeats ('aaaa…'), ~4.1 for English prose, >5 for base64/binary junk;
    filters the two failure tails length/stopword ratios (quality_score,
    q14) miss. Computed as log2(n) - (1/n)·Σ c·log2(c) over per-character
    counts: one count per DISTINCT character via size(filter(...)), which
    is O(alphabet × len) — alphabet-bounded (≤ a few hundred for text), so
    it stays a pure map-side array expression riding the same scan as every
    other per-doc metric; no shuffle, no Python."""
    def _h(ch: Column) -> Column:
        n = F.size(ch)
        counts = F.transform(
            F.array_distinct(ch),
            lambda d: F.size(F.filter(ch, lambda c: c == d)),
        )
        sum_clogc = F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, c: acc + c.cast("double") * F.log2(c.cast("double")),
        )
        return F.log2(n.cast("double")) - sum_clogc / n

    return bind_once(F.filter(F.split(col, ""), lambda c: c != ""), _h)


def _sha60_local(col: Column) -> Column:
    """Portable 60-bit hash (first 15 hex chars of sha256 as a long) — the
    cross-engine kernel shared with operators/text_dedup.sha60_col; DuckDB
    twin: CAST('0x' || substr(sha256(x), 1, 15) AS BIGINT)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")


def cdc_chunks_col(col: Column, w: int = 8, divisor: int = 32) -> Column:
    """Content-defined chunking (basic Rabin-style CDC): cut the text
    wherever the hash of the w-char window starting there is divisible by
    `divisor` (expected chunk ~`divisor` chars). Because boundaries depend
    on CONTENT, an insertion shifts only the chunks it touches — unlike
    fixed-width chunking where one inserted byte re-keys every later chunk.
    That is the delta-storage primitive for recrawls: store chunk hashes
    per URL, and a changed page re-uploads only the chunks whose hashes are
    new (rsync/LBFS lineage; the version-hash C7 kernel detects THAT a page
    changed, this bounds the bytes stored for HOW it changed).

    Returns array<struct<start:int, chunk_sha:long>> — 1-based chunk start
    offsets and the portable 60-bit hash of each chunk's bytes. Pure
    map-side array expressions (one sha256 per window + one per chunk),
    same scan-riding shape as winnowing."""
    n = F.length(col)
    pos = F.sequence(F.lit(2), F.greatest(n - (w - 1), F.lit(2)))
    bnds = F.filter(
        pos,
        # full windows only: a text shorter than w has no cut candidates
        lambda i: (i <= n - (w - 1))
        & (_sha60_local(col.substr(i, F.lit(w))) % divisor == 0),
    )
    # bind the cut array ONCE: indexing `cuts` inside the chunk lambda
    # would re-run the boundary filter (one sha256 per window) per chunk
    return bind_once(
        F.concat(F.array(F.lit(1)), bnds, F.array(n + 1)),
        lambda cuts: F.transform(
            F.sequence(F.lit(1), F.size(cuts) - 1),
            lambda j: F.struct(
                F.element_at(cuts, j).cast("int").alias("start"),
                _sha60_local(
                    col.substr(
                        F.element_at(cuts, j),
                        F.element_at(cuts, j + 1) - F.element_at(cuts, j),
                    )
                ).alias("chunk_sha"),
            ),
        ),
    )


def winnow_fingerprints_col(col: Column, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every character k-gram, slide a window of w hashes,
    keep each window's minimum — guaranteed to share fingerprints with any
    document that shares a substring of length >= k + w - 1, at ~1/w the
    storage of full k-gram sets. Returns the SORTED DISTINCT fingerprint
    array (the canonical set form). Pure array expressions: one sha256 per
    k-gram, map-side only, no shuffle — the robust-local-dedup complement
    to minhash (which needs whole-document similarity)."""
    n = F.length(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(k)),
    )
    # bind the hash array ONCE: referencing it inside the window lambda
    # would recompute every k-gram sha256 per window — O(len^2) hashes.
    # The window minimum is least() over w element_at lookups, NOT
    # array_min(slice(...)): slice allocates a w-element array per window
    # and HOFs run interpreted, so the allocation churn cost ~1.5x
    # (measured 0.51 -> 0.33 s on the sf0.1 corpus; w is a plan-time int)
    wins = bind_once(
        F.transform(grams, _sha60_local),
        lambda h: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(h) - (w - 1), F.lit(1))),
            lambda j: F.least(*[F.element_at(h, j + i) for i in range(w)]),
        ),
    )
    return F.array_sort(F.array_distinct(wins))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_cols(
    col: Column,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> list[Column]:
    """Gopher-style document quality rules (Rae et al. 2021, arXiv:
    2112.11446 §A1.1) as pure native expressions — word-count bounds, mean
    word length window, symbol-to-word ratio (# and ... as in the paper),
    alphabetic-word fraction, and a stopword floor; `quality_pass` is the
    conjunction. One filter pass over a 100 TB corpus stays entirely in
    whole-stage codegen — no Python, no shuffle. Ratios are rounded to 6
    digits BEFORE the threshold compare so pass/fail decisions are
    reproducible across engines (same contract as similarity ops). Returns
    aliased columns; project them in one select so the token array is
    shared per-row."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
    n_words = F.size(toks)
    nw = n_words.cast("double")
    mean_wl = F.round(
        F.aggregate(toks, F.lit(0.0), lambda s, t: s + F.length(t)) / nw, 6
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / nw, 6
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )
    n_hash = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.round((n_hash + n_ellipsis) / nw, 6)
    quality_pass = (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio < max_symbol_ratio)
        & (alpha_frac > min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    return [
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        symbol_ratio.alias("symbol_ratio"),
        quality_pass.alias("quality_pass"),
    ]
