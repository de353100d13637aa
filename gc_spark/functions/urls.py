"""URL kernels: canonicalization, validity, extension, fqdn, absolutization.

Native-column versions are used on hot paths (regexp/parse_url stay inside
whole-stage codegen); the canonicalizer and the byte-exact twins of the
reference helpers run as Arrow-batched pandas UDFs (no per-row Python UDFs).

Reference parity targets:
  - ensure_full_href_url   GCSpider.py:142-152
  - url_encode_spaces      GCSpider.py:154-159
  - get_href_file_extension GCSpider.py:104-116 (splitext semantics!)
  - get_fqdn_from_web_url  utils.py:84-86
  - is_valid_web_url       utils.py:60-76
  - abs_url                utils.py:79-81
  - mailto filter          GCSpider.py:19,168-173
"""

from __future__ import annotations

from os.path import splitext
from urllib.parse import urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

UNKNOWN_FILE_EXTENSION_PLACEHOLDER = "UNKNOWN"

# ---------------------------------------------------------------------------
# scalar twins (used inside pandas UDFs and by the test simulator)
# ---------------------------------------------------------------------------


def abs_url(base: str, target: str) -> str:
    """Scalar twin of reference utils.py:79-81 (plain urljoin)."""
    return urljoin(base, target)


def ensure_full_href_url(href_raw: str, url_base: str) -> str:
    if href_raw.startswith("/"):
        web_url = urljoin(url_base, href_raw)
    else:
        web_url = href_raw
    return web_url.strip()


def url_encode_spaces(href_raw: str) -> str:
    return href_raw.replace(" ", "%20")


def get_href_file_extension(url: str) -> str:
    path = urlparse(url).path
    ext = splitext(path)[1].replace(".", "").lower()
    if not ext:
        return UNKNOWN_FILE_EXTENSION_PLACEHOLDER
    return ext.strip()


def get_fqdn_from_web_url(url_string: str) -> str:
    return urlparse(url_string).netloc


def is_valid_web_url(url_string: str) -> bool:
    import re

    try:
        result = urlparse(url_string)
        return all(
            [
                result.scheme in ["http", "https"],
                bool(result.netloc) and not re.findall(r"\s", result.netloc),
                not re.findall(r"\s", result.path or ""),
            ]
        )
    except (AttributeError, ValueError):
        return False


def canonicalize_url(url: str) -> str:
    """Canonical form used for the URL-seen key.

    scheme/host lowercased, default ports dropped, spaces %20-encoded, empty
    path → '/', surrounding whitespace stripped. Query AND fragment kept
    verbatim: querystrings are significant in the reference (paginated API
    urls, sorn_spider.py:28-30) and fragments drive SPA routes that are
    distinct pages (air_force_spider.py:40-51 — nine start_urls differing
    only in '#/?view=cat&catID=N').
    """
    u = url_encode_spaces(url.strip())
    p = urlparse(u)
    scheme = p.scheme.lower()
    netloc = p.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    elif scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = p.path or "/"
    out = f"{scheme}://{netloc}{path}"
    if p.params:
        out += f";{p.params}"
    if p.query:
        out += f"?{p.query}"
    if p.fragment:
        out += f"#{p.fragment}"
    return out


# ---------------------------------------------------------------------------
# vectorized (Arrow-batched) column kernels
# ---------------------------------------------------------------------------


_FAST_URL_RE = (
    r"^(?P<scheme>https?)://(?P<netloc>[A-Za-z0-9.-]+)"
    r"(?P<path>/[^\s?#;]*)?(?P<query>\?[^\s#;]*)?$"
)


@pandas_udf(StringType())
def canonicalize_url_udf(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer: a pandas str.extract fast path covers plain
    http(s) URLs (no port/params/fragment/spaces — the overwhelming majority
    of a real frontier); anything else falls back to the byte-exact scalar.
    Equivalence fast-vs-scalar is property-tested (test_functions)."""
    s = urls.str.strip()
    parts = s.str.extract(_FAST_URL_RE)
    fast = parts["scheme"].notna()
    out = pd.Series([None] * len(s), index=s.index, dtype=object)
    if fast.any():
        q = parts.loc[fast, "query"].fillna("")
        q = q.where(q != "?", "")  # bare '?' == empty query (urlparse drops it)
        out[fast] = (
            parts.loc[fast, "scheme"].str.lower()
            + "://"
            + parts.loc[fast, "netloc"].str.lower()
            + parts.loc[fast, "path"].fillna("/")
            + q
        )
    slow = (~fast) & s.notna()
    if slow.any():
        out[slow] = s[slow].map(canonicalize_url)
    return out


@pandas_udf(StringType())
def abs_url_udf(base: pd.Series, target: pd.Series) -> pd.Series:
    """Vectorized utils.py:79-81 urljoin."""
    return pd.Series(
        [urljoin(b, t) if (b is not None and t is not None) else None for b, t in zip(base, target)]
    )


@pandas_udf(StringType())
def ensure_full_href_url_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [
            ensure_full_href_url(h, b) if (h is not None and b is not None) else None
            for h, b in zip(href, base)
        ]
    )


@pandas_udf(StringType())
def file_extension_udf(urls: pd.Series) -> pd.Series:
    """Byte-exact splitext-based extension (handles '.hidden', 'a..b', etc.)."""
    return urls.map(lambda u: get_href_file_extension(u) if u is not None else None)


@pandas_udf(BooleanType())
def is_valid_web_url_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: is_valid_web_url(u) if u is not None else False)


# ---------------------------------------------------------------------------
# native-column fast paths (JVM-side, whole-stage codegen)
# ---------------------------------------------------------------------------


def url_encode_spaces_col(col: Column) -> Column:
    """GCSpider.py:154-159 — single regexp_replace, stays in codegen."""
    return F.regexp_replace(col, " ", "%20")


def canonicalize_url_col(col: Column) -> Column:
    """Fully-native canonicalizer (whole-stage codegen, no Python) for URLs
    that already passed is_valid_web_url: lower scheme+netloc, drop default
    port, '' path → '/', %20-encode spaces, keep query/params/fragment.
    Property-tested byte-equal to the scalar canonicalize_url on valid URLs
    (test_functions). Use on the frontier hot path; the pandas UDF twin
    handles arbitrary strings."""
    # r6: pure byte-level string ops (substring_index / instr / substring)
    # replace the previous 9-regex chain — each regexp re-scanned the URL
    # through the Java regex engine per row on the 4M-row frontier hot path
    # (guide §1.2 per-task work). Byte-parity with the scalar on valid
    # ';'-free URLs is pinned by test_canonicalize_native_col_parity.
    u = F.regexp_replace(F.trim(col), " ", "%20")
    scheme_raw = F.substring_index(u, "://", 1)
    scheme = F.lower(scheme_raw)
    after = F.substring(u, F.length(scheme_raw) + 4, F.length(u))

    def _first_of(s, chars):
        """1-based position of the first occurrence of any char, else null."""
        pos = [F.nullif(F.instr(s, c), F.lit(0)) for c in chars]
        return F.least(*pos) if len(pos) > 1 else pos[0]

    cut = F.coalesce(_first_of(after, ["/", "?", "#"]), F.length(after) + 1)
    netloc = F.lower(F.substring(after, 1, cut - 1))
    rest = F.substring(after, cut, F.length(after))
    netloc_stripped = F.when(
        (scheme == "http") & netloc.endswith(":80"),
        F.substring(netloc, 1, F.length(netloc) - 3),
    ).when(
        (scheme == "https") & netloc.endswith(":443"),
        F.substring(netloc, 1, F.length(netloc) - 4),
    ).otherwise(netloc)
    qcut = F.coalesce(_first_of(rest, ["?", "#"]), F.length(rest) + 1)
    path = F.substring(rest, 1, qcut - 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tail = F.substring(rest, qcut, F.length(rest))
    # urlparse drops an empty query ('?' with nothing before '#'/end) —
    # literal-replace '?#'->'#' plus a trailing-'?' strip is byte-equal to
    # the old \?(?=#|$) regex on every input; ';' params are kept verbatim
    # in the path (byte-parity with the scalar is guaranteed — and
    # property-tested — for ';'-free URLs; legacy multi-';' params URLs
    # route through the pandas UDF in the engine)
    tail = F.replace(tail, F.lit("?#"), F.lit("#"))
    tail = F.when(
        tail.endswith("?"), F.substring(tail, 1, F.length(tail) - 1)
    ).otherwise(tail)
    return F.concat(scheme, F.lit("://"), netloc_stripped, path, F.coalesce(tail, F.lit("")))


def encode_url_params(params: dict) -> str:
    """GCSpider.py:175-178 — dict → querystring."""
    import urllib.parse

    return urllib.parse.urlencode(params)


def in_allowed_domains_col(host_col: Column, allowed_col: Column) -> Column:
    """F7 domain-scope filter (Scrapy allowed_domains offsite rule): True when
    the allowed list is empty/null, else when host equals a domain or is a
    subdomain of one. Native expressions only."""
    no_scope = allowed_col.isNull() | (F.size(allowed_col) == 0)
    matches = F.exists(
        allowed_col,
        lambda d: (host_col == d) | host_col.endswith(F.concat(F.lit("."), d)),
    )
    return no_scope | matches


def fqdn_col(col: Column) -> Column:
    """Hostname via built-in parse_url (lowercased netloc sans userinfo).

    Fast path for grouping/politeness; byte-exact twin is
    get_fqdn_from_web_url (urlparse.netloc keeps port + userinfo).
    """
    return F.lower(F.parse_url(col, F.lit("HOST")))


def is_mailto_col(col: Column) -> Column:
    """GCSpider.py:19 mailto_re, case-insensitive."""
    return col.rlike(r"(?i)mailto:")


def filter_mailto(df, href_col: str):
    """GCSpider.py:168-173 as a DataFrame filter."""
    return df.filter(~is_mailto_col(F.col(href_col)))


def file_extension_col(col: Column) -> Column:
    """Native approximation of get_href_file_extension for the common case
    (basename contains a non-leading dot); exact twin is file_extension_udf.
    """
    path = F.parse_url(col, F.lit("PATH"))
    ext = F.regexp_extract(path, r"[^/.][^/]*\.([^./]+)$", 1)
    return F.when(ext == "", F.lit(UNKNOWN_FILE_EXTENSION_PLACEHOLDER)).otherwise(F.lower(ext))


# A pragmatic public-suffix subset for registrable-domain grouping. The
# real list (publicsuffix.org) is ~9k entries — it broadcasts the same
# way; this module keeps the mechanism and a useful default.
DEFAULT_PUBLIC_SUFFIXES = (
    "com", "org", "net", "mil", "gov", "edu", "int", "io",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ac.jp", "go.jp",
)


def registrable_domain_col(
    host_col: Column, suffixes: tuple = DEFAULT_PUBLIC_SUFFIXES
) -> Column:
    """eTLD+1: the registrable domain of a hostname — the grain politeness
    budgets, seen-set salting, and host reputation SHOULD key on
    ('a.cdn.example.co.uk' and 'b.cdn.example.co.uk' are one crawl target,
    'example.co.uk'; two tenants of 'github.io' are NOT one). Longest
    matching public suffix wins, then one more label is kept; a bare
    suffix or unknown TLD passes through unchanged (conservative: never
    merge what we can't prove shares a registrant).

    Pure expressions over a split-label array with the suffix set inlined
    as literals (the full PSL would broadcast identically); no UDF, no
    shuffle — composes with fqdn_col upstream of any host-keyed operator.
    """
    labels = F.split(F.lower(host_col), r"\.")
    n = F.size(labels)
    out = F.lower(host_col)
    # build shortest-first so the LONGEST suffix's when() wraps outermost
    # and wins when both lengths match ('co.uk' beats a hypothetical 'uk')
    for k in sorted({s.count(".") + 1 for s in suffixes}):
        ks = [s for s in suffixes if s.count(".") + 1 == k]
        tail = F.array_join(F.slice(labels, n - k + 1, k), ".")
        cand = F.array_join(F.slice(labels, n - k, k + 1), ".")
        out = F.when((n > k) & tail.isin(*ks), cand).otherwise(out)
    return out
