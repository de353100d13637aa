"""Extractor for the deterministic synthetic multi-host site
(tests/fixtures.py `build_scale_site`) — exercises pagination expansion
(X3: one page → N detail links + 1 next-page link, reference
executive_orders_spider.py:77-88 / air_force_spider.py:103-126),
interleaved text+media span assembly, and host-skew politeness.

Page shapes generated (and parsed — both sides of the contract live in this
repo, mirroring how the reference's golden test pins its spider):
  listing: <li><a href="/doc/N">…  plus optional <a rel="next" href="…">
  detail:  <h1>{doc_name}</h1><span class="date">{date}</span>
           then interleaved <p>text</p> / <img src="blob://sha256/…">
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.hashing import dict_to_sha256_hex_digest

LINK_RE = re.compile(r'<a(?P<attrs>[^>]*)href="(?P<href>[^"]+)"[^>]*>')
REL_NEXT_RE = re.compile(r'rel="next"')
H1_RE = re.compile(r"<h1>([^<]*)</h1>")
DATE_RE = re.compile(r'<span class="date">([^<]*)</span>')
SEG_RE = re.compile(r'<p>([^<]*)</p>|<img src="([^"]+)"')


@register
class SyntheticExtractor(Extractor):
    source = "synthetic"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "listing":
            links = []
            for m in LINK_RE.finditer(body):
                href = m.group("href")
                links.append(urljoin(url, href))
            return links, []

        if kind == "detail":
            name_m = H1_RE.search(body)
            if not name_m:
                return [], []
            doc_name = name_m.group(1)
            date_m = DATE_RE.search(body)
            pub_date = date_m.group(1) if date_m else None
            segments = []
            for m in SEG_RE.finditer(body):
                text, media = m.group(1), m.group(2)
                if text is not None:
                    segments.append({"kind": "text", "payload": text})
                else:
                    segments.append({"kind": "media", "payload": media})
            raw = {"doc_name": doc_name, "source_page_url": url}
            return [], [
                {
                    "doc_name": doc_name,
                    "doc_title": doc_name,
                    "doc_num": None,
                    "doc_type": "Document",
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": None,
                    "downloadable_items": [],
                    "version_hash_raw_data": raw,
                    "segments": segments,
                }
            ]
        return [], []


# -- native-expression twin ---------------------------------------------------
# The synthetic family's page shapes are regex-expressible, so its parse runs
# as whole-stage-codegen expressions instead of Arrow-batched Python — the
# engine-bench extract stage drops out of Python entirely. Parity with the
# pandas path is pinned by tests/test_sources.py::TestNativeExtractorParity.

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_LINK_PAT = r'<a[^>]*href="([^"]+)"[^>]*>'
_H1_PAT = r"<h1>([^<]*)</h1>"
_DATE_PAT = r'<span class="date">([^<]*)</span>'
_SEG_PAT = r'<p>([^<]*)</p>|<img src="([^"]+)"'


def _abs_href(url, href):
    """Native urljoin for the href shapes this family emits: absolute,
    root-relative, and plain relative (no ../ traversal — the pandas twin's
    urljoin remains the general reference)."""
    scheme_host = F.concat(
        F.regexp_extract(url, r"^(https?:)//", 1),
        F.lit("//"),
        F.parse_url(url, F.lit("HOST")),
    )
    base_dir = F.regexp_replace(url, r"/[^/]*$", "/")
    return (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("/"), F.concat(scheme_host, href))
        .otherwise(F.concat(base_dir, href))
    )


def _native_synthetic(df: DataFrame) -> DataFrame:
    body, url = F.col("body"), F.col("url")
    is_listing = (F.col("kind") == "listing") & body.isNotNull()
    is_detail = (F.col("kind") == "detail") & body.isNotNull() & body.rlike(_H1_PAT)

    links = F.when(
        is_listing,
        F.transform(
            F.regexp_extract_all(body, F.lit(_LINK_PAT), 1),
            lambda h: _abs_href(url, h),
        ),
    ).otherwise(F.array().cast("array<string>"))

    doc_name = F.regexp_extract(body, _H1_PAT, 1)
    pub_date = F.when(body.rlike(_DATE_PAT), F.regexp_extract(body, _DATE_PAT, 1))
    segments = F.transform(
        F.regexp_extract_all(body, F.lit(_SEG_PAT), 0),
        lambda m: F.struct(
            F.when(m.startswith("<p>"), F.lit("text")).otherwise(F.lit("media")).alias("kind"),
            F.when(
                m.startswith("<p>"), F.regexp_extract(m, r"<p>([^<]*)</p>", 1)
            ).otherwise(F.regexp_extract(m, r'<img src="([^"]+)"', 1)).alias("payload"),
        ),
    )
    doc_json = F.to_json(
        F.struct(
            doc_name.alias("doc_name"),
            doc_name.alias("doc_title"),
            F.lit("Document").alias("doc_type"),
            F.lit("Document").alias("display_doc_type"),
            pub_date.alias("publication_date"),
            F.lit("false").alias("cac_login_required"),
            F.array().cast(
                "array<struct<doc_type:string,download_url:string,compression_type:string>>"
            ).alias("downloadable_items"),
            F.create_map(
                F.lit("doc_name"), doc_name, F.lit("source_page_url"), url
            ).alias("version_hash_raw_data"),
            segments.alias("segments"),
        )
    )
    docs = F.when(is_detail, F.array(doc_json)).otherwise(F.array().cast("array<string>"))
    return df.select("url", "source", "depth", "seq", links.alias("links"), docs.alias("docs"))


SyntheticExtractor.native_extract = staticmethod(_native_synthetic)
