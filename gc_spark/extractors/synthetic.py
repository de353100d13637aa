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
