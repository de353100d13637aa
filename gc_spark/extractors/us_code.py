"""us_code extractor — field-derivation parity with the reference spider
(us_code_spider.py:49-113) against the synthetic recreation of the
uscode.house.gov download listing.

Semantics reproduced (and pinned by the golden fixtures):
  - rows = div.uscitem excluding id='alltitles'           (:50)
  - doc_type_num_title_raw = first child div text          (:55)
  - appendix rows inherit prev_doc_num (sequential lag W1) (:61-63)
  - reserved titles (empty doc_title) skipped              (:70-71)
  - doc_title: ascii_clean then ','/'\'' stripped          (:67,73)
  - doc_name = 'Title {num} - {title}'                     (:74)
  - version hash fields = {item_currency, doc_name}        (:80, golden form)
  - downloadable link: title contains 'PDF' → doc_type pdf,
    compression zip, web_url prefixed                      (:83-96)

Parsing uses stdlib html.parser (no lxml in this environment); the synthetic
page generator (tests/fixtures.py) emits the same DOM shape the reference
selects on.
"""

from __future__ import annotations

from html.parser import HTMLParser

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.hashing import dict_to_sha256_hex_digest
from gc_spark.functions.text import ascii_clean

PART = " - "
DOWNLOAD_PREFIX = "https://uscode.house.gov/download/"


class _ListingParser(HTMLParser):
    """Collect per-uscitem: first-div text, appendix flag, currency, links."""

    def __init__(self):
        super().__init__()
        self.items: list[dict] = []
        self._cur: dict | None = None
        self._div_depth = 0
        self._capture: str | None = None

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "div":
            cls = a.get("class", "")
            if "uscitem" in cls.split():
                self._cur = {
                    "id": a.get("id"),
                    "first_div": None,
                    "appendix": False,
                    "currency": None,
                    "links": [],
                }
                self._div_depth = 0
                return
            if self._cur is not None:
                self._div_depth += 1
                if "usctitleappendix" in cls.split():
                    self._cur["appendix"] = True
                if "itemcurrency" in cls.split():
                    self._capture = "currency"
                elif self._cur["first_div"] is None and self._div_depth == 1:
                    self._capture = "first_div"
        elif tag == "a" and self._cur is not None:
            self._cur["links"].append(
                {"title": a.get("title", ""), "href": a.get("href", "")}
            )

    def handle_endtag(self, tag):
        if tag == "div" and self._cur is not None:
            if self._div_depth == 0:
                self.items.append(self._cur)
                self._cur = None
            else:
                self._div_depth -= 1
                self._capture = None

    def handle_data(self, data):
        if self._cur is not None and self._capture:
            prev = self._cur.get(self._capture) or ""
            self._cur[self._capture] = prev + data


@register
class USCodeExtractor(Extractor):
    source = "us_code"
    doc_type = "Title"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        p = _ListingParser()
        p.feed(body)
        docs: list[dict] = []
        prev_doc_num = None

        for row in p.items:
            if row["id"] == "alltitles":
                continue
            raw = row["first_div"] or ""
            doc_type_num_raw, _, doc_title_raw = raw.partition(PART)

            if row["appendix"] and prev_doc_num:
                doc_num = prev_doc_num
                doc_title = "Appendix"
            else:
                doc_num = ascii_clean(doc_type_num_raw.replace("Title", ""))
                prev_doc_num = doc_num
                doc_title = ascii_clean(doc_title_raw)

            if not doc_title:  # reserved title rows (e.g. Title 53)
                continue

            doc_title = doc_title.replace(",", "").replace("'", "")
            doc_name = f"{self.doc_type} {doc_num}{PART}{doc_title}"
            item_currency = ascii_clean(row["currency"] or "")

            # the reference hashes the RAW first-div text, NOT the cleaned
            # doc_name (us_code_spider.py:80 doc_type_num_title_raw) — equal
            # on ascii titles without ,/' but diverges otherwise, which would
            # cause spurious re-downloads against reference-written manifests
            version_hash_fields = {"item_currency": item_currency, "doc_name": raw}
            version_hash = dict_to_sha256_hex_digest(version_hash_fields)

            downloadable_items = []
            for link in row["links"]:
                if "PDF" in (link["title"] or ""):
                    web_url = f"{DOWNLOAD_PREFIX}{link['href']}"
                    downloadable_items.append(
                        {
                            "doc_type": "pdf",
                            "download_url": web_url,
                            "compression_type": "zip",
                        }
                    )
            if not downloadable_items:
                continue

            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": self.doc_type,
                    "display_doc_type": "Title",
                    "publication_date": "N/A",
                    "cac_login_required": "false",
                    "download_url": downloadable_items[0]["download_url"],
                    "downloadable_items": downloadable_items,
                    "version_hash_raw_data": version_hash_fields,
                    "version_hash": version_hash,
                }
            )
        # listing page yields no follow links (single-page source)
        return [], docs
