"""Executive-orders extractor — the Federal Register JSON-API family.

Reference: spiders/executive_orders_spider.py
  - parse (:70-75): landing page → the bulk-JSON link (2nd <a> inside
    span.links of the bulk-files list)
  - parse_data_page (:77-88): results[].json_url follows + next_page_url
  - populate_doc_item (:115-180): EO-specific field derivation and the
    EO-specific version-hash dict (publication_date, signing_date,
    disposition_notes, doc_name, doc_num, download_url, display_title)
  - get_downloadables (:39-67): pdf/xml/txt triple
  - CHAMPUS skip (:140-145): doc 12988 with CHAMPUS in the title is a
    mis-numbered OSD notice, not an EO

Deviation (documented): the reference resolves a missing EO number by
fetching raw_text_url and regexing the body (:104-116) — a cross-page
meta-carry. A stateless extractor can't do that hop; we apply the
reference's terminal fallback (doc_name from title, :151) directly. The
engine's pending-docs join (marine_corp family) is the distributed home for
that pattern if number-sniffing is ever needed.
"""

from __future__ import annotations

import json
import re

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.dates import get_pub_date

LINKS_SPAN_RE = re.compile(r'<span class="links">(.*?)</span>', re.DOTALL)
HREF_RE = re.compile(r'href="([^"]+)"')


@register
class ExecutiveOrdersExtractor(Extractor):
    source = "ex_orders"
    doc_type = "EO"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            m = LINKS_SPAN_RE.search(body)
            if not m:
                return [], []
            hrefs = HREF_RE.findall(m.group(1))
            # reference: a:nth-child(2) — the 2nd link is the JSON bulk file
            return ([hrefs[1]] if len(hrefs) > 1 else []), []

        if kind != "api":
            return [], []
        try:
            data = json.loads(body)
        except (json.JSONDecodeError, TypeError):
            return [], []

        if "results" in data:
            links = [r["json_url"] for r in data.get("results", []) if r.get("json_url")]
            nxt = data.get("next_page_url")
            if nxt:
                links.append(nxt)
            return links, []

        # detail JSON: one executive order
        doc = self._doc_item(data)
        return [], ([doc] if doc else [])

    def _doc_item(self, doc: dict) -> dict | None:
        doc_title = doc.get("title") or ""
        publication_date = get_pub_date(doc.get("publication_date", "")) or ""
        disposition_notes = doc.get("disposition_notes", "") or ""
        signing_date = doc.get("signing_date", "") or ""
        doc_num = doc.get("executive_order_number", "") or ""
        if doc_num == "12988" and "CHAMPUS" in doc_title:
            # mis-numbered OSD notice, executive_orders_spider.py:140-145
            return None

        downloadable_items = []
        for key, ftype in (("pdf_url", "pdf"), ("full_text_xml_url", "xml"), ("raw_text_url", "txt")):
            u = doc.get(key)
            if u:
                downloadable_items.append(
                    {"doc_type": ftype, "download_url": u, "compression_type": None}
                )
        if not downloadable_items:
            return None

        doc_name = f"EO {doc_num}" if doc_num else f"EO {doc_title}"
        download_url = downloadable_items[0]["download_url"]
        display_title = f"{self.doc_type} {doc_num}: {doc_title}"
        version_hash_fields = {
            "publication_date": publication_date,
            "signing_date": signing_date,
            "disposition_notes": disposition_notes,
            "doc_name": doc_name,
            "doc_num": doc_num,
            "download_url": download_url,
            "display_title": display_title,
        }
        return {
            "doc_name": doc_name,
            "doc_title": doc_title,
            "doc_num": doc_num,
            "doc_type": self.doc_type,
            "display_doc_type": "Order",
            "publication_date": publication_date,
            "cac_login_required": "false",
            "download_url": download_url,
            "downloadable_items": downloadable_items,
            "version_hash_raw_data": version_hash_fields,
        }
