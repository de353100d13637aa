"""JSON-API extractor — the reference's paginated-API source family
(SURVEY.md §2.1-S5): executive_orders_spider.py:77-88 and
sorn_spider.py:22-58 GET a JSON API page, pluck document fields from
`results`, and follow `next_page_url` until exhausted.

The synthetic twin (tests/fixtures.py json_api_pages) serves the same shape:
{"count": N, "next_page_url": ..., "results": [{...}]}. Pagination is
frontier growth: each page yields ≤1 follow link + K docs.
"""

from __future__ import annotations

import json

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.hashing import dict_to_sha256_hex_digest
from gc_spark.functions.urls import get_href_file_extension


@register
class JsonApiExtractor(Extractor):
    source = "json_api"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "api":
            return [], []
        try:
            data = json.loads(body)
        except (json.JSONDecodeError, TypeError):
            return [], []

        links = []
        nxt = data.get("next_page_url")
        if nxt:
            links.append(nxt)

        docs = []
        for rec in data.get("results", []):
            # field derivation mirrors executive_orders_spider.py:139-162:
            # document_number -> doc_num, title cleaned, pdf_url downloadable
            doc_num = str(rec.get("document_number", "")).strip()
            title = (rec.get("title") or "").strip()
            pdf_url = rec.get("pdf_url")
            if not doc_num or not pdf_url:
                continue
            doc_name = f"API {doc_num}"
            raw = {
                "doc_name": doc_name,
                "document_number": doc_num,
                "pdf_url": pdf_url,
                "title": title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": title,
                    "doc_num": doc_num,
                    "doc_type": "Document",
                    "display_doc_type": "Document",
                    "publication_date": rec.get("publication_date"),
                    "cac_login_required": "false",
                    "download_url": pdf_url,
                    "downloadable_items": [
                        {
                            "doc_type": get_href_file_extension(pdf_url),
                            "download_url": pdf_url,
                            "compression_type": None,
                        }
                    ],
                    "version_hash_raw_data": raw,
                }
            )
        return links, docs
