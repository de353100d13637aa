"""Issuances extractor — the reference's table-listing source family
(dod_issuances_spider.py:58-181): one <table> of documents, each row carrying
doc number+type, title, publication date, OPR (office of primary
responsibility, scrubbed of phones/emails via fix_oprs,
dod_issuances_spider.py:46-56), and a pdf href; doc types display-mapped
(dod_issuances_spider.py:30-40).

Synthetic twin built by tests/fixtures.py issuances_pages; row shape:
  <tr><td><a href="/pdf/X.pdf">DTMS 24-001</a></td><td>Title</td>
      <td>3/4/2024</td><td>OPR text 703-555-0100 a@b.mil</td></tr>
"""

from __future__ import annotations

import re

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.hashing import dict_to_sha256_hex_digest
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.urls import ensure_full_href_url

ROW_RE = re.compile(
    r"<tr><td><a href=\"(?P<href>[^\"]+)\">(?P<docnum>[^<]+)</a></td>"
    r"<td>(?P<title>[^<]*)</td><td>(?P<date>[^<]*)</td><td>(?P<opr>[^<]*)</td></tr>"
)

PHONE_RE = re.compile(r"\(?\b[0-9]{3}\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\b")
EMAIL_RE = re.compile(r"[\w.+-]+@[\w-]+\.[\w.-]+")

# dod_issuances_spider.py:30-40 display-map shape
DISPLAY_TYPES = {"DTMS": "DTM", "DODD": "Directive", "DODI": "Instruction"}


def fix_oprs(opr: str) -> str:
    """Scalar twin of text.fix_oprs_col (dod_issuances_spider.py:46-56)."""
    out = PHONE_RE.sub("", opr)
    out = EMAIL_RE.sub("", out)
    return re.sub(r"\s+", " ", out).strip()


@register
class IssuancesExtractor(Extractor):
    source = "issuances"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for m in ROW_RE.finditer(body):
            doc_num_raw = ascii_clean(m.group("docnum"))
            parts = doc_num_raw.split(" ", 1)
            type_prefix = parts[0]
            doc_num = parts[1] if len(parts) > 1 else ""
            doc_type = DISPLAY_TYPES.get(type_prefix, type_prefix)
            doc_title = ascii_clean(m.group("title"))
            pub_date = get_pub_date(m.group("date").strip()) or None
            opr = fix_oprs(m.group("opr"))
            pdf_url = ensure_full_href_url(m.group("href"), url)
            doc_name = f"{type_prefix} {doc_num}"
            raw = {
                "doc_name": doc_name,
                "doc_title": doc_title,
                "publication_date": pub_date,
                "opr": opr,
                "pdf_url": pdf_url,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": doc_type,
                    "publication_date": pub_date,
                    "cac_login_required": "true" if "CAC" in doc_title else "false",
                    "download_url": pdf_url,
                    "downloadable_items": [
                        {
                            "doc_type": "pdf",
                            "download_url": pdf_url,
                            "compression_type": None,
                        }
                    ],
                    "version_hash_raw_data": raw,
                }
            )
        return [], docs


# the seed list names this source by its reference crawler name
# (dod_issuances_spider.py:13 `name = "dod_issuances"`); register the same
# parse family under that key so seeded crawls extract
class DodIssuancesExtractor(IssuancesExtractor):
    source = "dod_issuances"


register(DodIssuancesExtractor)
