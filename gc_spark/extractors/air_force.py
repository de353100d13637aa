"""Air Force E-Publishing extractor — the product-index table family.

Reference: spiders/air_force_spider.py
  - parse_table (:128-199): five-column product rows; the doc-name CARVING
    dispatch (:156-197) derives (doc_type, doc_num, doc_name) from the raw
    product number via a cascade of special cases and prefix regexes
  - item build (:200-240): squashed titles, %Y%m%d dates → %Y-%m-%d →
    get_pub_date, CAC heuristics (:54-56 cac_required_options, '-S' suffix)
  - version hash fields (:271-279): doc_name, doc_num, publication_date,
    basename(download_url), display_title

The reference drives the table with Selenium (GCSeleniumSpider) because the
real site renders client-side; the TABLE SHAPE is what matters here, so the
synthetic twin serves the same five columns as static rows and pagination as
a rel="next" link (see gc_spark/sources/fetch.py RendererFetcher for the
headed-fetch interface). Carving is byte-for-byte the reference cascade,
including its quirk that `doc_num` persists across loop iterations (the
BOWFUSF/MCMUS branches never assign it, so those rows inherit the previous
row's number — reproduced deliberately for hash parity with
reference-written manifests).
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.dates import get_pub_date

# air_force_spider.py:23-26
SQUASH_SPACES = re.compile(r"\s*[\n\t\r\s+]\s*")
TYPE_PATTERN_START = re.compile(r"^[A-Z]+")
TYPE_PATTERN_MID = re.compile(r"[A-Z]+")

CAC_REQUIRED_OPTIONS = [
    "physical.pdf",
    "PKI certificate required",
    "placeholder",
    "FOUO",
    "for_official_use_only",
]

ROW_RE = re.compile(r"<tr>(.*?)</tr>", re.DOTALL)
CELL_RE = re.compile(r"<td[^>]*>(.*?)</td>", re.DOTALL)
HREF_RE = re.compile(r'href="([^"]+)"')
TAG_RE = re.compile(r"<[^>]+>")
NEXT_RE = re.compile(r'<a rel="next" href="([^"]+)"')


def carve_doc_fields(prod_num: str, prev_doc_num: str) -> tuple[str, str, str]:
    """(doc_type, doc_num, doc_name) from a product number — the carving
    cascade of air_force_spider.py:156-197 verbatim. `prev_doc_num` feeds the
    branches that (in the reference) read the prior iteration's value."""
    doc_num = prev_doc_num
    if prod_num.find("CFETP") != -1:
        doc_type = "CFETP"
        doc_num = re.sub(doc_type, "", prod_num)
        doc_name = " ".join((doc_type, doc_num))
    elif prod_num == "2T0X1_F-35_AFJQS":
        doc_type = "AFJQS"
        doc_num = "2T0X1_F-35"
        doc_name = " ".join((doc_type, doc_num))
    elif prod_num == "AFHandbook1":
        doc_type = "AFH"
        doc_num = "1"
        doc_name = " ".join((doc_type, doc_num))
    elif prod_num == "BOWFUSF":
        doc_type = "AF MISC"
        doc_name = "BOWFUSF"
    elif prod_num == "MCMUS":
        doc_type = "AF MISC"
        doc_name = "MCMUS"
    elif prod_num.endswith("SMALL"):
        prod_num_new = re.sub("SMALL", "", prod_num)
        doc_type = TYPE_PATTERN_START.findall(prod_num_new)[0]
        doc_num = re.sub(doc_type, "", prod_num_new)
        doc_name = " ".join((doc_type, doc_num))
    elif "DOD" in prod_num.upper() or "DESR" in prod_num.upper():
        prod_num_new = prod_num.split(".")[-1]
        prod_num_new = prod_num_new.split("_")[-1]
        type_extract = TYPE_PATTERN_MID.findall(prod_num_new)
        doc_type = (
            type_extract[0] if type_extract else TYPE_PATTERN_START.findall(prod_num)[0]
        )
        doc_num = (
            re.sub(doc_type, "", prod_num_new)
            if type_extract
            else re.sub(doc_type, "", prod_num)
        )
        doc_name = " ".join((doc_type, doc_num))
    elif not TYPE_PATTERN_START.findall(prod_num):
        doc_type = "DAFGM"
        doc_num = re.sub(doc_type, "", prod_num)
        doc_name = " ".join((doc_type, doc_num))
    else:
        doc_type = TYPE_PATTERN_START.findall(prod_num)[0]
        doc_num = re.sub(doc_type, "", prod_num)
        doc_name = " ".join((doc_type, doc_num))
    return doc_type, doc_num, doc_name


def _ymd(raw: str) -> str:
    """'20240102 081500' → '2024-01-02' (air_force_spider.py:205-214)."""
    v = SQUASH_SPACES.sub(" ", raw or "").strip().split(" ")[0]
    return datetime.strptime(v, "%Y%m%d").strftime("%Y-%m-%d")


@register
class AirForcePubsExtractor(Extractor):
    source = "air_force_pubs"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        links = [urljoin(url, m) for m in NEXT_RE.findall(body)]
        docs: list[dict] = []
        prev_doc_num = ""
        for row_m in ROW_RE.finditer(body):
            cells = CELL_RE.findall(row_m.group(1))
            if len(cells) < 5:
                continue
            prod_cell, title_cell, pub_cell, cert_cell, action_cell = cells[:5]
            product_number_raw = TAG_RE.sub("", prod_cell)
            if product_number_raw == "No data available in table":
                continue
            href_m = HREF_RE.search(prod_cell)
            web_url = href_m.group(1) if href_m else ""
            title_raw = TAG_RE.sub("", title_cell)
            publish_date_raw = TAG_RE.sub("", pub_cell)
            cert_date_raw = TAG_RE.sub("", cert_cell)
            last_action_raw = TAG_RE.sub("", action_cell)

            prod_num = SQUASH_SPACES.sub(" ", product_number_raw).strip()
            doc_type, doc_num, doc_name = carve_doc_fields(prod_num, prev_doc_num)
            prev_doc_num = doc_num
            if doc_name == "MCMUS":  # broken download link upstream (:198)
                continue

            doc_title = SQUASH_SPACES.sub(" ", title_raw).strip()
            try:
                publication_date = _ymd(publish_date_raw)
                cert_date = _ymd(cert_date_raw)
            except ValueError:
                continue
            last_action = SQUASH_SPACES.sub(" ", last_action_raw).strip()  # noqa: F841

            cac_login_required = (
                any(x in web_url for x in CAC_REQUIRED_OPTIONS)
                or any(x in doc_title for x in CAC_REQUIRED_OPTIONS)
                or "-S" in prod_num
            )
            doc_title_clean = re.sub(r"[^a-zA-Z0-9 ()\\-]", "", doc_title)
            pub_date_ts = get_pub_date(publication_date) or ""
            display_title = doc_type + " " + doc_num + ": " + doc_title_clean
            version_hash_fields = {
                "doc_name": doc_name,
                "doc_num": doc_num,
                "publication_date": pub_date_ts,
                "download_url": web_url.split("/")[-1],
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title_clean,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": "Document",
                    "publication_date": pub_date_ts,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": web_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": version_hash_fields,
                }
            )
        return links, docs
