"""Marine Corps MCPEL extractor — the transform-dispatch-table family, and
the engine's showcase of the TWO-HOP item pattern.

Reference: spiders/marine_corp_spider.py
  - transform functions (:12-75) + doc_type_transformations_map (:176-225):
    per-doc-type (set_num, set_type, set_doc_name) function triples — ported
    verbatim below
  - parse (:262-367): list rows → transformed INCOMPLETE item, carried via
    request meta to parse_download_page, which finds the real download href
    and only then computes the version hash (:370-395)
  - pagination (:355-360): ?Page=N increments until a page has no rows

Scrapy's meta-carry is driver-side mutable state; the distributed twin is a
JOIN: the listing page emits a *pending* doc (detail_url set, no
download_url) that the engine parks in the pending_docs table, the detail
URL enters the frontier like any link, and when its page is fetched the
extractor emits a detail record (detail_download_href) that the engine joins
back onto the pending doc to complete it (gc_spark/plans/drain.py
_resolve_pending). Politeness, dedup and resume all apply to the second hop
for free because it rides the normal frontier.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import is_valid_web_url

# ---- transform functions, marine_corp_spider.py:12-75 ----------------------

GENERAL_NUM_RE = re.compile(r"(?<!ch )(?<!vol )(?<!\W )(\d[\w\.\-]*)", flags=re.IGNORECASE)


def general_set_num(raw_data: dict) -> None:
    doc_num = ""
    try:
        doc_type_num_raw = raw_data.get("doc_type_num_raw")
        doc_name_groups = re.search(GENERAL_NUM_RE, doc_type_num_raw)
        if doc_name_groups:
            doc_num = doc_name_groups.group(1)
    except Exception:
        pass
    finally:
        raw_data["doc_num"] = doc_num


def set_no_num(raw_data: dict) -> None:
    raw_data["doc_num"] = ""


def set_type_using_num(raw_data: dict) -> None:
    doc_type_num_raw = raw_data.get("doc_type_num_raw")
    doc_num = raw_data.get("doc_num")
    if doc_num:
        doc_type, *_ = doc_type_num_raw.partition(doc_num)
        raw_data["doc_type"] = doc_type.strip()
    else:
        use_raw_type(raw_data)


def use_raw_type(raw_data: dict) -> None:
    raw_data["doc_type"] = raw_data.get("doc_type_raw")


def name_from_type_and_num(raw_data: dict) -> None:
    raw_data["doc_name"] = raw_data["doc_type"] + " " + raw_data["doc_num"]


def name_from_type_and_num_no_space(raw_data: dict) -> None:
    raw_data["doc_name"] = raw_data["doc_type"] + raw_data["doc_num"]


def name_from_type_and_num_with_dash(raw_data: dict) -> None:
    raw_data["doc_name"] = raw_data["doc_type"] + "-" + raw_data["doc_num"]


def name_from_doc_type_num_raw(raw_data: dict) -> None:
    raw_data["doc_name"] = raw_data["doc_type_num_raw"]


def name_from_title(raw_data: dict) -> None:
    if raw_data["doc_title_raw"]:
        raw_data["doc_name"] = raw_data["doc_title_raw"]
    else:
        name_from_doc_type_num_raw(raw_data)


def name_from_type_title(raw_data: dict) -> None:
    raw_data["doc_name"] = raw_data["doc_type_raw"] + ": " + raw_data["doc_title_raw"]


DCG_RE = re.compile(r"DCG (VOL \d* PGS \d*\-\d*)")


def legal_pubs_set_num(raw_data: dict) -> None:
    raw_data["doc_num"] = ""
    if "DCG VOL" in raw_data["doc_type_num_raw"]:
        groups = re.search(DCG_RE, raw_data["doc_type_num_raw"])
        if groups:
            raw_data["doc_num"] = groups.group(1)
    elif "MANUAL FOR COURTS-MARTIAL" in raw_data["doc_type_num_raw"]:
        raw_data["doc_num"] = ""
    else:
        general_set_num(raw_data)


def legal_pubs_set_name(raw_data: dict) -> None:
    if raw_data["doc_num"]:
        name_from_type_and_num(raw_data)
    else:
        name_from_title(raw_data)


IRM_RE = re.compile(r"IRM\-?(\w*\-\w*)")


def misc_pubs_set_num(raw_data: dict) -> None:
    doc_type_num_raw = raw_data["doc_type_num_raw"]
    raw_data["doc_num"] = ""
    if "IRM " in doc_type_num_raw or "IRM-" in doc_type_num_raw:
        groups = re.search(IRM_RE, doc_type_num_raw)
        if groups:
            raw_data["doc_num"] = groups.group(1)
    elif "MCCP" in doc_type_num_raw or "CMC White Letter" in doc_type_num_raw:
        general_set_num(raw_data)
    else:
        set_no_num(raw_data)


def misc_pubs_set_type(raw_data: dict) -> None:
    if "IRM" in raw_data["doc_type_num_raw"]:
        raw_data["doc_type"] = "IRM"
    else:
        set_type_using_num(raw_data)


def misc_pubs_set_name(raw_data: dict) -> None:
    if raw_data["doc_num"]:
        if "IRM" in raw_data["doc_type_num_raw"]:
            name_from_type_and_num_with_dash(raw_data)
        else:
            name_from_type_and_num(raw_data)
    else:
        name_from_title(raw_data)


SECNAVM_RE = re.compile(r"SECNAV M\-?(\w*\.?\w*)")


def navy_pubs_set_num(raw_data: dict) -> None:
    raw_data["doc_num"] = ""
    if "SECNAV M-" in raw_data["doc_type_num_raw"]:
        groups = re.search(SECNAVM_RE, raw_data["doc_type_num_raw"])
        if groups:
            raw_data["doc_num"] = groups.group(1).replace("-", "")
    else:
        general_set_num(raw_data)


def navy_pubs_set_type(raw_data: dict) -> None:
    if "SECNAV M-" in raw_data["doc_type_num_raw"]:
        raw_data["doc_type"] = "SECNAV M"
    else:
        set_type_using_num(raw_data)


def navy_pubs_set_name(raw_data: dict) -> None:
    if raw_data["doc_num"]:
        if "SECNAV M-" in raw_data["doc_type_num_raw"]:
            name_from_type_and_num_with_dash(raw_data)
        elif "NAVSUP P" in raw_data["doc_type_num_raw"]:
            name_from_type_and_num_no_space(raw_data)
        else:
            name_from_type_and_num(raw_data)
    else:
        name_from_title(raw_data)


STANDARD_FUNCS = {
    "set_num_func": general_set_num,
    "set_type_func": set_type_using_num,
    "set_doc_name_func": name_from_type_and_num,
}

# marine_corp_spider.py:176-225
DOC_TYPE_TRANSFORMATIONS_MAP: dict[str, dict] = {
    "Army Pubs": STANDARD_FUNCS,
    "Doctrine Pubs": STANDARD_FUNCS,
    "Historical": {
        "set_num_func": set_no_num,
        "set_type_func": use_raw_type,
        "set_doc_name_func": name_from_type_title,
    },
    "Legal Pubs": {
        "set_num_func": legal_pubs_set_num,
        "set_type_func": set_type_using_num,
        "set_doc_name_func": legal_pubs_set_name,
    },
    "MCBUL": {
        "set_num_func": general_set_num,
        "set_type_func": set_type_using_num,
        "set_doc_name_func": name_from_type_and_num,
    },
    "MCO": STANDARD_FUNCS,
    "MCO P": {
        "set_num_func": general_set_num,
        "set_type_func": set_type_using_num,
        "set_doc_name_func": name_from_type_and_num_no_space,
    },
    "Misc Pubs": {
        "set_num_func": misc_pubs_set_num,
        "set_type_func": misc_pubs_set_type,
        "set_doc_name_func": misc_pubs_set_name,
    },
    "NAVMC": STANDARD_FUNCS,
    "NAVMC Directive": STANDARD_FUNCS,
    "Navy Pubs": {
        "set_num_func": navy_pubs_set_num,
        "set_type_func": navy_pubs_set_type,
        "set_doc_name_func": navy_pubs_set_name,
    },
    "UM": {
        "set_num_func": set_no_num,
        "set_type_func": use_raw_type,
        "set_doc_name_func": name_from_type_title,
    },
    "USAF Pubs": STANDARD_FUNCS,
}


def set_all_transformations(raw_data: dict, transform_dict: dict) -> None:
    transform_dict["set_num_func"](raw_data)
    transform_dict["set_type_func"](raw_data)
    transform_dict["set_doc_name_func"](raw_data)


CAC_REQUIRED_OPTIONS = ["placeholder", "FOUO", "for_official_use_only"]

DISPLAY_TYPE_DICT = {"secnavinst": "Instruction"}


def get_display_doc_type(doc_type: str) -> str:
    return DISPLAY_TYPE_DICT.get(doc_type.lower(), "Document")


# ---- page parsing (synthetic twin of the MCPEL CSS selectors) --------------

LITEM_RE = re.compile(r'<div class="litem">(.*?)</div>\s*</div>', re.DOTALL)
FIELD_RES = {
    "href": re.compile(r'<a href="([^"]*)"'),
    "doc_type_raw": re.compile(r'<div class="list-type"><span>([^<]*)</span>'),
    "doc_type_num_raw": re.compile(r'<div class="list-title">([^<]*)</div>'),
    "doc_title_raw": re.compile(r'<div class="cat"><span>([^<]*)</span>'),
    "doc_status_raw": re.compile(r'<div class="status">([^<]*)</div>'),
}
DOWNLOAD_RE = re.compile(r'<div class="download-section">\s*<a href="([^"]*)"')
PAGE_RE = re.compile(r"[?&]Page=(\d+)")


@register
class MarineCorpExtractor(Extractor):
    source = "marine_pubs"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "listing":
            return self._parse_listing(url, body)
        if kind == "detail":
            return self._parse_download_page(url, body)
        return [], []

    def _parse_listing(self, url: str, body: str) -> tuple[list[str], list[dict]]:
        links: list[str] = []
        docs: list[dict] = []
        rows = LITEM_RE.findall(body)
        if not rows:
            return [], []  # empty page ends pagination (:266-268)
        for row in rows:
            fields = {
                k: (m.group(1) if (m := rx.search(row)) else "")
                for k, rx in FIELD_RES.items()
            }
            doc_type_raw = fields["doc_type_raw"]
            if not doc_type_raw:
                continue
            if doc_type_raw not in DOC_TYPE_TRANSFORMATIONS_MAP:
                continue  # unrecognized doc type (:286-288)
            if fields["doc_status_raw"] == "Deleted":
                continue
            follow_href = fields["href"]
            if not follow_href:
                continue

            raw_data = {
                "doc_type_raw": doc_type_raw,
                "doc_type_num_raw": fields["doc_type_num_raw"],
                "doc_title_raw": fields["doc_title_raw"],
            }
            set_all_transformations(raw_data, DOC_TYPE_TRANSFORMATIONS_MAP[doc_type_raw])

            doc_num = raw_data["doc_num"]
            doc_name = ascii_clean(raw_data["doc_name"])
            doc_title = ascii_clean(fields["doc_title_raw"]) or doc_name
            cac_login_required = any(x in doc_title for x in CAC_REQUIRED_OPTIONS)
            doc_type = raw_data["doc_type"]
            display_title = doc_type + " " + doc_num + ": " + doc_title
            version_hash_fields = {
                "doc_num": doc_num,
                "doc_name": doc_name,
                "publication_date": "None",
                "status": fields["doc_status_raw"],
                "display_title": display_title,
            }
            detail_url = urljoin(url, follow_href)
            links.append(detail_url)  # the second hop rides the frontier
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": get_display_doc_type(doc_type),
                    "publication_date": None,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": None,
                    "downloadable_items": [],
                    "version_hash_raw_data": version_hash_fields,
                    # pending marker: completed by _resolve_pending when the
                    # detail page is fetched
                    "detail_url": detail_url,
                }
            )
        # pagination: ?Page=N+1 while the current page has rows (:355-360)
        m = PAGE_RE.search(url)
        if m:
            nxt = re.sub(r"([?&]Page=)\d+", rf"\g<1>{int(m.group(1)) + 1}", url)
            links.append(nxt)
        return links, docs

    def _parse_download_page(self, url: str, body: str) -> tuple[list[str], list[dict]]:
        m = DOWNLOAD_RE.search(body)
        href_raw = m.group(1) if m else ""
        # repair broken hrefs (:385-386)
        href_raw = href_raw.replace("http:/www./", "http://www.")
        if not href_raw or not is_valid_web_url(href_raw):
            return [], []
        # detail record: joined back onto the pending doc by the engine
        return [], [{"detail_download_href": href_raw}]
