"""Wave-3 extractor families: issuance-library sites with multi-level nav
and per-page dispatch tables.

Reference spiders:
  - dla_dedso_pubs      spiders/dla_dedso.py
  - National_Guard      spiders/chief_national_guard_bureau_spider.py
  - CNSS                spiders/cnss_spider.py (per-page split-function
                        dispatch — the URL determines the carve rule)
  - milpersman_crawler  spiders/milpersman_spider.py (3-level nav + the
                        1070-290 next-row supplement quirk)
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.extractors.pubs_tables import (
    CELL_RE,
    HREF_RE,
    ROW_RE,
    _cells,
    _href,
    _text,
)
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import (
    ensure_full_href_url,
    get_href_file_extension,
    url_encode_spaces,
)


@register
class DlaDedsoExtractor(Extractor):
    """dla_dedso.py:27-74 — ADC grid rows. Derivations: doc_name from the
    pdf URL basename with '_'→' ' (:117-120); doc_num = first 1-5 digit run
    (optionally letter-suffixed) in the name, '1' when absent (:27-31);
    doc_title = everything after the first ':' in the second cell (:33-36);
    date '%m/%d/%Y' → '%Y-%m-%d' → get_pub_date (:53-54); the hash dict's
    display_title key holds the TITLE, not the display string (:76-82)."""

    source = "dla_dedso_pubs"
    NUM_RE = re.compile(r"[A-Za-z_]*(\d{1,5}[A-Za-z]?)")
    GRID_ROW_RE = re.compile(r"<tr([^>]*)>(.*?)</tr>", re.DOTALL)

    @classmethod
    def extract_doc_number(cls, doc_name: str) -> str:
        match = cls.NUM_RE.search(doc_name)
        return match.group(1) if match else "1"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for row_m in self.GRID_ROW_RE.finditer(body):
            attrs, row = row_m.group(1), row_m.group(2)
            if "dnnGridItem" not in attrs and "dnnGridAltItem" not in attrs:
                continue
            cells = _cells(row)
            if len(cells) < 3:
                continue
            pdf_link = None
            for href in HREF_RE.findall(row):
                if ".pdf" in href:
                    pdf_link = href
                    break
            if not pdf_link:
                continue
            absolute_pdf_link = urljoin(url, pdf_link)
            doc_name = absolute_pdf_link.split("/")[-1].split(".")[0].replace("_", " ")
            doc_num = self.extract_doc_number(doc_name)
            doc_title = _text(cells[1]).split(":", 1)[-1].strip()
            try:
                publication_date = datetime.strptime(
                    _text(cells[2]).strip(), "%m/%d/%Y"
                ).strftime("%Y-%m-%d")
            except ValueError:
                continue
            pub_date = get_pub_date(publication_date)
            raw = {
                "doc_name": doc_name,
                "doc_num": doc_num,
                "publication_date": pub_date,
                "download_url": absolute_pdf_link,
                "display_title": doc_title,  # TITLE here — reference quirk
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": "ADC",
                    "display_doc_type": "ADC",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": absolute_pdf_link,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": absolute_pdf_link,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": "ADC " + doc_num + ": " + doc_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


@register
class CngbExtractor(Extractor):
    """chief_national_guard_bureau_spider.py:31-107 — CNGBI table.
    Derivations: CAC required when the href does NOT start with '/' (:35-38
    — off-site hrefs are CAC-gated); doc_name from the link text with \\xa0
    → ' ' (:54-58); doc_num = doc_name minus 'CNGBI ' (:60); publication
    date passed through RAW (no get_pub_date — :89); hash {item_currency:
    raw href, document_title, document_number} (:76-80); download URL
    space-encoded everywhere (:43)."""

    source = "National_Guard"
    doc_type = "CNGBI"
    start_url = "https://www.ngbpmc.ng.mil/Publications/CNGB-Instructions/"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 3:
                continue
            href_raw = _href(cells[0])
            if href_raw is None:
                continue
            cac_login_required = not href_raw.startswith("/")
            web_url = ensure_full_href_url(href_raw, self.start_url).replace(" ", "%20")
            file_type = get_href_file_extension(href_raw)
            doc_name_raw = _text(cells[0])
            if not doc_name_raw:
                continue
            doc_name_raw = doc_name_raw.replace("\xa0", " ")
            doc_num_raw = doc_name_raw.replace("CNGBI ", "")
            publication_date = _text(cells[1])  # raw — no get_pub_date
            doc_title = ascii_clean(_text(cells[2]))
            display_title = self.doc_type + " " + doc_num_raw + ": " + doc_title
            raw = {
                "item_currency": href_raw,
                "document_title": doc_title,
                "document_number": doc_num_raw,
            }
            docs.append(
                {
                    "doc_name": doc_name_raw,
                    "doc_title": doc_title,
                    "doc_num": doc_num_raw,
                    "doc_type": self.doc_type,
                    "display_doc_type": self.doc_type,
                    "publication_date": publication_date,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": file_type, "download_url": web_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


# --- CNSS split functions (cnss_spider.py:12-66 verbatim) -----------------


def _simple(doc_type_num):
    before, _, after = doc_type_num.partition(" ")
    return before.strip(), after.strip()


def _policy(s):
    b, a = _simple(s)
    return b, a, "Policy"


def _memo(s):
    b, a = _simple(s)
    return b, a, "Memo"


def _tsg_std(s):
    before, _, after = s.partition(" STANDARD ")
    if not after:
        return before, "", "Standard"
    return f"{before.strip()} STANDARD", after.strip(), "Standard"


def _tsg_info(s):
    return "TSG Information Series", "", "Series"


def _cnss_report(s):
    s = s.replace("CNSS Report:", "")
    return "CNSS Report", s.strip(), "Report"


def _historical(s):
    return "CNSS Historical Index", "", "Index"


def _supp(s):
    return "CNSS Supplement", s, "Supplement"


def _instruction(s):
    b, a = _simple(s)
    if not a.strip():
        return "CNSSAM", b.replace("CNSS-", ""), "Memo"
    return b, a, "Instruction"


def _directive(s):
    b, a = _simple(s)
    if not a.strip():
        return "CNSSD", f"Template {b}", "Directive"
    return b, a, "Directive"


@register
class CnssExtractor(Extractor):
    """cnss_spider.py — the transform-dispatch-table family (§2.11): nine
    issuance pages, each with its own (doc_type, doc_num, display) split
    function (:69-88 `pages`). The reference carries the function in request
    meta; distributed, the page URL selects it from the same table. Row
    parse (:96-125): itemprop name/description/dateCreated spans, href from
    the second cell; hash {doc_title, doc_num, publication_date,
    display_title} (:171-176); file_ext = doc_type quirk (:198)."""

    source = "CNSS"
    root_url = "https://www.cnss.gov"
    PAGES = [
        ("https://www.cnss.gov/CNSS/issuances/Policies.cfm", _policy),
        ("https://www.cnss.gov/CNSS/issuances/Directives.cfm", _directive),
        ("https://www.cnss.gov/CNSS/issuances/Instructions.cfm", _instruction),
        ("https://www.cnss.gov/CNSS/issuances/Memoranda.cfm", _memo),
        ("https://www.cnss.gov/CNSS/issuances/TSG_Standards.cfm", _tsg_std),
        ("https://www.cnss.gov/CNSS/issuances/TSG_Information.cfm", _tsg_info),
        ("https://www.cnss.gov/CNSS/issuances/CNSS_Reports.cfm", _cnss_report),
        ("https://www.cnss.gov/CNSS/issuances/Supplemental.cfm", _supp),
        ("https://www.cnss.gov/CNSS/issuances/historicalIndex.cfm", _historical),
    ]
    ITEM_RE = re.compile(
        r'<p class="documentTitle"><span itemprop="name">(?P<name>[^<]*)</span>'
        r'<span itemprop="description">(?P<desc>[^<]*)</span></p>'
        r'<p class="documentInfo"><span itemprop="dateCreated">(?P<date>[^<]*)</span></p>',
        re.DOTALL,
    )

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":  # index.cfm: "do nothing on start url" (:91-93)
            return [p for p, _fn in self.PAGES], []
        if kind != "listing":
            return [], []
        split_func = next((fn for p, fn in self.PAGES if p == url), None)
        if split_func is None:
            return [], []
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 2:
                continue
            href_raw = _href(cells[1])
            if not href_raw:
                continue
            m = self.ITEM_RE.search(cells[1])
            if not m:
                continue
            doc_type_num = ascii_clean(m.group("name"))
            doc_title = ascii_clean(m.group("desc"))
            publication_date = ascii_clean(m.group("date"))
            doc_type, doc_num, display_doc_type = split_func(doc_type_num)
            doc_name = f"{doc_type} {doc_num}".strip()
            web_url = f"{self.root_url}{href_raw}"
            pub_date = get_pub_date(publication_date)
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "doc_title": doc_title,
                "doc_num": doc_num,
                "publication_date": pub_date,
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": display_doc_type,
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": web_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": doc_type,
                }
            )
        return [], docs


@register
class MilpersmanExtractor(Extractor):
    """milpersman_spider.py — three nav levels, all dispatched by page
    content exactly like the reference's parse/parse_doc_type/parse_page
    chain: the root menu (li[title=MILPERSMAN], digit-leading anchors only,
    :26-32), optional subsection accordions (afAccordionMenuSubMenu,
    :34-42), then table rows (:45-116). Derivations: doc_num from the first
    cell's text, rows without one skipped (:58-62); title joins ALL
    second-cell text (:64-66); the 1070-290 row appends the NEXT row's
    supplement link as a second downloadable item (:81-98); hash is
    five-field {doc_name, doc_num, download_url, display_title, doc_type} —
    no date (:149-156); file_ext = doc_type quirk (:181)."""

    source = "milpersman_crawler"
    doc_type = "MILPERSMAN"
    MENU_RE = re.compile(
        r'<li title="MILPERSMAN">.*?<ul>(.*?)</ul>', re.DOTALL
    )
    SUBMENU_RE = re.compile(
        r'<ul class="afAccordionMenuSubMenu">(.*?)</ul>', re.DOTALL
    )
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    DIGIT_RE = re.compile(r"\d")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        menu = self.MENU_RE.search(body)
        if menu:  # root: digit-leading anchors only (:29-31 has_digit MATCH)
            links = [
                urljoin(url, href)
                for href, text in self.A_RE.findall(menu.group(1))
                if self.DIGIT_RE.match(text.strip())
            ]
            return links, []
        sub = self.SUBMENU_RE.search(body)
        if sub:  # doc-type page with subsection dropdowns (:36-39)
            return [urljoin(url, href) for href, _t in self.A_RE.findall(sub.group(1))], []

        # leaf page: the livehtml table
        rows = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) >= 2 and (_href(cells[0]) or _href(cells[1])):
                rows.append(cells)
        docs = []
        for i, cells in enumerate(rows):
            doc_num = ascii_clean(_text(cells[0]))
            if not doc_num:
                continue
            doc_title = " ".join(
                ascii_clean(t) for t in [_text(cells[1])] if t is not None
            )
            href_raw = _href(cells[0])
            if not href_raw:
                continue
            web_url = ensure_full_href_url(href_raw, url)
            download_url = url_encode_spaces(web_url)
            file_type = get_href_file_extension(href_raw)
            downloadable_items = [
                {"doc_type": file_type, "download_url": download_url,
                 "compression_type": None}
            ]
            if doc_num == "1070-290":  # supplement quirk (:81-98)
                try:
                    supp_href = _href(rows[i + 1][1])
                    downloadable_items.append(
                        {
                            "doc_type": get_href_file_extension(supp_href),
                            "download_url": url_encode_spaces(
                                ensure_full_href_url(supp_href, url)
                            ),
                            "compression_type": None,
                        }
                    )
                except Exception:
                    pass
            doc_name = f"MILPERSMAN {doc_num}"
            display_title = self.doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "doc_name": doc_name,
                "doc_num": doc_num,
                "download_url": download_url,
                "display_title": display_title,
                "doc_type": self.doc_type,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": self.doc_type,
                    "display_doc_type": "Document",
                    "publication_date": None,
                    "cac_login_required": "false",
                    "download_url": download_url,
                    "downloadable_items": downloadable_items,
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": self.doc_type,
                }
            )
        return [], docs
