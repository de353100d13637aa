"""Wave-6 extractor families: reserve/guard/medicine directive boards.

Reference spiders:
  - navy_med_pubs  spiders/navy_med_spider.py (tabbed Selenium board with
                   per-tab column layouts and stateful dedup quirks)
  - navy_reserves  spiders/navy_reserve_spider.py (per-page type prefixes,
                   suffix from the number's shape)
  - Army_Reserve   spiders/army_reserve_spider.py (expandable sections,
                   bold-name/plain-title split)
  - Coast_Guard    spiders/coast_guard_spider.py (five directive boards,
                   '_'-partitioned type/num)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.extractors.pubs_tables import (
    ROW_RE,
    _cells,
    _href,
    _text,
    iso_or_none,
    std_hash_fields,
)
from gc_spark.functions.dates import parse_timestamp, TS_FMT
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import ensure_full_href_url, get_href_file_extension


@register
class NavyMedExtractor(Extractor):
    """navy_med_pubs — three tabs, each a paged table (the reference drives
    tabs with Selenium; here each tab is a page whose URL fragment names the
    tab, the RendererFetcher shape). Derivations (navy_med_spider.py:136-254):
    per-tab column maps (NAVMED: title/date/num = 1/0/2 else 2/3/1);
    BUMEDNOTE duplicate numbers get the title appended, twice-duplicated get
    '-REVISION' (:179-187); NAVMED numbers get 'P-' when digit-led else
    attach to 'NAVMED P-117', with the stateful 'MANMED CHANGE 126' → '126-1'
    second-occurrence rename (:190-211); a trailing '*' on the title means
    CAC and is stripped from title AND name (:228-231); href from the num
    cell, falling back to any row link (:163-171)."""

    source = "navy_med_pubs"
    start_url = "https://www.med.navy.mil/Directives/"
    TABS = {"bumedinst": ("BUMEDINST", 0), "bumednote": ("BUMEDNOTE", 1),
            "navmed": ("NAVMED", 2)}

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            return [f"{self.start_url}#{t}" for t in self.TABS], []
        if kind != "listing":
            return [], []
        tab = url.rsplit("#", 1)[-1].split("?")[0]
        if tab not in self.TABS:
            return [], []
        doc_type, index = self.TABS[tab]
        if doc_type == "NAVMED":
            title_id, publication_id, doc_num_id = 1, 0, 2
        else:
            title_id, publication_id, doc_num_id = 2, 3, 1

        docs = []
        bumednote_seen: set[str] = set()
        dup_change_seen = False
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) <= max(title_id, publication_id, doc_num_id):
                continue
            doc_num_raw = _text(cells[doc_num_id]).strip()
            if not doc_num_raw:
                continue
            doc_title_raw = _text(cells[title_id]).strip()
            publication_date = _text(cells[publication_id]).strip()
            href_raw = _href(cells[doc_num_id]) or _href(row_m.group(1))
            if not href_raw:
                continue

            doc_name = doc_num = doc_title = None
            if index == 1:  # BUMEDNOTE
                doc_num_raw = doc_num_raw.replace("NOTE ", "")
                if doc_num_raw in bumednote_seen:
                    doc_num_raw = f"{doc_num_raw} {doc_title_raw}"
                    if doc_num_raw in bumednote_seen:
                        doc_num_raw = f"{doc_num_raw}-REVISION"
                bumednote_seen.add(doc_num_raw)
            elif index == 2:  # NAVMED
                doc_num_raw = doc_num_raw.replace(".pdf", "")
                publication_date, doc_title_raw = doc_title_raw, publication_date
                if doc_num_raw[0].isdigit():
                    doc_num_raw = "P-" + doc_num_raw
                    doc_name = "NAVMED " + doc_num_raw
                else:
                    doc_title = ascii_clean(doc_title_raw)
                    doc_name = f"NAVMED P-117 {doc_num_raw}"
                    if doc_name == "NAVMED P-117 MANMED CHANGE 126" and not dup_change_seen:
                        dup_change_seen = True
                    elif doc_name == "NAVMED P-117 MANMED CHANGE 126" and dup_change_seen:
                        doc_name = "NAVMED P-117 MANMED CHANGE 126-1"

            if not doc_num:
                doc_num = ascii_clean(doc_num_raw)
            if not doc_title:
                doc_title = ascii_clean(doc_title_raw)
            download_url = ensure_full_href_url(href_raw, self.start_url)
            if not doc_name:
                doc_name = f"{doc_type} {doc_num}"
            cac_login_required = False
            if doc_title.endswith("*"):  # :228-231
                cac_login_required = True
                doc_title = doc_title[:-1]
                doc_name = doc_name[:-1]
            pub_date = iso_or_none(parse_timestamp(publication_date))
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, download_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": download_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                    "source_page_url": self.start_url,
                }
            )
        return [], docs


@register
class NavyReserveExtractor(Extractor):
    """navy_reserves — nav menu pages (Message pages excluded,
    navy_reserve_spider.py:46-52), each with dnnGrid tables. Derivations
    (:103-147): doc_num spaces→'_' and zero-width strip, digitless rows
    skipped; type = COMNAVRESFORCOM|RESPERSMAN (from URL) + INST/NOTE by
    whether the number contains '.' (:111-117); '(n)' parenthetical in the
    title appends '_n[_rest]' to the doc_name (:121-130); hash download_url
    is the RAW href and hash doc_name is the TITLE (:176-183 quirk);
    publication 'N/A' (:160)."""

    source = "navy_reserves"
    NAV_A_RE = re.compile(r'<li class="dm dropdown">.*?</li>', re.DOTALL)
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>', re.DOTALL)
    GRID_ROW_RE = re.compile(r"<tr([^>]*)>(.*?)</tr>", re.DOTALL)

    @staticmethod
    def get_display_doc_type(doc_type: str) -> str:
        if doc_type.strip().lower().endswith("inst"):
            return "Instruction"
        elif doc_type.strip().lower().endswith("note"):
            return "Notice"
        return "Document"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            nav = self.NAV_A_RE.search(body)
            if not nav:
                return [], []
            return [
                urljoin(url, h)
                for h in self.A_RE.findall(nav.group(0))
                if "Message" not in h
            ], []
        if kind != "listing":
            return [], []
        if "Instruction" in url or "Notice" in url:
            type_prefix = "COMNAVRESFORCOM"
        elif "RESPERSMAN" in url:
            type_prefix = "RESPERSMAN"
        else:
            return [], []
        docs = []
        for row_m in self.GRID_ROW_RE.finditer(body):
            attrs, row = row_m.group(1), row_m.group(2)
            if "dnnGridHeader" in attrs:
                continue
            cells = _cells(row)
            if len(cells) < 3:
                continue
            doc_num_raw = _text(cells[0])
            doc_title_raw = _text(cells[1])
            href_raw = _href(cells[2])
            if not href_raw:
                continue
            doc_num = doc_num_raw.strip().replace(" ", "_").replace("​", "")
            if not bool(re.search(r"\d", doc_num)):
                continue
            if "RESPERSMAN" in url:
                type_suffix = ""
            elif "." in doc_num:
                type_suffix = "INST"
            else:
                type_suffix = "NOTE"
            doc_title = doc_title_raw.strip()
            doc_type = type_prefix + type_suffix
            doc_name = doc_type + " " + doc_num
            if re.search(r"\(\d\)", doc_title):  # :121-130
                doc_name_suffix = re.split(r"\(", doc_title)
                doc_name_suffix = re.split(r"\)", doc_name_suffix[1])
                if doc_name_suffix[0].strip() != "":
                    doc_name = doc_name + "_" + doc_name_suffix[0]
                if len(doc_name_suffix) > 1 and doc_name_suffix[1].strip() != "":
                    doc_name = doc_name + "_" + doc_name_suffix[1].strip().replace(" ", "_")
            web_url = ensure_full_href_url(href_raw, url)
            doc_title = ascii_clean(doc_title_raw)
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "download_url": href_raw,  # RAW href (reference quirk)
                "doc_name": doc_title,  # TITLE here (reference quirk :178)
                "doc_num": doc_num.strip(),
                "doc_title": doc_title,
                "publication_date": "N/A",
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name.strip(),
                    "doc_title": doc_title.strip(),
                    "doc_num": doc_num.strip(),
                    "doc_type": doc_type.strip(),
                    "display_doc_type": self.get_display_doc_type(doc_type),
                    "publication_date": "N/A",
                    "cac_login_required": "false",
                    "download_url": web_url.replace(" ", "%20"),
                    "downloadable_items": [
                        {"doc_type": "pdf",
                         "download_url": web_url.replace(" ", "%20"),
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


@register
class ArmyReserveExtractor(Extractor):
    """Army_Reserve — expandable sections of <p> doc links
    (army_reserve_spider.py:57-110). Derivations: bold text = doc_name,
    anchor text = doc_title with span/name fallbacks (:75-84); CAC when the
    URL is on usar.dod.afpims.mil (:73); '(alpha) (numeric)' regex splits
    type/num else 'USAR Doc'/'' (:87-93); display map usar cir/pam/reg
    (:44-54); 4-field hash with the URL BASENAME and NO date (:139-144);
    publication_date None — the site doesn't publish dates."""

    source = "Army_Reserve"
    start_url = "https://www.usar.army.mil/Publications/"
    TYPE_NUM_RE = re.compile(r"([a-zA-Z].*) (\d.*)")
    P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
    STRONG_RE = re.compile(r"<strong>(.*?)</strong>", re.DOTALL)
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)

    @staticmethod
    def clean(text: str) -> str:
        return text.encode("ascii", "ignore").decode("ascii").strip()

    @staticmethod
    def get_display_doc_type(doc_type: str) -> str:
        return {
            "usar cir": "Circular", "usar pam": "Pamphlet", "usar reg": "Regulation",
        }.get(doc_type.lower(), "Document")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for p in self.P_RE.findall(body):
            a = self.A_RE.search(p)
            if a is None:
                continue
            pdf_url = a.group(1)
            web_url = urljoin(self.start_url, pdf_url) if pdf_url.startswith("/") else pdf_url
            web_url = web_url.replace(" ", "%20")
            cac_login_required = "usar.dod.afpims.mil" in web_url
            doc_name_raw = "".join(self.STRONG_RE.findall(p))
            doc_name_raw = re.sub(r"<[^>]+>", "", doc_name_raw)
            doc_title_raw = re.sub(r"<[^>]+>", "", a.group(2)).strip() or None
            if not doc_title_raw:
                doc_title_raw = doc_name_raw
            doc_name = self.clean(re.sub(r"<[^>]+>", "", doc_name_raw))
            doc_title = self.clean(doc_title_raw)
            m = self.TYPE_NUM_RE.search(doc_name)
            if m is not None:
                doc_type, doc_num = m[1], m[2]
            else:
                doc_type, doc_num = "USAR Doc", ""
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "doc_name": doc_name,
                "doc_num": doc_num,
                "download_url": web_url.split("/")[-1],
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": self.get_display_doc_type(doc_type),
                    "publication_date": None,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": web_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                    "source_page_url": self.start_url,
                }
            )
        return [], docs


@register
class CoastGuardExtractor(Extractor):
    """Coast_Guard — five directive boards (coast_guard_spider.py:25-31,
    fixed page list from the landing). Derivations (:100-127): type/num from
    the first cell partitioned on '_' (or ' ' fallback), 'COMDTINST'
    normalized to 'CI'; doc_num '_'→'.' (:143); display map cim/ci/cn/ccn/
    dcmsi (:38-46); date → ISO with '' on failure (:48-59); download URL
    space-encoded everywhere incl. the hash (:157-163)."""

    source = "Coast_Guard"
    PAGES = [
        "Commandant-Instruction-Manuals/", "Commandant-Instructions/",
        "Commandant-Notice/", "Commandant-Change-Notices/", "DCMS-Instructions/",
    ]

    @staticmethod
    def get_display_doc_type(doc_type: str):
        return {
            "cngbi": "Instruction", "cim": "Manual", "ci": "Instruction",
            "cn": "Notice", "ccn": "Notice", "dcmsi": "Instruction",
        }.get(doc_type.lower())

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            base = url if url.endswith("/") else url + "/"
            return [base + p for p in self.PAGES], []
        if kind != "listing":
            return [], []
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 5:
                continue
            doc_type_num_raw = _text(cells[0])
            if "_" in doc_type_num_raw:
                doc_type_raw, _sep, doc_num_raw = doc_type_num_raw.partition("_")
            else:
                doc_type_raw, _sep, doc_num_raw = doc_type_num_raw.partition(" ")
            if doc_type_raw == "COMDTINST":
                doc_type_raw = "CI"
            href_raw = _href(cells[1])
            if not href_raw:
                continue
            doc_title = ascii_clean(_text(cells[1]))
            office_primary_resp = _text(cells[2]) or None
            download_url = ensure_full_href_url(href_raw, url).replace(" ", "%20")
            dt = parse_timestamp(_text(cells[4]))
            publication_date = dt.strftime(TS_FMT) if dt else ""
            doc_num = doc_num_raw.replace("_", ".")
            doc_name = f"{doc_type_raw} {doc_num}"
            display_title = doc_type_raw + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, publication_date, download_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type_raw,
                    "display_doc_type": self.get_display_doc_type(doc_type_raw),
                    "publication_date": publication_date,
                    "cac_login_required": "false",
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": get_href_file_extension(href_raw),
                         "download_url": download_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": get_href_file_extension(href_raw),
                }
            )
        return [], docs
