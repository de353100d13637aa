"""Table-listing extractor families, wave 2: six sources whose reference
spiders each parse one HTML table of documents per page.

Every class reproduces its spider's DERIVATION logic (doc_type/num/name
carving, display maps, date formats, hash-field choice) byte-for-byte; the
synthetic twin table shape each one parses is defined in
tests/test_extractor_families.py next to the derivation tests.

Reference spiders:
  - DISA_pubs   spiders/disa_pubs_spider.py
  - DCMA        spiders/dcma_spider.py
  - stig_pubs   spiders/stig_spider.py
  - dha_pubs    spiders/dha_spider.py
  - fmr_pubs    spiders/fmr_spider.py
  - jcs_pubs    spiders/jcs_pubs_spider.py
"""

from __future__ import annotations

import re
from datetime import datetime
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.dates import get_pub_date, parse_timestamp, TS_FMT
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import ensure_full_href_url, get_href_file_extension

# shared micro-HTML helpers (same regex family as air_force.py)
ROW_RE = re.compile(r"<tr>(.*?)</tr>", re.DOTALL)
CELL_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.DOTALL)
HREF_RE = re.compile(r'href="([^"]+)"')
TAG_RE = re.compile(r"<[^>]+>")
NEXT_RE = re.compile(r'<a rel="next" href="([^"]+)"')


def _cells(row_html: str) -> list[str]:
    return CELL_RE.findall(row_html)


def _text(cell_html: str) -> str:
    # html.unescape matches the entity decoding the reference gets for free
    # from its HTML parser (bs4/parsel text extraction)
    import html

    return html.unescape(TAG_RE.sub("", cell_html)).strip()


def _href(cell_html: str) -> str | None:
    m = HREF_RE.search(cell_html)
    return m.group(1) if m else None


def std_hash_fields(
    doc_name: str, doc_num: str, publication_date: str | None,
    download_url: str, display_title: str,
) -> dict:
    """DocItemFields.hash_fields (doc_item_fields.py:44-50) — the standard
    five-field version-hash dict, in the reference's insertion order."""
    return {
        "doc_name": doc_name,
        "doc_num": doc_num,
        "publication_date": publication_date,
        "download_url": download_url,
        "display_title": display_title,
    }


def iso_or_none(dt: datetime | None) -> str | None:
    """DocItemFields date formatting (doc_item_fields.py:33-36): strftime
    '%Y-%m-%dT%H:%M:%S' when a datetime, else None."""
    try:
        return dt.strftime(TS_FMT)
    except AttributeError:
        return None


@register
class DisaPubsExtractor(Extractor):
    """disa_pubs_spider.py:40-95 — 3-column rows (link, title, date).

    Derivations: doc_num = last word of the cleaned link text (:64);
    doc_type from the DISAC/DISAI substring map (:88-95, unknown names are
    dropped where the reference raises); date '%m/%d/%y' after stripping
    interior spaces (:83-86); display name '{doc_name}: {doc_title}' (:73)."""

    source = "DISA_pubs"
    base_url = "https://disa.mil"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) != 3:  # :49 skip header / malformed rows
                continue
            link_cell, title_cell, pub_cell = cells
            href = _href(link_cell)
            if not href:
                continue
            dl_url = urljoin(self.base_url, href)
            doc_name = ascii_clean(_text(link_cell))
            if "DISAC" in doc_name:
                doc_type = "Circular"
            elif "DISAI" in doc_name:
                doc_type = "Instruction"
            else:  # reference raises ValueError (:95); we drop the row
                continue
            doc_title = ascii_clean(_text(title_cell))
            try:
                published = _text(pub_cell).replace(" ", "")
                pub_date = iso_or_none(datetime.strptime(published, "%m/%d/%y"))
            except ValueError:
                pub_date = None
            doc_num = doc_name.split(" ")[-1]
            display_title = f"{doc_name}: {doc_title}"  # set_display_name :73
            raw = std_hash_fields(doc_name, doc_num, pub_date, dl_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": doc_type,
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": dl_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": dl_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


@register
class DcmaExtractor(Extractor):
    """dcma_spider.py:29-95 — 5-column rows (title, type, policy no, date,
    link). Derivations: display 'Memo' for DPS/PTM (:54-57); doc_type
    'DCMA {type}' (:59); version hash {item_currency: href, document_title,
    display_title} (:80-84); download https://www.dcma.mil{href} (:85);
    date → '%Y-%m-%dT%H:%M:%S', '' on parse failure (:16-27)."""

    source = "DCMA"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 5:
                continue
            title_c, type_c, num_c, date_c, link_c = cells[:5]
            href = _href(link_c)
            if not href:  # :45-46
                continue
            doc_title = ascii_clean(_text(title_c))
            doc_type = ascii_clean(_text(type_c))
            doc_num = ascii_clean(_text(num_c))
            display_doc_type = "Memo" if doc_type in ("DPS", "PTM") else doc_type
            doc_type = f"DCMA {doc_type}"
            doc_name = f"{doc_type} {doc_num}"
            display_title = doc_type + " " + doc_num + ": " + doc_title
            file_type = get_href_file_extension(href)
            download_url = f"https://www.dcma.mil{href}"
            # dcma_spider.py:16-27 get_pub_date: '' (not original) on failure
            dt = parse_timestamp(ascii_clean(_text(date_c)))
            pub_date = dt.strftime(TS_FMT) if dt else ""
            raw = {
                "item_currency": href,
                "document_title": doc_title,
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
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": file_type, "download_url": download_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": file_type,
                }
            )
        return [], docs


@register
class StigExtractor(Extractor):
    """stig_spider.py:33-106 — rows whose link ends in .pdf, with the title
    and date in two hidden spans. Derivations: doc_num 'V{ver}R{rel}' carved
    from ' Ver '/' Version '/' Rel '/'Release Memo' (:33-52); title slash
    cleanup (:68-70); doc_name 'STIG {num} {title}' (:73); display 'Memo'
    when the title contains it (:75-78); items URL space-encoded while the
    hashed download_url stays raw (:83-89 vs doc_item_fields.py:48)."""

    source = "stig_pubs"
    doc_type = "STIG"
    download_base_url = "https://public.cyber.mil/"

    @staticmethod
    def extract_doc_number(doc_title: str) -> tuple[str, str]:
        """stig_spider.py:33-52 verbatim."""
        if doc_title.find(" Ver ") != -1:
            ver_num = (re.findall(r" Ver (\w+)", doc_title))[0]
        else:
            if " Version " in doc_title:
                ver_num = (re.findall(r" Version (\w+)", doc_title))[0]
            else:
                ver_num = 0
        if doc_title.find(" Rel ") != -1:
            ref_num = (re.findall(r" Rel (\w+)", doc_title))[0]
        else:
            if "Release Memo" in doc_title:
                ref_num = 1
            else:
                ref_num = 0
        doc_num = f"V{ver_num}R{ref_num}"
        return doc_title, doc_num

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        span_re = re.compile(r'<span style="display:none;">(.*?)</span>', re.DOTALL)
        for row_m in ROW_RE.finditer(body):
            row = row_m.group(1)
            href_raw = _href(row)
            if not href_raw or not href_raw.endswith("pdf"):  # :58-59
                continue
            spans = span_re.findall(row)
            if len(spans) < 2:
                continue
            doc_title_text, publication_date_raw = spans[0], spans[1]
            doc_title = ascii_clean(doc_title_text).replace("/ ", " ").replace("/", " ")
            publication_date = ascii_clean(publication_date_raw)
            doc_title, doc_num = self.extract_doc_number(doc_title)
            doc_name = f"{self.doc_type} {doc_num} {doc_title}"
            display_doc_type = "Memo" if "Memo" in doc_title else "STIG"
            file_type = get_href_file_extension(href_raw)
            web_url = ensure_full_href_url(href_raw, self.download_base_url)
            pub_date = iso_or_none(parse_timestamp(publication_date))
            display_title = f"{self.doc_type} {doc_num}: {doc_title}"
            raw = std_hash_fields(doc_name, doc_num, pub_date, web_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": self.doc_type,
                    "display_doc_type": display_doc_type,
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": file_type,
                         "download_url": web_url.replace(" ", "%20"),
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": file_type,
                }
            )
        return [], docs


@register
class DhaPubsExtractor(Extractor):
    """dha_spider.py:35-97 — rows led by a <th> doc-type cell. Derivations:
    'DHA-' → 'DHA ' (:46-48); display from the contains-map
    [Instruction, Manual, Memo, Regulation] else 'Document' (:27-33);
    doc_name '{type} {num}' with the duplicate-name rule — a later row with
    the same name is kept only if its '%m/%d/%Y' date is NEWER, and then
    gets an ' Updated' suffix (:60-80); display '{doc_name}: {title}'."""

    source = "dha_pubs"
    display_types = ["Instruction", "Manual", "Memo", "Regulation"]

    @classmethod
    def get_display(cls, doc_type: str) -> str:
        for dt in cls.display_types:
            if dt in doc_type:
                return dt
        return "Document"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        doc_name_to_publication: dict[str, str] = {}
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 5:
                continue
            type_c, num_c, title_c, _status_c, date_c = cells[:5]
            href = _href(num_c)
            if href is None:
                continue
            doc_type = ascii_clean(_text(type_c) or "DHA").replace("DHA-", "DHA ").strip()
            display_doc_type = self.get_display(doc_type)
            doc_num = ascii_clean(_text(num_c))
            publication_date = ascii_clean(_text(date_c))
            doc_title = ascii_clean(_text(title_c)).replace("\r", "").replace("\n", "")
            doc_name = f"{doc_type} {doc_num}"
            display_title = doc_name + ": " + doc_title
            if doc_name in doc_name_to_publication:  # :60-80
                current = datetime.strptime(publication_date, "%m/%d/%Y")
                first = datetime.strptime(doc_name_to_publication[doc_name], "%m/%d/%Y")
                if current > first:
                    doc_name = doc_name + " Updated"
                else:
                    continue
            doc_name_to_publication[doc_name] = publication_date
            web_url = f"https://www.health.mil{href}"
            pub_date = get_pub_date(publication_date)
            raw = std_hash_fields(doc_name, doc_num, pub_date, web_url, display_title)
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
                        {"doc_type": "pdf", "download_url": web_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


@register
class FmrPubsExtractor(Extractor):
    """fmr_pubs_spider.py (spiders/fmr_spider.py) — two-level site: a volume
    index whose 'sitetitle' links (minus the first and last nav arrows, :24)
    lead to per-volume chapter tables. The reference carries vol_num in
    request meta (:26); distributed, the volume number is re-derived from the
    volume page URL ('volN_chapters.aspx'). Derivations: section carving via
    rpartition(' ') with the 3-char clamp for non-Chapter/Appendix rows
    (:39-43); title paren strip (:45-50); doc_num 'V{vol}CH{ch}' (:56);
    duplicate doc_name gets the title's pre-colon prefix appended (:64-68);
    items URL space-encoded, hash URL raw (:113-117 vs :124); file_ext is
    the doc_type string — a reference quirk (:151)."""

    source = "fmr_pubs"
    doc_type = "DoDFMR"
    download_base_url = "https://comptroller.defense.gov/"

    VOL_RE = re.compile(r"vol(\w+?)_chapters", re.IGNORECASE)
    SITETITLE_RE = re.compile(
        r'<div id="sitetitle">(.*?)</div>', re.DOTALL
    )
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        vol_m = self.VOL_RE.search(url)
        if kind == "landing" or not vol_m:
            # volume index: links [1:-1] (fmr_spider.py:24 drops nav arrows)
            m = self.SITETITLE_RE.search(body)
            if not m:
                return [], []
            anchors = self.A_RE.findall(m.group(1))[1:-1]
            return [urljoin(url, href) for href, _txt in anchors], []

        vol_num = vol_m.group(1)
        docs = []
        seen: set[str] = set()
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 3:
                continue
            sec_c, title_c, date_c = cells[:3]
            href_raw = _href(sec_c)
            if not href_raw:
                continue
            section_num_raw = _text(sec_c)
            section_type, _, ch_num = section_num_raw.rpartition(" ")
            if section_type not in ("Chapter", "Appendix"):
                ch_num = ch_num[0:3]
            doc_title_raw = _text(title_c)
            if "(" in doc_title_raw:
                doc_title_text, *_ = doc_title_raw.rpartition("(")
            else:
                doc_title_text = doc_title_raw
            doc_title = ascii_clean(doc_title_text)
            publication_date = ascii_clean(_text(date_c))
            doc_num = f"V{vol_num}CH{ch_num}"
            doc_name = f"{self.doc_type} {doc_num}"
            file_type = get_href_file_extension(href_raw)
            web_url = ensure_full_href_url(href_raw, self.download_base_url)
            if doc_name in seen:
                extra, *_ = doc_title.partition(":")
                doc_name += f" {extra}"
            seen.add(doc_name)
            pub_date = get_pub_date(publication_date)
            display_title = self.doc_type + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, web_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": self.doc_type,
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": file_type,
                         "download_url": web_url.replace(" ", "%20"),
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": self.doc_type,
                }
            )
        return [], docs


@register
class JcsPubsExtractor(Extractor):
    """jcs_pubs_spider.py — library page links to CJCS doc tables (:37-42,
    only hrefs containing 'CJCS'), each table row carving
    '(.*)\\s(\\d+.*)' into (doc_type, doc_num) (:10, :50-58). Display map
    cjcs/cjcsi/cjcsm/cjcsg → Notice/Instruction/Manual/Guide else Document
    (:24-35); CAC when any of [CAC, PKI certificate required, placeholder,
    FOUO] appears in the href or title (:71-73); items URL space-encoded,
    hash URL raw (:125-129); 'Next' pager link (:92-99)."""

    source = "jcs_pubs"
    base_url = "https://www.jcs.mil"
    cac_required_options = ["CAC", "PKI certificate required", "placeholder", "FOUO"]
    DOC_TYPE_NUM_RE = re.compile(r"(.*)\s(\d+.*)")
    LIBRARY_RE = re.compile(
        r'<div class="librarylinkscontainer">(.*?)</div>', re.DOTALL
    )
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    NEXT_BTN_RE = re.compile(r'<a class="CommandButton" href="([^"]+)"[^>]*>Next</a>')

    @staticmethod
    def get_display_doc_type(doc_type: str) -> str:
        display_type_dict = {
            "cjcs": "Notice", "cjcsi": "Instruction",
            "cjcsm": "Manual", "cjcsg": "Guide",
        }
        return display_type_dict.get(doc_type.lower(), "Document")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            links = []
            for m in self.LIBRARY_RE.finditer(body):
                for href, _txt in self.A_RE.findall(m.group(1)):
                    if "CJCS" in href:  # :38-41
                        links.append(urljoin(self.base_url, href))
            return links, []
        if kind != "listing":
            return [], []
        links = [urljoin(url, m) for m in self.NEXT_BTN_RE.findall(body)]
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 4:
                continue
            no_c, title_c, date_c, current_c = cells[:4]
            href_raw = _href(no_c)
            if not href_raw:
                continue
            doc_type_num_raw = _text(no_c)
            groups = self.DOC_TYPE_NUM_RE.search(doc_type_num_raw)
            if not groups:  # :56-58 "FAILED TO FIND GROUPS"
                continue
            doc_type = ascii_clean(groups.group(1))
            doc_num = ascii_clean(groups.group(2))
            doc_title = _text(title_c)
            publication_date = _text(date_c)
            web_url = ensure_full_href_url(href_raw, self.base_url)
            doc_name = f"{doc_type} {doc_num}"
            cac_login_required = any(
                x in href_raw for x in self.cac_required_options
            ) or any(x in doc_title for x in self.cac_required_options)
            pub_date = get_pub_date(publication_date)
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, web_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": self.get_display_doc_type(doc_type),
                    "publication_date": pub_date,
                    "cac_login_required": "true" if cac_login_required else "false",
                    "download_url": web_url,
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
        return links, docs
