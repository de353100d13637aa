"""Wave-4 extractor families: service publication libraries.

Reference spiders:
  - tradoc                   spiders/tradoc_spider.py (multi-file rows with
                             'with Change N' carving)
  - secnav_pubs              spiders/secnav_spider.py (SharePoint JSON blob
                             embedded in a <script>)
  - samm_policy              spiders/samm_spider.py (chapters-as-html-docs +
                             two-hop policy memoranda)
  - navy_personnel_messages  spiders/navy_personnel_messages_spider.py
                             (NAVADMIN/ALNAV year boards with typo'd years)
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.extractors.pubs_tables import ROW_RE, _cells, _href, _text
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import ensure_full_href_url, get_href_file_extension


def _clean_name(name: str) -> str:
    """tradoc_spider.py:137-142 / navy_personnel_messages_spider.py:78-79:
    '/'→'_', scrub [^a-zA-Z0-9. ()-_], squash spaces."""
    return " ".join(
        re.sub(r"[^a-zA-Z0-9. ()-_]", "", ascii_clean(name).replace("/", "_")).split()
    )


@register
class TradocExtractor(Extractor):
    """tradoc_spider.py — category index (#content p a, :42-45) leading to
    pubsTable pages. Derivations: category code from the h2 'TRADOC ...
    (<code>s)' heading (:48-51); rows may hold several docs — one per
    fileLink span, zipped against stacked numbers/dates (:77-99);
    '<num> with Change <n>' carving via _doc_num_rgx with the row's FIRST
    number as fallback base (:22-26, :144-160) giving doc_num
    '{code}{num}[C{change}]' and a ' with Change N' title suffix; the
    4-format date cascade (:162-184); CACrequired rows skipped (:70-74);
    pdf item forced first (:113-121); hash led by download_url (:206-212)."""

    source = "tradoc"
    DOC_NUM_RGX = re.compile(
        r"^(?P<num>[-0-9a-zA-Z]+)?(?: with )?(?:Change (?P<change>\d+))?$", re.IGNORECASE
    )
    H2_RE = re.compile(r"<h2>(.*?)</h2>", re.DOTALL)
    CONTENT_A_RE = re.compile(r'<p><a href="([^"]+)"', re.DOTALL)
    SPAN_RE = re.compile(r'<span class="fileLink">(.*?)</span>', re.DOTALL)
    HREFS_RE = re.compile(r'href="([^"]+)"')

    @classmethod
    def parse_doc_num(cls, code: str, doc_num: str, base_doc_num: str):
        match = cls.DOC_NUM_RGX.match(doc_num)
        if not match:
            raise ValueError(f"unknown doc num format {str(doc_num)}")
        matchdict = match.groupdict()
        if not matchdict.get("num"):
            base_match = cls.DOC_NUM_RGX.match(base_doc_num)
            if not base_match or not base_match.groupdict().get("num"):
                raise ValueError(f"unknown doc num format {str(base_doc_num)}")
            matchdict["num"] = base_match["num"]
        doc_num = matchdict["num"]
        doc_change = matchdict.get("change")
        if doc_change:
            doc_num = f"{code}{doc_num}C{doc_change}"
        else:
            doc_num = f"{code}{doc_num}"
        return doc_num, doc_change

    @staticmethod
    def parse_date(date_str: str) -> str:
        for fmt in ("%d %b %Y", "%b %d, %Y", "%b %Y", "%B %Y"):
            try:
                return datetime.strptime(date_str, fmt).strftime("%Y-%m-%d")
            except ValueError:
                pass
        raise ValueError(f"unknown date format {str(date_str)}")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            return [urljoin(url, h) for h in self.CONTENT_A_RE.findall(body)], []
        if kind != "listing":
            return [], []
        h2 = self.H2_RE.search(body)
        if not h2:
            return [], []
        cat_m = re.match(r"TRADOC .+ \((?P<code>.+)s\)", _text(h2.group(1)))
        if not cat_m:
            return [], []
        code = cat_m["code"]
        doc_category = _text(h2.group(1))
        docs = []
        for row_m in ROW_RE.finditer(body):
            row = row_m.group(1)
            if "CACrequired" in row:
                continue
            cells = _cells(row)
            if len(cells) < 3 or "colspan" in row.split(">", 1)[0]:
                continue
            num_c, date_c, title_c = cells[0], cells[1], cells[2]
            # stacked numbers/dates separated by <br/>
            doc_nums = [t.strip() for t in re.split(r"<br\s*/?>", num_c) if _text(t).strip()]
            doc_nums = [_text(t) for t in doc_nums]
            doc_dates = [t.strip() for t in re.split(r"<br\s*/?>", date_c) if _text(t).strip()]
            doc_dates = [_text(t) for t in doc_dates]
            row_title = _text(re.sub(r"<span.*?</span>", "", title_c, flags=re.DOTALL))
            doc_url_lists = [
                self.HREFS_RE.findall(span) for span in self.SPAN_RE.findall(title_c)
            ]
            if not (len(doc_nums) == len(doc_dates) == len(doc_url_lists)):
                continue
            for doc_num_raw, doc_date, doc_url_list in zip(doc_nums, doc_dates, doc_url_lists):
                try:
                    doc_num, doc_change = self.parse_doc_num(code, doc_num_raw, doc_nums[0])
                    publication_date = self.parse_date(doc_date)
                except ValueError:
                    continue
                doc_title = f"{row_title} with Change {doc_change}" if doc_change else row_title
                web_urls = [urljoin(url, u) for u in doc_url_list]
                downloadable_items = []
                for web_url in web_urls:
                    ext = get_href_file_extension(web_url)
                    item = {"doc_type": ext, "download_url": web_url, "compression_type": None}
                    if ext == "pdf":
                        downloadable_items.insert(0, item)
                    else:
                        downloadable_items.append(item)
                if not downloadable_items:
                    continue
                doc_name = _clean_name(f"TRADOC {doc_num}")
                download_url = downloadable_items[0]["download_url"].replace(" ", "%20")
                display_title = (
                    ascii_clean(doc_category) + " " + ascii_clean(doc_num)
                    + ": " + ascii_clean(doc_title)
                )
                raw = {
                    "download_url": download_url,
                    "doc_name": doc_name,
                    "doc_num": ascii_clean(doc_num),
                    "publication_date": publication_date,
                    "display_title": display_title,
                }
                docs.append(
                    {
                        "doc_name": doc_name,
                        "doc_title": ascii_clean(doc_title),
                        "doc_num": ascii_clean(doc_num),
                        "doc_type": ascii_clean(doc_category),
                        "display_doc_type": "Document",
                        "publication_date": publication_date,
                        "cac_login_required": "false",
                        "download_url": download_url,
                        "downloadable_items": downloadable_items,
                        "version_hash_raw_data": raw,
                        "display_title": display_title,
                        "file_ext": downloadable_items[0]["doc_type"],
                    }
                )
        return [], docs


@register
class SecnavExtractor(Extractor):
    """secnav_pubs — SharePoint lists rendered as a WPQ3ListData JSON blob
    inside a <script> (secnav_spider.py:14, :85-95). The URL picks the type
    suffix (allinstructions→INST, notices→NOTE, :23-26); doc_type =
    Echelon+suffix (:103); CAC when the doc number starts with a letter
    (:115); is_revoked when Status != Active (:114-116); 8-field hash with
    status/sponsor/cancel_date (:180-189); display map by doc_type suffix
    (:37-44); source_page_url pinned to default.aspx (:169); NextHref
    pagination appended to the base url (:126-128)."""

    source = "secnav_pubs"
    download_base_url = "https://www.secnav.navy.mil"
    URLS_TYPE_MAP = [
        ("https://www.secnav.navy.mil/doni/allinstructions.aspx", "INST"),
        ("https://www.secnav.navy.mil/doni/notices.aspx", "NOTE"),
    ]
    JSON_RE = re.compile(r"var WPQ3ListData = (?P<json>{.*?});", flags=re.M | re.S)

    @staticmethod
    def get_display_doc_type(doc_type: str) -> str:
        if doc_type.strip().lower().endswith("inst"):
            return "Instruction"
        elif doc_type.strip().lower().endswith("note"):
            return "Notice"
        return "Document"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":  # default.aspx → the two typed boards
            return [u for u, _t in self.URLS_TYPE_MAP], []
        if kind != "listing":
            return [], []
        base = next((b for b, _t in self.URLS_TYPE_MAP if url.startswith(b)), None)
        type_suffix = next((t for b, t in self.URLS_TYPE_MAP if url.startswith(b)), None)
        if type_suffix is None:
            return [], []
        m = self.JSON_RE.search(body)
        if not m:
            return [], []
        data = json.loads(m.group("json"))
        docs = []
        for r in data.get("Row", []):
            echelon = ascii_clean(r.get("Echelon") or "")
            doc_num = ascii_clean(r.get("FileLeafRef") or "").replace(".pdf", "")
            doc_type = f"{echelon}{type_suffix}"
            status = r.get("Status")
            doc_title = ascii_clean(r.get("Subject") or "")
            download_url = f"{self.download_base_url}{r.get('FileRef')}"
            pub_date = get_pub_date(r.get("Effective_x0020_Date"))
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "doc_name": f"{doc_type} {doc_num}",
                "doc_num": doc_num,
                "publication_date": pub_date,
                "download_url": download_url,
                "status": status,
                "sponsor": (r.get("Sponsor") or "").replace("&amp;", "&"),
                "cancel_date": r.get("Cancelled_x0020_Date"),
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": f"{doc_type} {doc_num}",
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": self.get_display_doc_type(doc_type),
                    "publication_date": pub_date,
                    "cac_login_required": (
                        "true" if re.match("^[A-Za-z]", doc_num) is not None else "false"
                    ),
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": r.get("File_x0020_Type"),
                         "download_url": download_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": r.get("File_x0020_Type"),
                    "is_revoked": "true" if status != "Active" else "false",
                    "source_page_url": "https://www.secnav.navy.mil/doni/default.aspx",
                }
            )
        links = []
        if data.get("NextHref"):
            links.append(f"{base}{data['NextHref']}")
        return links, docs


@register
class SammExtractor(Extractor):
    """samm_policy — two start URLs with different shapes (samm_spider.py).
    Chapters listing (:49-62): menu anchors starting /chapter/ become
    html-typed documents of the chapter page itself (:64-100: doc_name
    'SAMM_{chapter}' underscore-joined, publication 'N/A', status 'N/A').
    Memo listing (:28-47): table rows followed to the memo page, whose
    PM_PDF_ink link completes the doc (:103-135: parenthesis/comma scrub,
    trailing-specials scrub, doc_num = first 'd+-d+' match, is_revoked
    unless Active/Incorporated). Hash has display_org/is_revoked/status
    (:168-177). The memo second hop rides operators/pending.py (detail_url /
    detail_download_href), like marine_pubs."""

    source = "samm_policy"
    base_url = "https://samm.dsca.mil"
    CHAPTER_A_RE = re.compile(
        r'<a href="(/chapter/[^"]+)" title="([^"]*)"[^>]*>(.*?)</a>', re.DOTALL
    )
    PDF_LINK_RE = re.compile(
        r'<div[^>]*class="[^"]*PM_PDF_ink[^"]*"[^>]*>.*?<a href="([^"]+)"', re.DOTALL
    )

    @staticmethod
    def extract_doc_number(doc_name: str) -> str:
        match = re.search(r"(\d+-\d+)", doc_name)
        return match.group(0) if match else ""

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if url == "https://samm.dsca.mil/listing/chapters" and kind == "listing":
            docs = []
            for href, title, chapter in self.CHAPTER_A_RE.findall(body):
                chapter = _text(chapter)
                doc_title = ascii_clean(title).replace("/ ", " ").replace("/", " ")
                web_url = urljoin(self.base_url, href)
                doc_name = " ".join(["SAMM", chapter]).replace(" ", "_")
                display_title = "SAMM " + chapter + ": " + doc_title
                raw = {
                    "doc_name": doc_name,
                    "display_org": "Defense Security Cooperation Agency",
                    "doc_num": chapter,
                    "publication_date": "N/A",
                    "download_url": web_url.replace(" ", "%20"),
                    "display_title": display_title,
                    "is_revoked": "False",
                    "status": "N/A",
                }
                docs.append(
                    {
                        "doc_name": doc_name,
                        "doc_title": doc_title,
                        "doc_num": chapter,
                        "doc_type": "SAMM",
                        "display_doc_type": "Document",
                        "publication_date": "N/A",
                        "cac_login_required": "false",
                        "download_url": web_url.replace(" ", "%20"),
                        "downloadable_items": [
                            {"doc_type": "html",
                             "download_url": web_url.replace(" ", "%20"),
                             "compression_type": None}
                        ],
                        "version_hash_raw_data": raw,
                        "display_title": display_title,
                        "file_ext": "html",
                    }
                )
            return [], docs

        if "PolicyMemoList" in url and kind == "listing":
            # memo rows park as pending docs; the memo page's PM_PDF_ink
            # href completes them (reference cb_kwargs carry, :44-47)
            docs = []
            for row_m in ROW_RE.finditer(body):
                cells = _cells(row_m.group(1))
                if len(cells) < 6:
                    continue
                status = _text(cells[5]).strip()
                # reference quirk :35 — `== "Active" or "Incorporated"` is
                # always truthy, so NO row is filtered by status here
                href = _href(cells[1])
                if not href:
                    continue
                doc_name_raw = _text(cells[1]).strip()
                doc_title = _text(cells[4])
                time_m = re.search(r'datetime="([^"T]+)', cells[0])
                pub_date = get_pub_date(time_m.group(1).strip()) if time_m else None
                detail_url = urljoin(self.base_url, href)
                doc_num = self.extract_doc_number(doc_name_raw)
                doc_name = ascii_clean(doc_name_raw.replace(" ", "_"))
                doc_name = re.sub(r"[\(\),]", "", doc_name)
                doc_name = re.sub(r"[\W_\.]+$", "", doc_name)
                doc_type = "SAMM Policy Memoranda"
                is_revoked = not (status == "Active" or status == "Incorporated")
                display_title = doc_type + " " + doc_num + ": " + doc_title
                # download_url key is ABSENT here: resolve_pending map_concats
                # it in when the memo page completes this pending doc (the
                # hash fold sorts keys, so late insertion is hash-identical)
                raw = {
                    "doc_name": doc_name,
                    "display_org": "Defense Security Cooperation Agency",
                    "doc_num": doc_num,
                    "publication_date": pub_date,
                    "display_title": display_title,
                    "is_revoked": str(is_revoked),
                    "status": status,
                }
                docs.append(
                    {
                        "doc_name": doc_name,
                        "doc_title": doc_title,
                        "doc_num": doc_num,
                        "doc_type": doc_type,
                        "display_doc_type": "Memorandum",
                        "publication_date": pub_date,
                        "cac_login_required": "false",
                        "download_url": None,
                        "downloadable_items": None,
                        "version_hash_raw_data": raw,
                        "display_title": display_title,
                        "is_revoked": "true" if is_revoked else "false",
                        "detail_url": detail_url,
                    }
                )
            return [d["detail_url"] for d in docs], docs

        if kind == "detail":  # memo page: the PM_PDF_ink download link
            m = self.PDF_LINK_RE.search(body)
            if not m:
                return [], []
            return [], [{"detail_download_href": ensure_full_href_url(m.group(1), url)}]
        return [], []


@register
class NavyPersonnelMessagesExtractor(Extractor):
    """navy_personnel_messages — year boards per message type. Landing:
    afMenuLinkHeader anchors (:25-27). Board pages: '<type> <year>' heading
    (:31-34); rows after the header carry num/title/date; the year portion
    of doc_num is REPLACED from the page heading (typo workaround, :40-41);
    is_revoked when the title contains 'cancelled' (:45); BUPERS-site links
    ignored (:47-48); 3-format date cascade + the literal '8/16/201' typo
    pin (:81-100); hash download_url is the BASENAME (:140); items doc_type
    'txt' (:128-132)."""

    source = "navy_personnel_messages"
    MENU_A_RE = re.compile(r'<div class="afMenuLinkHeader">\s*<a href="([^"]+)"')
    HEAD_RE = re.compile(r"<strong>(.*?)</strong>", re.DOTALL)

    @staticmethod
    def parse_date(date_str: str) -> str:
        for fmt in ("%m/%d/%Y", "%m/%d %Y", "%m/%d%Y"):
            try:
                return datetime.strptime(date_str, fmt).strftime("%Y-%m-%d")
            except ValueError:
                pass
        if date_str == "8/16/201":
            return "2021-08-16"
        raise ValueError(f"unknown date format {date_str}")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            return [urljoin(url, h) for h in self.MENU_A_RE.findall(body)], []
        if kind != "listing":
            return [], []
        head = self.HEAD_RE.search(body)
        if not head:
            return [], []
        head_m = re.match(r"(?P<type>\S+) (?P<year>\d+)", _text(head.group(1)))
        if not head_m:
            return [], []
        doc_type, doc_year = head_m["type"], head_m["year"]
        docs = []
        rows = list(ROW_RE.finditer(body))[1:]  # skip header row
        for row_m in rows:
            cells = _cells(row_m.group(1))
            if len(cells) < 3:
                continue
            doc_num = ascii_clean(_text(cells[0]))
            doc_num = f"{doc_num.split('/')[0]}/{doc_year[-2:]}"
            doc_title = ascii_clean(_text(cells[1]))
            is_revoked = "cancelled" in doc_title.lower()
            doc_url = None
            for href in re.findall(r'href="([^"]+)"', cells[1]):
                if "/bupers-npc/" not in href:
                    doc_url = href
                    break
            if doc_url is None:
                continue
            try:
                publication_date = self.parse_date(ascii_clean(_text(cells[2])))
            except ValueError:
                continue
            doc_name = _clean_name(f"{doc_type} {doc_num}")
            web_url = urljoin(url, doc_url)
            pub_date = get_pub_date(publication_date)
            display_title = (
                ascii_clean(doc_type) + " " + ascii_clean(doc_num) + ": " + doc_title
            )
            raw = {
                "doc_name": doc_name,
                "doc_num": ascii_clean(doc_num),
                "publication_date": pub_date,
                "download_url": web_url.split("/")[-1],  # basename quirk
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": ascii_clean(doc_num),
                    "doc_type": ascii_clean(doc_type),
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": "txt", "download_url": web_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": get_href_file_extension(doc_url),
                    "is_revoked": "true" if is_revoked else "false",
                }
            )
        return [], docs
