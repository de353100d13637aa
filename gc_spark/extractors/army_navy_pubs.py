"""Wave-5 extractor families: Army/Navy/IC publication directorates.

Reference spiders:
  - army_pubs       spiders/army_pubs_spider.py (3-level: nav → category
                    table → per-doc detail page)
  - army_g1_pubs    spiders/army_g1_spider.py (accordion sections)
  - Bupers_Crawler  spiders/bupers_spider.py (messy multi-selector rows)
  - ic_policies     spiders/ic_policies_spider.py (Selenium article pages)
"""

from __future__ import annotations

import html as _html
import re
from datetime import datetime
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
from gc_spark.functions.dates import get_pub_date, parse_timestamp
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import abs_url, get_href_file_extension


@register
class ArmyPubsExtractor(Extractor):
    """army_pubs_spider.py — three levels. Nav (:35-57): the primary-nav
    item's links minus the do_not_process stoplist. Category page (:59-73):
    table links followed to detail pages, with the page's 'registration is
    required' notice deciding cac_login_required for every doc under it.
    Detail page (:75-122): 'Pub/Form *' labelled fields; linked Unit-of-Issue
    items (space-encoded URLs) or, linkless, a generic item pointing at the
    base URL (:89-100); standard 5-field hash (:160-166).

    Dataflow note: the reference carries the category page's CAC flag to
    detail pages via cb_kwargs. Distributed, the flag is re-derived on the
    detail page from the reference's OWN gated-category list
    (cac_gated_hrefs, :45-48) matched against the detail URL's category
    token — the two encodings of the same fact."""

    source = "army_pubs"
    base_url = "https://armypubs.army.mil"
    pub_url = base_url + "/ProductMaps/PubForm/"
    DO_NOT_PROCESS = [
        "/ProductMaps/PubForm/PB.aspx",
        "/Publications/Administrative/POG/AllPogs.aspx",
    ]
    CAC_GATED = [  # army_pubs_spider.py:45-48 (category tokens)
        "EM", "FT", "LO", "MWO", "SB", "SC", "TB",
        "TM_1_8", "TM_9", "TM_10", "TM_11_4", "TM_11_5", "TM_11_6_7", "TM_14_750",
    ]
    NAV_RE = re.compile(
        r'<li class="usa-nav__primary-item">(.*?)</li>', re.DOTALL
    )
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    FIELD_RE = {
        "number": re.compile(r"Pub/Form Number</[^>]+><td>([^<]*)"),
        "title": re.compile(r"Pub/Form Title</[^>]+><td>([^<]*)"),
        "date": re.compile(r"Pub/Form Date</[^>]+><td>([^<]*)"),
        "proponent": re.compile(r"Pub/Form Proponent</[^>]+><td>([^<]*)"),
    }
    UOI_RE = re.compile(r"Unit Of Issue\(s\)</[^>]+><td>(.*?)</td>", re.DOTALL)

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            navs = self.NAV_RE.findall(body)
            if len(navs) < 3:
                return [], []
            links = [
                urljoin(url, h)
                for h, _t in self.A_RE.findall(navs[2])
                if h not in self.DO_NOT_PROCESS
            ]
            return links, []
        if kind == "listing":  # category page: table links → detail pages
            links = []
            for row_m in ROW_RE.finditer(body):
                for cell in _cells(row_m.group(1)):
                    h = _href(cell)
                    if h:
                        links.append(self.pub_url + h)
            return links, []
        if kind != "detail":
            return [], []

        m = {k: rx.search(body) for k, rx in self.FIELD_RE.items()}
        if not m["number"] or not m["title"]:
            return [], []
        doc_name_raw = m["number"].group(1)
        doc_title = m["title"].group(1)
        publication_date = m["date"].group(1) if m["date"] else None
        parts = doc_name_raw.split()
        if not parts:
            return [], []
        doc_num_raw = parts[-1]
        doc_type_raw = parts[0]

        uoi = self.UOI_RE.search(body)
        downloadable_items = []
        if uoi:
            anchors = self.A_RE.findall(uoi.group(1))
            if anchors:
                for href, text in anchors:
                    downloadable_items.append(
                        {
                            "doc_type": _text(text).strip().lower(),
                            "download_url": abs_url(self.base_url, href).replace(" ", "%20"),
                            "compression_type": None,
                        }
                    )
            else:
                filetype = _text(uoi.group(1))
                if filetype:
                    downloadable_items.append(
                        {
                            "doc_type": filetype.strip().lower(),
                            "download_url": self.base_url,
                            "compression_type": None,
                        }
                    )
                else:
                    return [], []
        if not downloadable_items:
            return [], []

        category = url[len(self.pub_url):].split("/")[0].split(".")[0].split("?")[0]
        cac_login_required = any(
            category == g or category.startswith(g + "_") for g in self.CAC_GATED
        )
        doc_name = ascii_clean(doc_name_raw)
        doc_num = ascii_clean(doc_num_raw)
        doc_type = ascii_clean(doc_type_raw)
        pub_date = get_pub_date(ascii_clean(publication_date or ""))
        download_url = downloadable_items[0]["download_url"]
        display_title = doc_type + " " + doc_num + ": " + ascii_clean(doc_title)
        raw = std_hash_fields(doc_name, doc_num, pub_date, download_url, display_title)
        return [], [
            {
                "doc_name": doc_name,
                "doc_title": ascii_clean(doc_title),
                "doc_num": doc_num,
                "doc_type": doc_type,
                "display_doc_type": "Document",
                "publication_date": pub_date,
                "cac_login_required": "true" if cac_login_required else "false",
                "download_url": download_url,
                "downloadable_items": downloadable_items,
                "version_hash_raw_data": raw,
                "display_title": display_title,
                "file_ext": downloadable_items[0]["doc_type"],
            }
        ]


@register
class ArmyG1Extractor(Extractor):
    """army_g1_spider.py — one page of .inner-container sections (h4 label)
    holding accordions. Per anchor (:94-137): only .pdf/.docx links; non-ascii
    titles byte-escaped via str(text.encode('utf-8'))[2:-1] (:42-48, :104-106);
    title edge cases incl. the NCO-board renames and the 'DA PAM d+-d+' strip
    (:67-80); doc_num = first 'd{2,4}-d{1,4}' in the SECTION label (:56-64);
    doc_name from the URL basename (:51-54); date from the 'YYYY/MM/DD' run
    in the URL else 'Unknown' (:82-91); standard hash with display_title
    overwritten by doc_title (:133-134)."""

    source = "army_g1_pubs"
    # nesting-insensitive: chunk on the opening tags rather than balancing
    # close tags (the derivation logic, not HTML tree fidelity, is the spec)
    CONTAINER_SPLIT = '<div class="inner-container">'
    ACCORDION_SPLIT = '<div class="accordion">'
    H4_RE = re.compile(r"<h4>(.*?)</h4>", re.DOTALL)
    LABEL_RE = re.compile(r"<label for=[^>]*>(.*?)</label>", re.DOTALL)
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)

    @staticmethod
    def is_ascii_encoded(text: str) -> bool:
        try:
            text.encode("ascii")
            return False
        except UnicodeEncodeError:
            return True

    @staticmethod
    def extract_doc_number(text: str) -> str:
        match = re.search(r"(\d{2,4}-\d{1,4})", text)
        return match.group(1) if match else "N/A"

    @staticmethod
    def title_edge_cases(text: str, label: str) -> str:
        if "Board Brief; NCO Evaluation Board Supplement" in text:
            return label + " Board Brief"
        if "NCO Evaluation Board Supplement" in text:
            return label
        if text.endswith(".pdf") or text.endswith("docx"):
            return label
        pattern = r"(?:DA\s+)?PAM\s+\d{2,4}-\d{2,4}"
        cleaned_text = re.sub(pattern, "", text)
        stripped_text = cleaned_text.strip()
        if "\\xc2\\xa0" in stripped_text:
            stripped_text = stripped_text.replace("\\xc2\\xa0", " ")
        return _html.unescape(stripped_text)

    @staticmethod
    def extract_date_from_url(url: str):
        match = re.search(r"(\d{4}/\d{2}/\d{2})", url)
        if match:
            return datetime.strptime(match.group(1), "%Y/%m/%d")
        return "Unknown"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        for container in body.split(self.CONTAINER_SPLIT)[1:]:
            h4 = self.H4_RE.search(container)
            container_label = _text(h4.group(1)) if h4 else ""
            for accordion in container.split(self.ACCORDION_SPLIT)[1:]:
                label_m = self.LABEL_RE.search(accordion)
                if not label_m:
                    continue
                label_text = _text(label_m.group(1)).strip()
                for link, text_html in self.A_RE.findall(accordion):
                    text = _html.unescape(re.sub(r"<[^>]+>", "", text_html))
                    if not (link.endswith(".pdf") or link.endswith(".docx")):
                        continue
                    if self.is_ascii_encoded(text):
                        text = str(text.encode("utf-8"))[2:-1]
                    doc_title = self.title_edge_cases(text, label_text)
                    doc_number = self.extract_doc_number(container_label)
                    doc_name = link.split("/")[-1].split(".")[0]
                    publication_date = self.extract_date_from_url(link)
                    file_type = get_href_file_extension(link)
                    pub_date = iso_or_none(
                        publication_date if isinstance(publication_date, datetime) else None
                    )
                    display_title = "DA PAM" + " " + doc_number + ": " + doc_title
                    raw = std_hash_fields(doc_name, doc_number, pub_date, link, display_title)
                    raw["display_title"] = doc_title  # :133-134 overwrite
                    docs.append(
                        {
                            "doc_name": doc_name,
                            "doc_title": doc_title,
                            "doc_num": doc_number,
                            "doc_type": "DA PAM",
                            "display_doc_type": "DA PAM",
                            "publication_date": pub_date,
                            "cac_login_required": "false",
                            "download_url": link,
                            "downloadable_items": [
                                {"doc_type": file_type, "download_url": link,
                                 "compression_type": None}
                            ],
                            "version_hash_raw_data": raw,
                            "display_title": display_title,
                            "file_ext": file_type,
                        }
                    )
        return [], docs


@register
class BupersExtractor(Extractor):
    """bupers_spider.py — one messy table (rows 4+, :121-123). Per row:
    doc-num fragments merged by the suffix rules ('A'/'B'/'C' glue, 'w/CH-1'
    join, '- Cancellation' full join, :40-52), CH-1 preferred on duplicates
    and the stateful 1750.10D 'Vol 1'/'Vol 2' rename (:54-64); latest date
    wins after dropping hidden '0's (:66-70); the superfluous 1730.11
    supplement link dropped and the LAST link space-encoded (:72-77);
    doc_name normalized against legacy manifests (match_old_doc_name,
    :79-101); hash led by download_url (:196-202)."""

    source = "Bupers_Crawler"
    start_url = "https://www.mynavyhr.navy.mil/References/BUPERS-Instructions/"
    allowed_domain = "mynavyhr.navy.mil"

    @staticmethod
    def clean(text: str) -> str:
        return text.replace("\xa0", " ").encode("ascii", "ignore").decode("ascii").strip()

    @staticmethod
    def filter_empty(text_list):
        return list(filter(lambda a: a, text_list))

    @staticmethod
    def merge_suffix(doc_nums):
        if len(doc_nums) > 1 and doc_nums[-2] in ["A"]:
            doc_nums = ["".join(doc_nums[:2])] + doc_nums[-1:]
        if doc_nums[-1] in ["w/CH-1"]:
            return doc_nums[:-2] + [" ".join(doc_nums[-2:])]
        elif doc_nums[-1] in ["A", "B", "C"]:
            return doc_nums[:-2] + ["".join(doc_nums[-2:])]
        elif "- Cancellation" in doc_nums[-1]:
            return [" ".join(i for i in doc_nums)]
        else:
            return doc_nums

    @staticmethod
    def latest_date(dates):
        dates = [date for date in dates if date != "0"]
        return dates[-1]

    @staticmethod
    def dedup_link(links):
        links = [ln for ln in links if "Supplement to BUPERSINST 1730.11" not in ln]
        return links[-1].replace(" ", "%20")

    @staticmethod
    def match_old_doc_name(text: str) -> str:
        if text == "BUPERSINST BUPERSNOTE 1401":
            return "BUPERSINST BUPERSNOTE1401"
        if text == "BUPERSINST 1510-100":
            return "BUPERSINST 1510100"
        if text == "BUPERSINST 5800.1A CH-1":
            return "BUPERSINST 5800.1A"
        if text == "BUPERSINST 12600.4 CH-1":
            return "BUPERSINST 12600.4CH1"
        if "1640.20B" not in text:
            return re.sub(r"CH-(\d)", r"CH\1", text)
        return text

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        v_list = iter(["Vol 1", "Vol 2"])  # per-page twin of the spider-lifetime iter
        rows = list(ROW_RE.finditer(body))[3:]  # :121-123 nth-child(n+4)
        for row_m in rows:
            cells = _cells(row_m.group(1))
            if len(cells) < 3:
                continue
            links_raw = re.findall(r'href="([^"]+)"', cells[0])
            if not links_raw:
                continue
            frag_re = re.compile(r">([^<>]+)<")
            doc_nums_raw = [f for f in frag_re.findall(cells[0])]
            doc_titles_raw = [f for f in frag_re.findall("<x>" + cells[1] + "<y>")]
            dates_raw = [f for f in frag_re.findall("<x>" + cells[2] + "<y>")]

            doc_nums = self.filter_empty([self.clean(t) for t in doc_nums_raw])
            if not doc_nums:
                continue
            doc_nums = self.merge_suffix(doc_nums)
            # dedup_nums (:54-64) with the stateful 1750.10D volume rename
            if len(doc_nums) > 1:
                doc_nums = [i for i in doc_nums if "CH-1" in i]
            elif doc_nums[0] == "1750.10D":
                doc_nums[0] = "1750.10D " + (next(v_list, None) or "")
            if not doc_nums:
                continue
            doc_title = " ".join(self.filter_empty([self.clean(t) for t in doc_titles_raw]))
            dates_cleaned = self.filter_empty([self.clean(t) for t in dates_raw])
            if not dates_cleaned:
                continue
            publication_date = self.latest_date(dates_cleaned)
            href = self.dedup_link(self.filter_empty(links_raw))

            doc_num = ascii_clean(doc_nums[0])
            doc_title = ascii_clean(doc_title)
            pub_date = get_pub_date(publication_date)
            display_title = "BUPERSINST " + doc_num + ": " + doc_title
            doc_name = self.match_old_doc_name(f"BUPERSINST {doc_num}")
            download_url = "https://www." + self.allowed_domain + href
            file_type = get_href_file_extension(href)
            item_url = urljoin(self.start_url, href)
            raw = {
                "download_url": download_url,
                "doc_name": doc_name,
                "doc_num": doc_num,
                "publication_date": pub_date,
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": "BUPERSINST",
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": file_type, "download_url": item_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": file_type,
                }
            )
        return [], docs


@register
class IcPoliciesExtractor(Extractor):
    """ic_policies_spider.py — Selenium-rendered article pages (headed fetch
    via RendererFetcher; the articleBody shape is the contract). Per <p> with
    a link (:139-178): doc_type from the page URL suffix (:80-88); the
    '^[A-Z]* d.d.d.d ' name pattern, falling back to the legal-reference
    split (:90-109); publication date from the LAST '(...)' group in the
    %20→'-' pdf URL (:155-157); the CAC keyword list (:111-120); standard
    5-field hash; display map icd/icpg/icpm (:68-74)."""

    source = "ic_policies"
    base_url = "https://www.dni.gov"
    ARTICLE_RE = re.compile(
        r'<div itemprop="articleBody">(.*?)</div>', re.DOTALL
    )
    P_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>', re.DOTALL)
    NAME_RE = re.compile(r"^[A-Z]*\s\d*.\d*.\d*.\d*\s")
    CAC_REQUIRED = ["CAC", "PKI certificate required", "placeholder", "FOUO"]

    @staticmethod
    def get_doc_type(url: str) -> str:
        if url.endswith("directives"):
            return "ICD"
        if url.endswith("guidance"):
            return "ICPG"
        if url.endswith("memorandums"):
            return "ICPM"
        return "ICLR"

    @staticmethod
    def get_display_doc_type(doc_type: str) -> str:
        return {"icd": "Directive", "icpg": "Guide", "icpm": "Manual"}.get(
            doc_type.lower(), "Document"
        )

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        art = self.ARTICLE_RE.search(body)
        if not art:
            return [], []
        doc_type = self.get_doc_type(url)
        docs = []
        for p in self.P_RE.findall(art.group(1)):
            a = self.A_RE.search(p)
            if a is None:
                continue
            data = re.sub("\u00a0", " ", _html.unescape(re.sub(r"<[^>]+>", "", p)))
            pdf_url = abs_url(self.base_url, a.group(1))
            names = self.NAME_RE.findall(data)
            if names:  # get_policy_doc_info (:90-99)
                parsed_text = names[0]
                parsed_name = parsed_text.split(" ")
                doc_name = " ".join(parsed_name[:2])
                doc_num = parsed_name[1]
                doc_title = re.sub(parsed_text, "", data)
            else:  # get_legal_doc_info (:101-107)
                split_data = data.split(" ")
                doc_name = " ".join(split_data[:-1])
                doc_num = split_data[-1]
                doc_title = doc_name
            matches = re.findall(r"\((.+)\)", pdf_url.replace("%20", "-"))
            publication_date = matches[-1] if len(matches) > 0 else None
            cac = any(x in pdf_url for x in self.CAC_REQUIRED) or any(
                x in doc_title for x in self.CAC_REQUIRED
            )
            pub_date = iso_or_none(parse_timestamp(publication_date))
            doc_name = doc_name.strip()
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, pdf_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": self.get_display_doc_type(doc_type),
                    "publication_date": pub_date,
                    "cac_login_required": "true" if cac else "false",
                    "download_url": pdf_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": pdf_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs
