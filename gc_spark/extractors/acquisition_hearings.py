"""Wave-7b extractor families: acquisition regs, hearings, and spotlight
pages — the last six reference spiders.

Reference spiders:
  - dfars_pgi                 spiders/dfars_pgi_spider.py (stateful TOC rows,
                              two docs per row)
  - far_subpart_regs          spiders/far_subpart_regs_spider.py (Selenium
                              subpart expansion — parsed from the rendered
                              DOM, RendererFetcher shape)
  - NDAA_pubs                 spiders/ndaa_spider.py (link-shape dispatch)
  - SASC                      spiders/sasc_spider.py (hearing pages; witness
                              pdf redirects resolved via the pending join)
  - UFC                       spiders/ufc_spider.py (paged tables → per-doc
                              pages, fc-2 and changes sub-tables)
  - DOD_Coronavirus_Guidance  spiders/dod_coronavirus_spider.py (spotlight
                              grid; follow pages complete items via the
                              pending join with the item_currency hash key)
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.extractors.pubs_tables import ROW_RE, _cells, _href, _text
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.text import ascii_clean
from gc_spark.functions.urls import ensure_full_href_url, get_href_file_extension


def _clean_name_dfars(name: str) -> str:
    """dfars_pgi_spider.py:123-124: '/'→'-', scrub, squash."""
    return " ".join(
        re.sub(r"[^a-zA-Z0-9. ()\\-]", "", ascii_clean(name).replace("/", "-")).split()
    )


@register
class DfarsPgiExtractor(Extractor):
    """dfars_pgi — current-version TOC. Landing (:22-31): publication date
    from the 'Current Version (MM/DD/YYYY)' option, the DFARS-Table iframe
    followed (date re-derivable on the iframe page, which repeats the
    option list). Table rows (:34-120): 'rule' rows reset the running
    part-num/title state; other rows inherit missing titles from it and
    prefix TOC/COVER/APPENDIX-PART subparts with the previous number;
    'NO DFARS TEXT' rows skipped; up to TWO docs per row (DFARS + PGI, the
    PGI number derived by regex :126-136); hash download_url is the
    BASENAME (:172-178)."""

    source = "dfars_pgi"
    start_url = "https://www.acq.osd.mil/dpap/dars/dfarspgi/current"
    DATE_RE = re.compile(r"Current Version \((?P<date>\d{2}/\d{2}/\d{4})\)")
    IFRAME_RE = re.compile(r'<iframe title="DFARS Table" src="([^"]+)"')

    @staticmethod
    def derive_pgi_num(dfars_num: str) -> str:
        num_match = re.match(r"[A-Z]+ (?P<num>\d+(?:\.\d+)?)", dfars_num)
        if num_match:
            return f'PGI {num_match["num"]}'
        num_match = re.match(r"APPENDIX (?P<num>[A-Z]+(?: PART \d+)?)", dfars_num)
        if num_match:
            return f'PGI {num_match["num"]}'
        return f"PGI {dfars_num}"

    def _doc(self, doc_type, doc_num, doc_title, href, publication_date, page_url):
        doc_name = (
            f"DFARS {doc_num} - {doc_title}" if doc_type == "DFARS"
            else f"{doc_num} - {doc_title}"
        )
        pub_date = get_pub_date(publication_date)
        display_title = doc_type + " " + doc_num + ": " + doc_title
        raw = {
            "doc_name": doc_name,
            "doc_num": doc_num,
            "publication_date": pub_date,
            "download_url": href.split("/")[-1],
            "display_title": display_title,
        }
        return {
            "doc_name": doc_name,
            "doc_title": doc_title,
            "doc_num": doc_num,
            "doc_type": doc_type,
            "display_doc_type": "Document",
            "publication_date": pub_date,
            "cac_login_required": "false",
            "download_url": href,
            "downloadable_items": [
                {"doc_type": "pdf", "download_url": href, "compression_type": None}
            ],
            "version_hash_raw_data": raw,
            "display_title": display_title,
            "file_ext": "pdf",
        }

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":
            iframe = self.IFRAME_RE.search(body)
            return ([urljoin(url, iframe.group(1))] if iframe else []), []
        if kind != "listing":
            return [], []
        date_m = self.DATE_RE.search(body)
        publication_date = date_m["date"] if date_m else ""
        docs = []
        prev_num = "CHAPTER 2"
        prev_title = "DEFENSE FEDERAL ACQUISITION REGULATION SUPPLEMENT"
        for row_m in re.finditer(r'<tr class="([^"]*)">(.*?)</tr>', body, re.DOTALL):
            row_class, row = row_m.group(1), row_m.group(2)
            cells = _cells(row)
            if not cells:
                continue
            if row_class == "rule":
                part_and_title = _clean_name_dfars(_text(cells[0]))
                split = part_and_title.split(" - ", 1)
                prev_num = split[0]
                prev_title = split[1] if len(split) > 1 else split[0]
                continue
            span_m = re.search(r"<span>(.*?)</span>", cells[0], re.DOTALL)
            if not span_m:
                continue
            doc_subpart = _clean_name_dfars(span_m.group(1))
            doc_title_raw = re.sub(r"<span>.*?</span>", "", cells[0], flags=re.DOTALL)
            if doc_subpart in ("TABLE OF CONTENTS", "COVER PAGE") or (
                doc_subpart.startswith("PART") and prev_num.startswith("APPENDIX")
            ):
                doc_num = f"{prev_num} {doc_subpart}"
            else:
                prev_num = doc_num = doc_subpart
            doc_title = _clean_name_dfars(_text(doc_title_raw))
            if doc_title.startswith("-"):
                doc_title = doc_title[2:]
            if doc_title:
                prev_title = doc_title
            else:
                doc_title = prev_title
            if "NO DFARS TEXT" in doc_title_raw or "NO DFARS TEXT" in prev_title:
                continue
            dfars_href = _href(cells[2]) if len(cells) > 2 else None
            pgi_href = _href(cells[5]) if len(cells) > 5 else None
            if dfars_href:
                docs.append(self._doc(
                    "DFARS", doc_num, doc_title,
                    urljoin(self.start_url, dfars_href), publication_date, url))
            if pgi_href:
                pgi_num = self.derive_pgi_num(doc_num)
                docs.append(self._doc(
                    "PGI", pgi_num, doc_title,
                    urljoin(self.start_url, pgi_href), publication_date, url))
        return [], docs


@register
class FarSubpartExtractor(Extractor):
    """far_subpart_regs — the reference drives subpart expansion with
    Selenium (:40-67); the rendered DOM holds the parts table AND every
    tr.agov-browse-tr subpart row, so one rendered page parses completely
    (RendererFetcher supplies it). Rows (:79-102): doc_num = first two
    space-tokens of the link text; items are html with compression 'zip'
    (:135-139); hash download_url is the RAW href (:140-146); pub date from
    the first meta table (:106-110)."""

    source = "far_subpart_regs"
    start_url = "https://www.acquisition.gov/far"
    PUB_DATE_RE = re.compile(
        r'<table class="usa-table meta">.*?<td>.*?</td>\s*<td>([^<]*)</td>', re.DOTALL
    )
    SUBPART_ROW_RE = re.compile(r'<tr class="agov-browse-tr">(.*?)</tr>', re.DOTALL)

    def _rows(self, row_htmls, pub_date):
        docs = []
        for row in row_htmls:
            cells = _cells(row)
            if len(cells) < 2:
                continue
            a_text_m = re.search(r"<a[^>]*>(.*?)</a>", cells[0], re.DOTALL)
            href_raw = _href(cells[1])
            if not a_text_m or not href_raw:
                continue
            doc_title = ascii_clean(_text(a_text_m.group(1)))
            toks = doc_title.split()
            if len(toks) < 2:
                continue
            doc_num = toks[0] + " " + toks[1]
            web_url = ensure_full_href_url(href_raw, self.start_url)
            doc_name = "FAR " + doc_num
            pd = get_pub_date(pub_date)
            display_title = "FAR " + doc_num + ": " + doc_title
            raw = {
                "download_url": href_raw,  # RAW href (reference quirk :141)
                "doc_name": doc_name,
                "doc_num": doc_num,
                "publication_date": pd,
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": "FAR",
                    "display_doc_type": "Regulation",
                    "publication_date": pd,
                    "cac_login_required": "false",
                    "download_url": web_url.replace(" ", "%20"),
                    "downloadable_items": [
                        {"doc_type": "html",
                         "download_url": web_url.replace(" ", "%20"),
                         "compression_type": "zip"}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "html",
                    "source_page_url": self.start_url,
                }
            )
        return docs

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        pd_m = self.PUB_DATE_RE.search(body)
        pub_date = ascii_clean(pd_m.group(1)) if pd_m else ""
        # parts table rows: everything after the meta table that is not a
        # subpart row
        subparts = self.SUBPART_ROW_RE.findall(body)
        main = self.SUBPART_ROW_RE.sub("", body)
        parts_m = re.search(
            r'<table class="usa-table docs">(.*?)</table>', main, re.DOTALL
        )
        part_rows = [m.group(1) for m in ROW_RE.finditer(parts_m.group(1))] if parts_m else []
        return [], self._rows(part_rows + subparts, pub_date)


@register
class NdaaExtractor(Extractor):
    """NDAA_pubs — resources page dispatching by link shape (:24-64):
    subcommittee/chairman-mark pages, the amendment tracker and press
    release (html docs of the page itself, doc_num ' '), the calendar
    amendments page (titled pdfs), and direct pdfs. Doc-from-URL carving
    (:209-221): basename minus extension with space/%20/%28/%29 → '_';
    titles get the 'NDAA ' prefix when missing; hash display_title is the
    TITLE (:268-274); date formats per page kind (:190-206)."""

    source = "NDAA_pubs"
    display_name = "NDAA"
    base_url = "https://armedservices.house.gov"
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    TITLE_RE = re.compile(r'<[^>]*id="page-title"[^>]*>(.*?)<', re.DOTALL)
    DATE_PATTERN = re.compile(
        r"\b(?:\d{1,2}[-/]\d{1,2}[-/]\d{2,4}|"
        r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* \d{1,2},? \d{2,4})\b",
        re.IGNORECASE,
    )

    def parse_date(self, date_el: str) -> str:
        date = self.DATE_PATTERN.findall(date_el)[0]
        month, day, year = date.strip().split(" ")
        return get_pub_date(f"{day.strip()} {month.strip()} {year.strip()}")

    def _doc_from_url(self, url, source_url, publication_date="", doc_title=""):
        url = ascii_clean(url)
        source_url = ascii_clean(source_url)
        doc_name = (
            url.split("/")[-1].split(".")[-2]
            .replace(" ", "_").replace("%20", "_").replace("%28", "_").replace("%29", "_")
        )
        if doc_title == "":
            doc_title = doc_name
        if self.display_name.lower() not in doc_title.lower():
            doc_title = self.display_name + " " + doc_title
        pdf_url = url if url.lower().startswith("http") else self.base_url + url.strip()
        doc_title = doc_title.replace("_", " ")
        raw = {
            "doc_name": doc_name.strip(),
            "doc_num": "0",
            "publication_date": publication_date,
            "download_url": pdf_url,
            "display_title": doc_title,
        }
        return {
            "doc_name": doc_name.strip(),
            "doc_title": doc_title,
            "doc_num": "0",
            "doc_type": "Policy",
            "display_doc_type": "Policy",
            "publication_date": publication_date,
            "cac_login_required": "false",
            "download_url": pdf_url,
            "downloadable_items": [
                {"doc_type": "pdf", "download_url": pdf_url, "compression_type": None}
            ],
            "version_hash_raw_data": raw,
            "display_title": doc_title,
            "file_ext": "pdf",
            "source_page_url": source_url.strip(),
        }

    def _page_doc(self, page_url, title, date, doc_type):
        doc_name = f"{self.display_name} - {date} - {title}"
        doc_title = title.replace("_", " ")
        raw = {
            "doc_name": doc_name,
            "doc_num": " ",
            "publication_date": date,
            "download_url": page_url,
            "display_title": doc_title,
        }
        return {
            "doc_name": doc_name,
            "doc_title": doc_title,
            "doc_num": " ",
            "doc_type": doc_type,
            "display_doc_type": doc_type,
            "publication_date": date,
            "cac_login_required": "false",
            "download_url": page_url,
            "downloadable_items": [
                {"doc_type": "html", "download_url": page_url, "compression_type": None}
            ],
            "version_hash_raw_data": raw,
            "display_title": doc_title,
            "file_ext": "html",
            "source_page_url": page_url,
        }

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":  # resources page (:24-64)
            links, docs = [], []
            for href, _t in self.A_RE.findall(body):
                low = href.lower()
                if (
                    "fy24-ndaa-subcommittee" in low
                    or "news/press-releases/chairman-rogers-releases-mark-fy24-ndaa" in low
                    or "fy24-ndaa-floor-amendment-tracker" in low
                    or "news/press-releases/rogers-applauds-committee-passage-fy24-ndaa" in low
                ):
                    links.append(urljoin(self.base_url, href))
                elif "calendar/byevent" in low:
                    links.append(href)
                elif low.endswith("pdf"):
                    docs.append(self._doc_from_url(href, url))
            return links, docs
        if kind != "listing":
            return [], []

        low = url.lower()
        title_m = self.TITLE_RE.search(body)
        title = ascii_clean(_text(title_m.group(1))) if title_m else ""
        date_m = re.search(r'<(?:p|span) class="date">(.*?)</(?:p|span)>', body, re.DOTALL)
        date = self.parse_date(_text(date_m.group(1))) if date_m else ""
        if "fy24-ndaa-floor-amendment-tracker" in low:
            return [], [self._page_doc(url, title, date, self.display_name)]
        if "rogers-applauds-committee-passage" in low:
            return [], [self._page_doc(url, title, date, "Policy")]
        docs = []
        find_title = "calendar/byevent" in low
        for href, text in self.A_RE.findall(body):
            if not href.lower().endswith("pdf"):
                continue
            t = ""
            if find_title:
                t = ascii_clean(_text(text)).split("\n")[0].strip()
                if self.display_name.lower() not in t.lower():
                    t = self.display_name + " " + t
            docs.append(self._doc_from_url(href, url, date, t))
        return [], docs


@register
class SascExtractor(Extractor):
    """SASC — hearings list → paged tables → hearing detail pages
    (sasc_spider.py:26-44). Each hearing page yields the page itself as an
    html doc plus transcript/witness pdfs (:74-196): witness docs named
    '{base} - {honorific name} {APQ|Testimony}', doc_type
    'SASC {hearing type} {kind}'. The reference resolves each pdf through a
    redirect page and REWRITES the hash's download_url to the final URL
    (:46-68) — here those docs park as pendings keyed on the redirect page
    (operators/pending.py) whose body supplies the final href. Standard
    5-field hash, display_title '{type}: {title}' (:227)."""

    source = "SASC"
    base_url = "https://www.armed-services.senate.gov"
    LAST_PAGE_RE = re.compile(
        r'<select id="showing-page">.*<option[^>]*>(\d+)</option>\s*</select>', re.DOTALL
    )
    ITEM_RE = re.compile(
        r'<div class="LegislationList__item">.*?<a href="([^"]+)"[^>]*>.*?'
        r'<div class="LegislationList__typeCol col-12 col-xl-3">.*?</span>(.*?)</div>',
        re.DOTALL,
    )
    H1_RE = re.compile(r'<h1 class="Heading__title">(.*?)</h1>', re.DOTALL)
    TIME_RE = re.compile(r'<time datetime="([^"]+)"')
    ASIDE_RE = re.compile(
        r'<li class="Hearing__linkListItem RelatedIssuesLink mb-2">\s*'
        r'<a href="([^"]+)"[^>]*>\s*<span>(.*?)</span>', re.DOTALL
    )
    WITNESS_RE = re.compile(
        r'<li class="col-12 col-md-6 p-2">(.*?)</li>', re.DOTALL
    )
    WIT_NAME_RE = re.compile(
        r'<h3 class="Heading__title">\s*(?:<span>(.*?)</span>)?\s*(?:<span>(.*?)</span>)?(.*?)</h3>',
        re.DOTALL,
    )
    WITDOC_RE = re.compile(
        r'<div class="mt-3">\s*<a href="([^"]+)"[^>]*>\s*<span>(.*?)</span>', re.DOTALL
    )
    REDIRECT_RE = re.compile(r"<p>\s*<a href=\"([^\"]+)\"", re.DOTALL)

    def _fields(self, doc_name, doc_title, doc_type, display_doc_type,
                download_url, page_url, date, pending_url=None):
        pub_date = get_pub_date(date)
        display_title = doc_type + ": " + doc_title
        raw = {
            "doc_name": doc_name,
            "doc_num": " ",
            "publication_date": pub_date,
            "display_title": display_title,
        }
        doc = {
            "doc_name": doc_name,
            "doc_title": doc_title,
            "doc_num": " ",
            "doc_type": doc_type,
            "display_doc_type": display_doc_type,
            "publication_date": pub_date,
            "cac_login_required": "false",
            "version_hash_raw_data": raw,
            "display_title": display_title,
            "source_page_url": page_url,
        }
        if pending_url:  # resolved by the redirect page via the pending join
            doc["detail_url"] = pending_url
            doc["pending_hash_key"] = "download_url"
        else:
            raw["download_url"] = download_url
            doc["download_url"] = download_url
            doc["downloadable_items"] = [
                {"doc_type": "html" if download_url == page_url else "pdf",
                 "download_url": download_url, "compression_type": None}
            ]
            doc["file_ext"] = doc["downloadable_items"][0]["doc_type"]
        return doc

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "landing":  # hearings root: one link per page (:28-33)
            m = self.LAST_PAGE_RE.search(body)
            last = int(m.group(1)) if m else 1
            return [f"{url}?pagenum_rs={n}" for n in range(1, last + 1)], []
        if kind == "listing":  # hearings table page (:35-44)
            return [m[0] for m in self.ITEM_RE.findall(body)], []
        if kind != "detail":
            return [], []

        # redirect page: complete pending pdf docs (:46-52)
        red = self.REDIRECT_RE.search(body)
        if red and "Hearing__detail" not in body:
            return [], [{"detail_download_href": red.group(1)}]

        h1 = self.H1_RE.search(body)
        time_m = self.TIME_RE.search(body)
        if not h1:
            return [], []
        title = " ".join(ascii_clean(_text(h1.group(1)).strip()).split())
        date = time_m.group(1) if time_m else ""
        spaced_title = f" - {title}" if title else ""
        base_doc_name = f"SASC Hearing{spaced_title}"
        type_m = re.search(r'<div class="Hearing__type">(.*?)</div>', body, re.DOTALL)
        hearing_type = _text(type_m.group(1)).strip() if type_m else "Hearing"

        docs, links = [], []
        docs.append(self._fields(
            base_doc_name, title, hearing_type, "Hearing", url, url, date))
        for href, text in self.ASIDE_RE.findall(body):
            aside_text = _text(text).strip()
            docs.append(self._fields(
                f"{base_doc_name} - {aside_text}", title, hearing_type,
                "Transcript", None, url, date, pending_url=href))
            links.append(href)
        for block in self.WITNESS_RE.findall(body):
            name_m = self.WIT_NAME_RE.search(block)
            if name_m:
                honorific, wit_name, member = name_m.group(1), name_m.group(2), name_m.group(3)
                if honorific and wit_name:
                    full_name_raw = f"{honorific} {wit_name}"
                elif honorific:
                    full_name_raw = honorific
                elif wit_name:
                    full_name_raw = wit_name
                else:
                    full_name_raw = _text(member)
            else:
                full_name_raw = ""
            full_name = " ".join(_text(full_name_raw).split()).strip()
            for whref, wtext in self.WITDOC_RE.findall(block):
                witness_text = _text(wtext).strip()
                wit_doc_type = (
                    "Advance Policy Questions" if "APQ" in witness_text else "Testimony"
                )
                docs.append(self._fields(
                    f"{base_doc_name} - {full_name} {wit_doc_type}",
                    f"{base_doc_name} - {full_name} {wit_doc_type}",
                    f"SASC {hearing_type} {wit_doc_type}",
                    wit_doc_type, None, url, date, pending_url=whref))
                links.append(whref)
        return links, docs


@register
class UfcExtractor(Extractor):
    """UFC — paged index tables (?page=N recursion until the table is gone,
    ufc_spider.py:46-87) whose rows link to per-doc pages; special tables
    fc-2-000-05n (:217-290, docs inline) and ufgs-changes-revisions
    (:184-215, third cell links). Doc pages (:89-180): h1 carving by acronym
    (FC/UFC → [1]/[2:]; numeric UFGS → 3-or-4-token number), Date /
    Change-Revision-Date divs, Inactive status dropped, pdf link required;
    doc_type UFGS when the URL says so; display name = the full h1."""

    source = "UFC"
    base_url = "https://wbdg.org"
    A_RE = re.compile(r'<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    H1_RE = re.compile(r"<h1>(.*?)</h1>", re.DOTALL)
    DIV_PAIR_RE = re.compile(r"<div>([^<]*)</div>\s*<div>([^<]*)</div>", re.DOTALL)

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "listing":
            if "fc-2-000-05n" in url:
                return self._fc2(url, body)
            links = []
            rows = list(ROW_RE.finditer(body))
            for row_m in rows:
                cells = _cells(row_m.group(1))
                if not cells:
                    continue
                cell = cells[2] if ("ufgs-changes-revisions" in url and len(cells) > 2) else cells[0]
                doc_url = _href(cell)
                if doc_url:
                    links.append(urljoin(self.base_url, doc_url))
            if rows:  # ?page=N recursion (:81-87)
                page_m = re.search(r"\?page=(\d+)", url)
                page_id = int(page_m.group(1)) if page_m else 0
                links.append(urljoin(url.split("?")[0], f"?page={page_id + 1}"))
            return links, []
        if kind != "detail":
            return [], []

        h1 = self.H1_RE.search(body)
        if not h1:
            return [], []
        full_title = _text(h1.group(1)).strip()
        split_title = full_title.split(" ")
        acronym = split_title[0].strip()
        if acronym in ["FC", "UFC"]:
            doc_num = split_title[1]
            doc_title = " ".join(split_title[2:])
        elif acronym == "UFGS" and len(split_title) > 1 and split_title[1].isdigit():
            title_start_idx = 4
            if len(split_title) > title_start_idx and split_title[title_start_idx].isdigit():
                title_start_idx = 5
            doc_num = " ".join(split_title[1:title_start_idx])
            doc_title = " ".join(split_title[title_start_idx:])
        else:
            doc_num = " "
            doc_title = full_title

        fields = dict(self.DIV_PAIR_RE.findall(body))
        publication_date = (fields.get("Date: ") or "").strip() or None
        if fields.get("Change / Revision Date: "):
            publication_date = fields["Change / Revision Date: "].strip()
        if (fields.get("Status: ") or "").strip() == "Inactive":
            return [], []
        dl_m = re.search(
            r"<div>View/Download: </div>\s*<div>(.*?)</div>", body, re.DOTALL
        )
        if not dl_m:
            return [], []
        download_url = ""
        for href, _t in self.A_RE.findall(dl_m.group(1)):
            if href.endswith(".pdf"):
                download_url = href
        if download_url == "":
            return [], []
        doc_type = "UFGS" if "unified-facilities-guide-specifications-ufgs" in url else "UFC"
        pub_date = get_pub_date(publication_date) if publication_date else None
        raw = {
            "doc_name": full_title,
            "doc_num": doc_num,
            "publication_date": pub_date,
            "download_url": download_url,
            "display_title": full_title,  # set_display_name(full_title)
        }
        return [], [
            {
                "doc_name": full_title,
                "doc_title": ascii_clean(doc_title),
                "doc_num": doc_num,
                "doc_type": doc_type,
                "display_doc_type": "Document",
                "publication_date": pub_date,
                "cac_login_required": "false",
                "download_url": download_url,
                "downloadable_items": [
                    {"doc_type": "pdf", "download_url": download_url,
                     "compression_type": None}
                ],
                "version_hash_raw_data": raw,
                "display_title": full_title,
                "file_ext": "pdf",
            }
        ]

    def _fc2(self, url: str, body: str) -> tuple[list[str], list[dict]]:
        docs = []
        for row_m in ROW_RE.finditer(body):
            cells = _cells(row_m.group(1))
            if len(cells) < 3:
                continue
            href = _href(cells[2])
            if not href:
                continue
            doc_name = ascii_clean(_text(cells[0]).strip())
            publication_date = _text(cells[1]).strip()
            download_url = urljoin(self.base_url, href)
            doc_title = doc_name
            if "FC 2-000-05N" not in doc_title:
                doc_title = "FC 2-000-05N: " + doc_title
            pub_date = get_pub_date(publication_date)
            raw = {
                "doc_name": doc_name,
                "doc_num": "2-000-05N",
                "publication_date": pub_date,
                "download_url": download_url,
                "display_title": doc_title,  # set_display_name(doc_title)
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": "2-000-05N",
                    "doc_type": "UFC",
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": download_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": doc_title,
                    "file_ext": "pdf",
                }
            )
        return [], docs


@register
class DodCoronavirusExtractor(Extractor):
    """DOD_Coronavirus_Guidance — spotlight grid of category blocks
    (dod_coronavirus_spider.py:43-146). Items whose href has a file
    extension become docs directly, hash keyed by item_currency (:131-141);
    items pointing at other pages park as pendings completed by the follow
    page's first downloadable href — or the page itself as html (:160-196)
    — with pending_hash_key='item_currency'. 'noted' items get the date
    appended to the title and their supplemental links recorded in the hash
    (:70-79); doc_num literal 'None' (:123); file_ext is the doc_type
    string quirk (:117)."""

    source = "DOD_Coronavirus_Guidance"
    start_url = "https://www.defense.gov/Explore/Spotlight/Coronavirus/Latest-DOD-Guidance/"
    doc_type = "DoD Coronavirus Guidance"
    BLOCK_SPLIT = '<div class="block">'
    ITEM_SPLIT = '<div class="item">'
    CAT_RE = re.compile(r'<h2 class="cat">(.*?)</h2>', re.DOTALL)
    TITLE_A_RE = re.compile(r'<a class="title" href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL)
    DATE_RE = re.compile(r'<p class="date">(.*?)</p>', re.DOTALL)
    NOTED_RE = re.compile(r'<[^>]*class="noted"[^>]*>(.*?)</div>', re.DOTALL)
    COVID_RE = re.compile(r"covid|covid\-19|coronavirus", re.IGNORECASE)

    @staticmethod
    def _ext(href: str) -> tuple[str, bool]:
        """Twin of get_href_file_extension_does_exist (GCSpider.py:119-131)."""
        from gc_spark.functions.urls import UNKNOWN_FILE_EXTENSION_PLACEHOLDER

        ext = get_href_file_extension(href)
        return ext, ext != UNKNOWN_FILE_EXTENSION_PLACEHOLDER

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "listing":
            return self._grid(url, body)
        if kind == "detail":  # follow page (:160-196)
            body_div = re.search(r'<div class="body">(.*?)</div>', body, re.DOTALL)
            if body_div:
                hrefs = re.findall(r'href="([^"]+)"', body_div.group(1))
            else:
                hrefs = [
                    href for href, text in re.findall(
                        r'<a href="([^"]+)"[^>]*>(.*?)</a>', body, re.DOTALL)
                    if self.COVID_RE.search(re.sub(r"<[^>]+>", " ", text))
                ]
            hrefs = [h for h in dict.fromkeys(hrefs) if not h.startswith("mailto:")]
            for href in hrefs:
                _ft, has_ext = self._ext(href)
                if has_ext:
                    dl = ensure_full_href_url(href, self.start_url).replace(" ", "%20")
                    return [], [{"detail_download_href": dl}]
            # no downloadable items: the page itself is the artifact
            return [], [{"detail_download_href": url.replace(" ", "%20")}]
        return [], []

    def _grid(self, url: str, body: str) -> tuple[list[str], list[dict]]:
        docs, links = [], []
        for block in body.split(self.BLOCK_SPLIT)[1:]:
            cat_m = self.CAT_RE.search(block)
            category_text = ascii_clean(_text(cat_m.group(1))) if cat_m else ""
            for item in block.split(self.ITEM_SPLIT)[1:]:
                a_m = self.TITLE_A_RE.search(item)
                if not a_m:
                    continue
                href_raw = a_m.group(1)
                doc_title = ascii_clean(_text(a_m.group(2)).strip())
                download_url = ensure_full_href_url(href_raw, self.start_url)
                file_type, has_ext = self._ext(href_raw)
                date_m = self.DATE_RE.search(item)
                publication_date = _text(date_m.group(1)).strip() if date_m else None
                noted_m = self.NOTED_RE.search(item)
                noted = _text(noted_m.group(1)) if noted_m else ""
                doc_title_without_date = f"{doc_title}"
                if noted:
                    doc_title = f"{doc_title} - {publication_date}"
                doc_name = f"{category_text}: {doc_title}"
                display_title = self.doc_type + " - " + doc_title_without_date
                raw = {
                    "publication_date": publication_date,
                    "noted": noted,
                    "doc_name": doc_name,
                    "display_title": display_title,
                    "download_url": download_url,
                    "display_doc_type": (
                        "Guidance" if "guidance" in self.doc_type.lower() else "Document"
                    ),
                }
                doc = {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": "None",
                    "doc_type": self.doc_type,
                    "display_doc_type": raw["display_doc_type"],
                    "publication_date": publication_date,
                    "cac_login_required": "false",
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": self.doc_type,
                    "source_page_url": download_url,
                }
                if has_ext:
                    enc = download_url.replace(" ", "%20")
                    raw["item_currency"] = enc
                    doc["download_url"] = download_url
                    doc["downloadable_items"] = [
                        {"doc_type": file_type, "download_url": enc,
                         "compression_type": None}
                    ]
                    docs.append(doc)
                else:  # follow page completes via the pending join
                    doc["detail_url"] = download_url
                    doc["pending_hash_key"] = "item_currency"
                    doc["source_page_url"] = download_url
                    docs.append(doc)
                    links.append(download_url)
        return links, docs
