"""Wave-2 extractor families beyond plain tables: list pages, a JSON API,
a message board, a two-hop hearings site, and a single-document page.

Reference spiders:
  - FASAB Crawler    spiders/fasab_spider.py
  - SORN             spiders/sorn_spider.py
  - omb_pubs         spiders/omb_pubs_spider.py
  - maradmin_pubs    spiders/maradmin_spider.py (Selenium-paged board; the
                     page shape is what matters — see sources/fetch.py
                     RendererFetcher for the headed-fetch interface)
  - HASC             spiders/hasc_spider.py
  - defense_travel   spiders/defense_spider.py
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from urllib.parse import urljoin

from gc_spark.extractors.base import Extractor, register
from gc_spark.extractors.pubs_tables import iso_or_none, std_hash_fields
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.text import ascii_clean

LI_RE = re.compile(r"<li>(.*?)</li>", re.DOTALL)
A_RE = re.compile(r"<a\s+[^>]*>.*?</a>", re.DOTALL)
TAG_RE = re.compile(r"<[^>]+>")


def _a_attr(a_html: str, attr: str) -> str | None:
    m = re.search(rf'{attr}="([^"]+)"', a_html)
    return m.group(1) if m else None


def _a_text(a_html: str) -> str:
    import html

    return html.unescape(TAG_RE.sub("", a_html)).strip()


@register
class FasabExtractor(Extractor):
    """fasab_spider.py:23-55 — <li> items holding a doc link plus a nested
    title <li>. Derivations: 'FASAB ' prefix unless the name contains
    SFFAS/SFFAC (:39-40); doc_num = last space-token (:41); doc_type =
    leading non-digits minus their last word, space-squashed (:42-44);
    protocol-relative URLs get 'https:' (:46-47); every field scrubbed with
    [^a-zA-Z0-9 ()\\-] (:49-51); hash dict led by display_org with only the
    URL basename (:87-94); publication_date is always '' (:52)."""

    source = "FASAB Crawler"
    SCRUB = re.compile(r"[^a-zA-Z0-9 ()\\-]")
    ITEM_RE = re.compile(
        r"<li><a href=\"(?P<href>[^\"]+)\">(?P<name>[^<]*)</a>"
        r"<ul><li>(?P<title>[^<]*)</li></ul></li>",
        re.DOTALL,
    )

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        import html

        for m in self.ITEM_RE.finditer(body):
            doc_name = html.unescape(m.group("name"))
            dl_url = m.group("href")
            doc_title = html.unescape(m.group("title"))
            if not (doc_name and dl_url and doc_title):
                continue
            if "SFFAS" not in str(doc_name) and "SFFAC" not in str(doc_name):
                doc_name = "FASAB " + str(doc_name)
            doc_num = doc_name.rsplit(" ", 1)[-1]
            doc_type_raw = re.match(r"^(\D*)", doc_name).group()
            doc_type = doc_type_raw.rsplit(" ", 1)[0]
            doc_type = " ".join(doc_type.split())
            if not dl_url.startswith("http"):
                dl_url = "https:" + dl_url
            doc_name = self.SCRUB.sub("", doc_name)
            doc_type = self.SCRUB.sub("", doc_type)
            doc_num = self.SCRUB.sub("", doc_num)
            doc_title = self.SCRUB.sub("", doc_title)
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = {
                "display_org": "FASAB",
                "doc_name": doc_name,
                "doc_num": doc_num,
                "publication_date": "",
                "download_url": dl_url.split("/")[-1],
                "display_title": display_title,
            }
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": "Document",
                    "publication_date": "",
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
class SornExtractor(Extractor):
    """sorn_spider.py — two-stage Federal Register API client. Stage 1
    (:24-36): the agencies endpoint's child_slugs become
    &conditions[agencies][]= params on a fixed documents.json query URL,
    reproduced byte-for-byte. Stage 2 (:38-63): each result row is a doc —
    doc_name 'SORN {document_number}', display 'Notice', the row's html_url
    as the per-doc source_page_url, standard hash — plus the next_page_url
    pagination link."""

    source = "SORN"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "api":
            return [], []
        data = json.loads(body)
        if "child_slugs" in data:  # stage 1: build the query URL (:24-36)
            conditions = ""
            for item in data["child_slugs"]:
                conditions = conditions + "&conditions[agencies][]=" + item
            notices = "&conditions[type][]=NOTICE"
            page_size = "1000"
            base_url = (
                "https://www.federalregister.gov/api/v1/documents.json?per_page="
                + page_size
                + "&order=newest&conditions[term]=%22Privacy%20Act%20of%201974"
                "%22%20%7C%20%22System%20of%20Records%22"
            )
            return [base_url + conditions + notices], []

        docs = []
        for sorn in data.get("results", []):
            doc_num = sorn["document_number"]
            doc_name = "SORN " + doc_num
            doc_title = sorn["title"]
            pub_date = get_pub_date(sorn["publication_date"])
            download_url = sorn["pdf_url"]
            display_title = "SORN " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, download_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": "SORN",
                    "display_doc_type": "Notice",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": download_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": download_url,
                         "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "pdf",
                    "source_page_url": sorn["html_url"],
                }
            )
        links = []
        if data.get("next_page_url"):
            links.append(data["next_page_url"])
        return links, docs


@register
class OmbPubsExtractor(Extractor):
    """omb_pubs_spider.py:19-95 — memoranda <li> list. Derivations: skip
    items containing 'supersede' (:41); per-anchor token carving — the
    shorter of the first comma-token and first space-token wins as doc_num,
    title is the remainder (:52-59); pdf URL from href or data-copy-href
    (:44-50); the '(Month D, YYYY)' date regex over the item text (:60-63);
    docs kept only when a pdf was found AND doc_num has exactly two dashes
    (:64); per-page doc_num dedup (:73, 84); file_ext is the literal
    doc_type 'OMBM' (:147 quirk)."""

    source = "omb_pubs"
    base_url = "https://www.whitehouse.gov"
    DATE_RE = re.compile(r"\(.* \d+, \d{4}\)")

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        docs = []
        parsed_nums: list[str] = []
        for li_m in LI_RE.finditer(body):
            li = li_m.group(1)
            li_text = TAG_RE.sub("", li)
            if "supersede" in li_text.lower():
                continue
            doc_num = doc_title = doc_name = ""
            publication_date = ""
            pdf_url = ""
            for a in A_RE.findall(li):
                href = _a_attr(a, "href") or _a_attr(a, "data-copy-href")
                if href and href.lower().endswith(".pdf"):
                    pdf_url = href if href.startswith("http") else self.base_url + href.strip()
                a_text = _a_text(a)
                comma_tokens = a_text.split(",", 1)
                space_tokens = a_text.split(" ", 1)
                if len(comma_tokens) > 1 and len(comma_tokens[0]) < len(space_tokens[0]):
                    doc_num = comma_tokens[0]
                    doc_title = re.sub(r"^.*?,", "", a_text)
                    doc_name = "OMBM " + doc_num
                elif len(space_tokens) > 1 and len(space_tokens[0]) < len(comma_tokens[0]):
                    doc_num = space_tokens[0].rstrip(",.*")
                    doc_title = space_tokens[1]
                    doc_name = "OMBM " + doc_num
                possible_date = self.DATE_RE.search(li_text)
                if possible_date:
                    publication_date = get_pub_date(possible_date[0][1:-1])
            if pdf_url == "" or doc_num.count("-") != 2:
                continue
            parsed_title = ascii_clean(re.sub(r"\"", "", doc_title))
            parsed_num = doc_num.strip()
            if parsed_num in parsed_nums:
                continue
            parsed_nums.append(parsed_num)
            doc_name = doc_name.strip()
            display_title = "OMBM" + " " + parsed_num + ": " + parsed_title
            raw = std_hash_fields(doc_name, parsed_num, publication_date, pdf_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": parsed_title,
                    "doc_num": parsed_num,
                    "doc_type": "OMBM",
                    "display_doc_type": "OMBM",
                    "publication_date": publication_date,
                    "cac_login_required": "false",
                    "download_url": pdf_url,
                    "downloadable_items": [
                        {"doc_type": "pdf", "download_url": pdf_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": "OMBM",
                }
            )
        return [], docs


@register
class MaradminExtractor(Extractor):
    """maradmin_spider.py:26-82 — Selenium-paged message board (the page
    shape is the contract; RendererFetcher supplies headed fetches).
    Derivations: first row skipped as the header (:39 doc_rows[1:]);
    doc_name 'MARADMIN {num/→-} {title}' ascii-cleaned then clamped to 8
    space-tokens with '/'→'-' (:47, :53); is_revoked when status != 'Active'
    (:50); the single downloadable item is the message page itself with
    doc_type 'html' (:113-117); file_ext is the literal doc_type 'MARADMIN'
    (:148 quirk); next-page link from the da_next_pager control (:71-77)."""

    source = "maradmin_pubs"
    ROW_RE = re.compile(r'<div class="maradmin-row">(.*?)</div></div>', re.DOTALL)
    FIELD_RE = {
        "num": re.compile(r'<div class="msg-num msg-col">\s*<a[^>]*>(.*?)</a>', re.DOTALL),
        "title": re.compile(
            r'<div class="msg-title msg-col">\s*<a href="([^"]+)"[^>]*>(.*?)</a>', re.DOTALL
        ),
        "date": re.compile(r'<div class="msg-pub-date msg-col">(.*?)</div>', re.DOTALL),
        # ROW_RE's terminator consumes the status div's close tag, so match
        # up to the next tag open instead of a literal </div>
        "status": re.compile(r'<div class="msg-status msg-col">([^<]*)', re.DOTALL),
    }
    NEXT_RE = re.compile(r'<a class="da_next_pager" href="([^"]+)"')

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        links = [urljoin(url, m) for m in self.NEXT_RE.findall(body)]
        docs = []
        rows = self.ROW_RE.findall(body)
        for row in rows[1:]:  # :39 header row skipped
            num_m = self.FIELD_RE["num"].search(row)
            title_m = self.FIELD_RE["title"].search(row)
            date_m = self.FIELD_RE["date"].search(row)
            status_m = self.FIELD_RE["status"].search(row)
            if not (num_m and title_m and date_m and status_m):
                continue
            doc_type = "MARADMIN"
            doc_num_raw = num_m.group(1).strip()
            web_url, doc_title_raw = title_m.group(1), title_m.group(2).strip()
            publication_date = TAG_RE.sub("", date_m.group(1)).strip()
            doc_status = TAG_RE.sub("", status_m.group(1)).strip()
            doc_name_full = doc_type + " " + doc_num_raw.replace("/", "-") + " " + doc_title_raw
            is_revoked = doc_status != "Active"
            doc_name = " ".join(ascii_clean(doc_name_full).split(" ")[:8]).replace("/", "-")
            doc_num = ascii_clean(doc_num_raw)
            doc_title = ascii_clean(doc_title_raw)
            pub_date = get_pub_date(publication_date)
            display_title = doc_type + " " + doc_num + ": " + doc_title
            raw = std_hash_fields(doc_name, doc_num, pub_date, web_url, display_title)
            docs.append(
                {
                    "doc_name": doc_name,
                    "doc_title": doc_title,
                    "doc_num": doc_num,
                    "doc_type": doc_type,
                    "display_doc_type": "Document",
                    "publication_date": pub_date,
                    "cac_login_required": "false",
                    "download_url": web_url,
                    "downloadable_items": [
                        {"doc_type": "html", "download_url": web_url, "compression_type": None}
                    ],
                    "version_hash_raw_data": raw,
                    "display_title": display_title,
                    "file_ext": doc_type,
                    "is_revoked": "true" if is_revoked else "false",
                }
            )
        return links, docs


@register
class HascExtractor(Extractor):
    """hasc_spider.py — two-hop hearings site, but unlike the meta-carry
    spiders every doc field lives ON the hearing page, so the detail page
    parses standalone (no pending join needed). Listing pages (:54-72):
    .evo-views-row links followed, plus the reference's literal next-page
    arithmetic int(url[-1])+1 whenever rows were found. Hearing pages
    (:74-137): title from h1, '%a, %m/%d/%Y - %I:%M %p' timestamp, speaker
    names from <b>, and one doc per pdf link whose text contains 'statement'
    and a speaker's name. doc_name carved from the URL basename (:43-51);
    hash = standard minus doc_num plus doc_title (:126-128); display
    'HASC {title} - {speaker}'."""

    source = "HASC"
    base_url = "https://armedservices.house.gov"
    ROW_RE = re.compile(r'<div class="evo-views-row">(.*?)</div>', re.DOTALL)
    H1_RE = re.compile(r'<h1 class="display-4"[^>]*>(.*?)</h1>', re.DOTALL)
    TIME_RE = re.compile(r"<time[^>]*>(.*?)</time>", re.DOTALL)
    B_RE = re.compile(r"<b>(.*?)</b>", re.DOTALL)
    P_A_RE = re.compile(r'<p>\s*<a href="([^"]+)"[^>]*>(.*?)</a>\s*</p>', re.DOTALL)

    @staticmethod
    def extract_doc_name_from_url(url: str) -> str:
        doc_name = url.split("/")[-1]
        return (
            doc_name.replace(".pdf", "").replace("%", "_").replace(".", "").replace("-", "")
        )

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind == "listing":
            links = []
            rows = self.ROW_RE.findall(body)
            for row in rows:
                href = _a_attr(row, "href")
                if href:
                    links.append(f"{self.base_url}{href}")
            if len(rows) > 0:  # :71-73 literal next-page arithmetic
                current_page_id = int(url[-1])
                links.append(f"{url[0:-1]}{current_page_id + 1}")
            return links, []
        if kind != "detail":
            return [], []

        h1 = self.H1_RE.search(body)
        time_m = self.TIME_RE.search(body)
        if not h1 or not time_m:
            return [], []
        doc_title = ascii_clean(TAG_RE.sub("", h1.group(1)).strip())
        publication_date = iso_or_none(
            datetime.strptime(time_m.group(1).strip(), "%a, %m/%d/%Y - %I:%M %p")
        )
        doc_type = "Witness Statement"
        speaker_names = [TAG_RE.sub("", s).strip() for s in self.B_RE.findall(body)]
        docs = []
        for href, link_html in self.P_A_RE.findall(body):
            if not href.endswith(".pdf"):
                continue
            link_text = TAG_RE.sub("", link_html).lower()
            if "statement" not in link_text:
                continue
            for speaker_name in speaker_names:
                if speaker_name.lower() not in link_text:
                    continue
                follow_link = urljoin(self.base_url, href)
                display_title = ascii_clean(f"HASC {doc_title} - {speaker_name}")
                doc_name = self.extract_doc_name_from_url(follow_link)
                # DocItemFields order after remove(doc_num) + set(doc_title)
                raw = {
                    "doc_name": doc_name,
                    "publication_date": publication_date,
                    "download_url": follow_link,
                    "display_title": display_title,
                    "doc_title": doc_title,
                }
                docs.append(
                    {
                        "doc_name": doc_name,
                        "doc_title": doc_title,
                        "doc_num": " ",
                        "doc_type": doc_type,
                        "display_doc_type": doc_type,
                        "publication_date": publication_date,
                        "cac_login_required": "false",
                        "download_url": follow_link,
                        "downloadable_items": [
                            {"doc_type": "pdf", "download_url": follow_link,
                             "compression_type": None}
                        ],
                        "version_hash_raw_data": raw,
                        "display_title": display_title,
                        "file_ext": "pdf",
                    }
                )
        return [], docs


@register
class DefenseTravelExtractor(Extractor):
    """defense_spider.py — intentionally scrapes ONE document (the JTR pdf,
    :10-16). The pdf link hides in a button onclick (:34-38, first quoted
    string); doc_name/doc_num carved from the URL basename (:64-70);
    publication_date hard-coded '2024-01-01' (:49, :80); hash
    {doc_name, doc_num, publication_date, download_url, display_title:
    the TITLE, not the display string} (:77-83); DocItem display_title is
    'doc_num: doc_title' (:113)."""

    source = "defense_travel"
    BUTTON_RE = re.compile(
        r'<button[^>]*onclick="[^"]*JTR\.PDF[^"]*"[^>]*>', re.IGNORECASE
    )

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "listing":
            return [], []
        button = self.BUTTON_RE.search(body)
        if not button:
            return [], []
        pdf_link = re.search(r"'(.*?)'", button.group(0)).group(1)
        absolute_pdf_link = urljoin(url, pdf_link)
        doc_name = absolute_pdf_link.split("/")[-1].split(".")[0]
        doc_num = doc_name.split("/")[-1].split(".")[0]
        doc_title = "Joint Travel Regulations"
        raw = {
            "doc_name": doc_name,
            "doc_num": doc_num,
            "publication_date": "2024-01-01",
            "download_url": absolute_pdf_link,
            "display_title": doc_title,
        }
        doc = {
            "doc_name": doc_name,
            "doc_title": doc_title,
            "doc_num": doc_num,
            "doc_type": "PDF",
            "display_doc_type": "Document",
            "publication_date": "2024-01-01",
            "cac_login_required": "false",
            "download_url": absolute_pdf_link,
            "downloadable_items": [
                {"doc_type": "pdf", "download_url": absolute_pdf_link,
                 "compression_type": None}
            ],
            "version_hash_raw_data": raw,
            "display_title": doc_num + ": " + doc_title,
            "file_ext": "pdf",
        }
        return [], [doc]
