"""Wave-7a extractor families: govinfo.gov JSON-API walkers.

Reference spiders:
  - code_of_federal_regulations  spiders/cfr_spider.py
  - legislation_pubs             spiders/legislation_spider.py

Both walk the same wssearch browse API: a root node, browse paths with
childNodes, package ids, then a getContentDetail JSON per document. The
walk is expressed as link emission (each JSON response yields the next
URLs), so politeness/dedup/resume apply to every API hit."""

from __future__ import annotations

import json
import re

from gc_spark.extractors.base import Extractor, register
from gc_spark.functions.dates import get_pub_date
from gc_spark.functions.text import ascii_clean

BILL_VERSION_RE = re.compile(r"\((.*)\)")


def _nested_values(data: dict, key: str = "value") -> list:
    return [cnode.get("nodeValue").get(key) for cnode in data.get("childNodes", [])]


@register
class CfrExtractor(Extractor):
    """cfr_spider.py — years [2000, 2021, 2022] (:14) browsed at pageSize
    100 (:58-60), each package's detail JSON becoming one doc (:95-135):
    title = detail title minus its first 3 words; doc_num = 2nd word of
    'Publication Title'; doc_name = 'Publication Title [year]' (year
    appended only when absent); date = 'Date' falling back to 'Date Issued';
    web_url = 'https:' + pdflink; 6-field hash with doc_title (:160-167);
    source_page_url = the human details page (:51-52)."""

    source = "code_of_federal_regulations"
    YEARS = ["2000", "2021", "2022"]

    @staticmethod
    def get_browse_path_url(browse_path) -> str:
        return (
            f"https://www.govinfo.gov/wssearch/rb//cfr/{browse_path}"
            "?fetchChildrenOnly=1&offset=0&pageSize=100"
        )

    @staticmethod
    def get_api_detail_url(package_id: str) -> str:
        return f"https://www.govinfo.gov/wssearch/getContentDetail?packageId={package_id}"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "api":
            return [], []
        if url.endswith("/cfr?fetchChildrenOnly=0"):  # root (:68-76)
            return [self.get_browse_path_url(y) for y in self.YEARS], []
        data = json.loads(body)
        if "/wssearch/rb/" in url.replace("//cfr", "/cfr"):  # browse page (:78-90)
            packages = _nested_values(data, key="packageid")
            return [self.get_api_detail_url(p) for p in packages], []
        if "getContentDetail" not in url:
            return [], []

        # detail JSON → one doc (:92-135)
        year_m = re.search(r"CFR-(\d{4})", data["documentincontext"]["packageId"])
        year = year_m.group(1) if year_m else ""
        package_id = data["documentincontext"]["packageId"]
        web_url = f"https:{data['download']['pdflink']}"
        detail_data = {"Publication Title": "", "Date": "", "Date Issued": "",
                       "Collection": "", "Category": ""}
        for d in data["metadata"]["columnnamevalueset"]:
            if d["colname"] in detail_data:
                detail_data[d["colname"]] = d["colvalue"]
        raw_title = " ".join(data["title"].split()[3:])
        doc_title = ascii_clean(raw_title)
        doc_num = detail_data["Publication Title"].split()[1]
        doc_type = "CFR Title"
        doc_name = (
            f"{detail_data['Publication Title']} {year}"
            if year not in detail_data["Publication Title"]
            else f"{detail_data['Publication Title']}"
        )
        publication_date = detail_data.get("Date") or detail_data.get("Date Issued")
        doc_name = ascii_clean(doc_name.strip())
        doc_title = doc_title.strip()
        doc_num = doc_num.strip()
        pub_date = get_pub_date(publication_date)
        display_title = doc_type + " " + doc_num + ": " + doc_title
        raw = {
            "doc_num": doc_num,
            "doc_name": doc_name,
            "doc_title": doc_title,
            "publication_date": pub_date,
            "download_url": web_url,
            "display_title": display_title,
        }
        return [], [
            {
                "doc_name": doc_name,
                "doc_title": doc_title,
                "doc_num": doc_num,
                "doc_type": doc_type,
                "display_doc_type": "CFR Title",
                "publication_date": pub_date,
                "cac_login_required": "false",
                "download_url": web_url.replace(" ", "%20"),
                "downloadable_items": [
                    {"doc_type": "pdf", "download_url": web_url, "compression_type": None}
                ],
                "version_hash_raw_data": raw,
                "display_title": display_title,
                "file_ext": "pdf",
                "source_page_url": f"https://www.govinfo.gov/app/details/{package_id}",
            }
        ]


@register
class LegislationExtractor(Extractor):
    """legislation_spider.py — plaw + bills roots. Bills restricted to
    congresses 117/118 (:175-176); browse levels: congress → bill types →
    num chunks → package ids with offset pagination (:194-245); details kept
    only for 'Law Number' (public law) or Enrolled Bill versions (:247-260).
    Public law (:78-113): title minus first 6 words, num = law number words
    [2:] joined, name = the Law Number. Enrolled bill (:115-168): num from
    'Bill Number' rpartition, version from the '(...)' in 'Bill Version',
    name '{type} {num} {version} {congress}', the literal H.R. 7776 title
    pin (:152-153). 6-field hash with doc_title (legislation_spider.py:
    280-287)."""

    source = "legislation_pubs"

    @staticmethod
    def get_browse_path_url(legtype: str, browse_path) -> str:
        return (
            f"https://www.govinfo.gov/wssearch/rb//{legtype}/{browse_path}"
            "?fetchChildrenOnly=1&offset=0&pageSize=100"
        )

    @staticmethod
    def get_api_detail_url(package_id: str) -> str:
        return f"https://www.govinfo.gov/wssearch/getContentDetail?packageId={package_id}"

    def _legtype(self, url: str) -> str:
        return "bills" if "bills" in url else "plaw"

    def extract(self, url: str, body: str, kind: str) -> tuple[list[str], list[dict]]:
        if kind != "api":
            return [], []
        data = json.loads(body)
        legtype = self._legtype(url)

        if url.endswith("?fetchChildrenOnly=0"):  # root → congress numbers
            links = []
            for cong in data.get("childNodes", []):
                congress_num = cong.get("nodeValue").get("value")
                if congress_num != "117" and congress_num != "118" and legtype == "bills":
                    continue
                if not congress_num:
                    continue
                links.append(self.get_browse_path_url(legtype, congress_num))
            return links, []

        if "getContentDetail" in url:
            return self._detail(data)

        # browse levels share one URL shape; dispatch on childNode content
        child_nodes = data.get("childNodes", [])
        if not child_nodes:
            return [], []
        nv = child_nodes[0].get("nodeValue", {})
        if nv.get("packageid"):
            packages = _nested_values(data, key="packageid")
            links = [self.get_api_detail_url(p) for p in packages]
            # offset pagination (:233-241): re-request with offset+1
            m = re.search(r"offset=(\d+)", url)
            if packages and m:
                cur = int(m.group(1))
                links.append(url.replace(f"offset={cur}", f"offset={cur + 1}"))
            return links, []
        if nv.get("browsePathAlias"):  # bill num chunks (:219-229)
            return [
                self.get_browse_path_url(legtype, p)
                for p in _nested_values(data, key="browsePathAlias")
            ], []
        if nv.get("browsePath"):  # bill types (:206-217)
            return [
                self.get_browse_path_url(legtype, p)
                for p in _nested_values(data, key="browsePath")
            ], []
        return [], []

    def _detail(self, data: dict) -> tuple[list[str], list[dict]]:
        colnames = [c["colname"] for c in data["metadata"]["columnnamevalueset"]]
        if "Law Number" in colnames:
            fields = self._public_law(data)
        elif "Bill Version" in colnames:
            colvalues = [
                ascii_clean(c["colvalue"]) for c in data["metadata"]["columnnamevalueset"]
            ]
            if "Enrolled Bill (ENR)" in colvalues:
                fields = self._enrolled_bill(data)
            else:
                return [], []
        else:
            return [], []

        doc_name, doc_title = fields["doc_name"], fields["doc_title"]
        doc_num, doc_type = fields["doc_num"], fields["doc_type"]
        pub_date = get_pub_date(fields["publication_date"])
        web_url = fields["web_url"]
        display_title = doc_type + " " + doc_num + ": " + doc_title
        raw = {
            "doc_num": doc_num,
            "doc_name": doc_name,
            "doc_title": doc_title,
            "publication_date": pub_date,
            "download_url": web_url,
            "display_title": display_title,
        }
        return [], [
            {
                "doc_name": doc_name,
                "doc_title": doc_title,
                "doc_num": doc_num,
                "doc_type": doc_type,
                "display_doc_type": fields["display_doc_type"],
                "publication_date": pub_date,
                "cac_login_required": "false",
                "download_url": web_url.replace(" ", "%20"),
                "downloadable_items": [
                    {"doc_type": "pdf", "download_url": web_url, "compression_type": None}
                ],
                "version_hash_raw_data": raw,
                "display_title": display_title,
                "file_ext": "pdf",
                "source_page_url": fields["source_page_url"],
            }
        ]

    @staticmethod
    def _details_url(package_id: str) -> str:
        return f"https://www.govinfo.gov/app/details/{package_id}"

    def _public_law(self, data: dict) -> dict:
        package_id = data["documentincontext"]["packageId"]
        web_url = f"https:{data['download']['pdflink']}"
        detail_data = {"Bill Number": "", "Law Number": "", "Full Title": "",
                       "Date Approved": "", "Legislative History": ""}
        for d in data["metadata"]["columnnamevalueset"]:
            if d["colname"] in detail_data:
                detail_data[d["colname"]] = d["colvalue"]
        raw_title = " ".join(data["title"].split()[6:])
        doc_title = ascii_clean(raw_title)
        doc_num = "".join(detail_data["Law Number"].split()[2:])
        return {
            "doc_name": f"{detail_data['Law Number']}".strip(),
            "doc_title": doc_title.strip(),
            "doc_num": doc_num.strip(),
            "doc_type": "Public Law",
            "display_doc_type": "Law",
            "source_page_url": self._details_url(package_id),
            "web_url": web_url,
            "publication_date": detail_data.get("Date Approved"),
        }

    def _enrolled_bill(self, data: dict) -> dict:
        package_id = data["documentincontext"]["packageId"]
        web_url = f"https:{data['download']['pdflink']}"
        detail_data = {"Congress Number": "", "Last Action Date Listed": "",
                       "Bill Number": "", "Bill Version": "", "Full Title": "",
                       "Sponsors": "", "Cosponsors": "", "Committees": ""}
        for d in data["metadata"]["columnnamevalueset"]:
            if d["colname"] in detail_data:
                detail_data[d["colname"]] = d["colvalue"]
        doc_title = ascii_clean(detail_data.get("Full Title"))
        congress_num_str = detail_data.get("Congress Number").replace(" Congress", "")
        bill_type_raw, _, doc_num = detail_data.get("Bill Number").rpartition(" ")
        doc_type = bill_type_raw.replace(" ", "")
        bill_version = BILL_VERSION_RE.search(detail_data.get("Bill Version")).group(1)
        doc_name = f"{doc_type} {doc_num} {bill_version} {congress_num_str}"
        if doc_name == "H.R. 7776 ENR 117th":  # :152-153 literal pin
            doc_title = "National Defense Authorization Act (NDAA) for Fiscal Year 2023"
        return {
            "doc_name": doc_name.strip(),
            "doc_title": doc_title.strip(),
            "doc_num": doc_num.strip(),
            "doc_type": doc_type,
            "display_doc_type": "Enrolled Bill",
            "source_page_url": self._details_url(package_id),
            "web_url": web_url,
            "publication_date": detail_data.get("Last Action Date Listed"),
        }
