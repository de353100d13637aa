"""Deterministic synthetic fixtures (seed-free: everything is a pure function
of the committed fixture JSON / loop indices — FIXTURES.md).

- `us_code_pages` rebuilds the uscode.house.gov download listing from
  tests/resources/us_code_site.json (itself derived from the reference's
  committed golden fixtures) so the engine's output can be compared against
  the reference's 63-record manifest byte-for-byte.
- `scale_site_pages` builds a multi-host paginated site with a skewed
  (1/rank) host-size distribution to exercise politeness, pagination
  expansion, interleaved spans, and hot-host salting.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from gc_spark.schema import PAGES, SEEDS

RES = Path(__file__).parent / "resources"

US_CODE_DEAD_ROW = {
    "display": "Title 99 - Synthetic Dead Document",
    "currency": "117-127",
    "href": "releasepoints/us/pl/117/127/pdf_usc99@117-127.zip",
    "appendix": False,
    "dead": True,  # binary page intentionally absent -> 404 -> dead_letter
}


def load_us_code_site() -> dict:
    return json.loads((RES / "us_code_site.json").read_text())


def us_code_listing_html(site: dict, include_dead_row: bool = False) -> str:
    rows = list(site["rows"]) + ([US_CODE_DEAD_ROW] if include_dead_row else [])
    parts = ['<div class="uscitemlist">']
    parts.append('<div class="uscitem" id="alltitles"><div>All titles</div></div>')
    for r in rows:
        cls = "uscitem"
        inner = [f"<div>{r['display']}</div>"]
        if r["appendix"]:
            inner.append('<div class="usctitleappendix">Appendix</div>')
        inner.append(f'<div class="itemcurrency">{r["currency"]}</div>')
        if r["href"]:
            inner.append(
                f'<div class="itemdownloadlinks"><a title="PDF (best for printing)" href="{r["href"]}">PDF</a></div>'
            )
        parts.append(f'<div class="{cls}">' + "".join(inner) + "</div>")
    parts.append("</div>")
    return "".join(parts)


def media_sha_for(url: str) -> str:
    return hashlib.sha256(url.encode()).hexdigest()


def us_code_pages(spark: SparkSession, include_dead_row: bool = False) -> DataFrame:
    site = load_us_code_site()
    rows = [
        {
            "url": site["listing_url"],
            "status": 200,
            "body": us_code_listing_html(site, include_dead_row),
            "links": None,
            "kind": "listing",
            "media_sha": None,
            "zip_entries": None,
        }
    ]
    hrefs = {r["href"] for r in site["rows"] if r["href"]}
    for href in sorted(hrefs):
        url = f"https://uscode.house.gov/download/{href}"
        rows.append(
            {
                "url": url,
                "status": 200,
                "body": None,
                "links": None,
                "kind": "binary",
                "media_sha": media_sha_for(url),
                "zip_entries": site["zip_children"].get(url),
            }
        )
    return spark.createDataFrame(rows, schema=PAGES)


def us_code_seeds(spark: SparkSession) -> DataFrame:
    site = load_us_code_site()
    return spark.createDataFrame(
        [
            {
                "source": "us_code",
                "url": site["listing_url"],
                "host": "uscode.house.gov",
                "allowed_domains": [],
            }
        ],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# scale site: H hosts, zipf-ish sizes, paginated listings, interleaved docs
# ---------------------------------------------------------------------------


def scale_site_rows(
    num_hosts: int = 5, docs_host0: int = 24, page_size: int = 6
) -> list[dict]:
    """Host i gets docs_host0 // (i+1) docs — rank-skewed like real frontiers."""
    rows = []
    for h in range(num_hosts):
        host = f"host{h:02d}.example.mil"
        ndocs = max(1, docs_host0 // (h + 1))
        npages = (ndocs + page_size - 1) // page_size
        for p in range(npages):
            lo, hi = p * page_size, min((p + 1) * page_size, ndocs)
            links = "".join(
                f'<li><a href="/doc/{j}">Doc {j}</a></li>' for j in range(lo, hi)
            )
            nxt = (
                f'<a rel="next" href="/list/{p + 1}">next</a>' if p + 1 < npages else ""
            )
            rows.append(
                {
                    "url": f"https://{host}/list/{p}",
                    "status": 200,
                    "body": f"<ul>{links}</ul>{nxt}",
                    "links": None,
                    "kind": "listing",
                    "media_sha": None,
                    "zip_entries": None,
                }
            )
        for j in range(ndocs):
            doc_name = f"{host}-doc-{j}"
            nseg = 1 + (j % 4)
            segs = []
            for s in range(nseg):
                if s % 2 == 0:
                    segs.append(f"<p>text {doc_name} seg{s}</p>")
                else:
                    ref = f"blob://sha256/{media_sha_for(doc_name + str(s))}.png"
                    segs.append(f'<img src="{ref}">')
            body = (
                f"<h1>{doc_name}</h1>"
                f'<span class="date">2022-03-{(j % 28) + 1:02d}</span>' + "".join(segs)
            )
            rows.append(
                {
                    "url": f"https://{host}/doc/{j}",
                    "status": 200,
                    "body": body,
                    "links": None,
                    "kind": "detail",
                    "media_sha": None,
                    "zip_entries": None,
                }
            )
    return rows


def scale_site_pages(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(scale_site_rows(**kw), schema=PAGES)


def json_api_rows(num_pages: int = 3, per_page: int = 4) -> list[dict]:
    """Paginated JSON API site (S5: executive_orders/sorn shape)."""
    import json as _json

    rows = []
    host = "api.example.mil"
    for p in range(num_pages):
        results = [
            {
                "document_number": f"{2024}-{p * per_page + i:05d}",
                "title": f"Order {p * per_page + i}",
                "publication_date": f"2024-02-{(i % 28) + 1:02d}",
                "pdf_url": f"https://{host}/files/{p * per_page + i}.pdf",
            }
            for i in range(per_page)
        ]
        body = {
            "count": num_pages * per_page,
            "next_page_url": f"https://{host}/api/v1/documents.json?page={p + 1}"
            if p + 1 < num_pages
            else None,
            "results": results,
        }
        rows.append(
            {
                "url": f"https://{host}/api/v1/documents.json?page={p}",
                "status": 200,
                "body": _json.dumps(body),
                "links": None,
                "kind": "api",
                "media_sha": None,
                "zip_entries": None,
            }
        )
    for i in range(num_pages * per_page):
        url = f"https://{host}/files/{i}.pdf"
        rows.append(
            {
                "url": url,
                "status": 200,
                "body": None,
                "links": None,
                "kind": "binary",
                "media_sha": media_sha_for(url),
                "zip_entries": None,
            }
        )
    return rows


def json_api_pages(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(json_api_rows(**kw), schema=PAGES)


def json_api_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            {
                "source": "json_api",
                "url": "https://api.example.mil/api/v1/documents.json?page=0",
                "host": "api.example.mil",
                "allowed_domains": [],
            }
        ],
        schema=SEEDS,
    )


def issuances_rows(n_docs: int = 8) -> list[dict]:
    """Table-listing site (dod_issuances shape): doc-type prefixes, dates in
    mixed formats, OPR cells with planted phone numbers/emails, one
    CAC-gated row."""
    host = "issuances.example.mil"
    trs = []
    for i in range(n_docs):
        prefix = ["DTMS", "DODD", "DODI"][i % 3]
        title = f"Policy Memo {i}" + (" CAC" if i == 5 else "")
        date = ["3/4/2024", "2024-03-05", "06 March 2024"][i % 3]
        opr = f"Office {i} 703-555-010{i % 10} contact{i}@example.mil"
        trs.append(
            f'<tr><td><a href="/pdf/doc{i}.pdf">{prefix} 24-00{i}</a></td>'
            f"<td>{title}</td><td>{date}</td><td>{opr}</td></tr>"
        )
    rows = [
        {
            "url": f"https://{host}/listing",
            "status": 200,
            "body": "<table>" + "".join(trs) + "</table>",
            "links": None,
            "kind": "listing",
            "media_sha": None,
            "zip_entries": None,
        }
    ]
    for i in range(n_docs):
        url = f"https://{host}/pdf/doc{i}.pdf"
        rows.append(
            {
                "url": url,
                "status": 200,
                "body": None,
                "links": None,
                "kind": "binary",
                "media_sha": media_sha_for(url),
                "zip_entries": None,
            }
        )
    return rows


def issuances_pages(spark: SparkSession, **kw) -> DataFrame:
    return spark.createDataFrame(issuances_rows(**kw), schema=PAGES)


def issuances_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            {
                "source": "issuances",
                "url": "https://issuances.example.mil/listing",
                "host": "issuances.example.mil",
                "allowed_domains": [],
            }
        ],
        schema=SEEDS,
    )


def scale_site_seeds(spark: SparkSession, num_hosts: int = 5) -> DataFrame:
    return spark.createDataFrame(
        [
            {
                "source": "synthetic",
                "url": f"https://host{h:02d}.example.mil/list/0",
                "host": f"host{h:02d}.example.mil",
                "allowed_domains": [],
            }
            for h in range(num_hosts)
        ],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# executive orders (ex_orders) — landing → bulk JSON → per-doc detail JSON
# ---------------------------------------------------------------------------

EO_HOST = "www.federalregister.gov"


def ex_orders_rows() -> list[dict]:
    import json as _json

    base = f"https://{EO_HOST}"
    landing = (
        '<div class="page-summary reader-aid"><ul class="bulk-files"><li>'
        f'<span class="links"><a href="{base}/documents.csv">CSV</a>'
        f'<a href="{base}/documents.json">JSON</a></span></li></ul></div>'
    )
    details = [
        {  # normal EO
            "title": "Improving Analytics",
            "publication_date": "02/09/1996",
            "signing_date": "1996-02-05",
            "disposition_notes": "Revokes EO 12800",
            "executive_order_number": "12988",
            "pdf_url": f"{base}/pdf/eo12988.pdf",
            "full_text_xml_url": f"{base}/xml/eo12988.xml",
            "raw_text_url": f"{base}/txt/eo12988.txt",
        },
        {  # the mis-numbered CHAMPUS notice: must be SKIPPED
            "title": "CHAMPUS civilian health program notice",
            "publication_date": "02/09/1996",
            "signing_date": "",
            "disposition_notes": "",
            "executive_order_number": "12988",
            "pdf_url": f"{base}/pdf/champus.pdf",
        },
        {  # numberless: doc_name falls back to title
            "title": "Closing of departments in memory",
            "publication_date": "1994-04-27",
            "signing_date": "1994-04-25",
            "disposition_notes": "",
            "executive_order_number": None,
            "pdf_url": f"{base}/pdf/eo-memorial.pdf",
        },
    ]
    detail_urls = [f"{base}/api/v1/documents/{i}.json" for i in range(len(details))]
    page2 = {"results": [{"json_url": detail_urls[2]}], "next_page_url": None}
    page1 = {
        "results": [{"json_url": detail_urls[0]}, {"json_url": detail_urls[1]}],
        "next_page_url": f"{base}/documents.json?page=2",
    }
    rows = [
        {"url": f"{base}/presidential-documents/executive-orders", "status": 200,
         "body": landing, "links": None, "kind": "landing", "media_sha": None,
         "zip_entries": None},
        {"url": f"{base}/documents.json", "status": 200, "body": _json.dumps(page1),
         "links": None, "kind": "api", "media_sha": None, "zip_entries": None},
        {"url": f"{base}/documents.json?page=2", "status": 200, "body": _json.dumps(page2),
         "links": None, "kind": "api", "media_sha": None, "zip_entries": None},
    ]
    for u, d in zip(detail_urls, details):
        rows.append({"url": u, "status": 200, "body": _json.dumps(d), "links": None,
                     "kind": "api", "media_sha": None, "zip_entries": None})
    for d in details:
        u = d["pdf_url"]
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})
    return rows


def ex_orders_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ex_orders_rows(), schema=PAGES)


def ex_orders_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [{"source": "ex_orders",
          "url": f"https://{EO_HOST}/presidential-documents/executive-orders",
          "host": EO_HOST}],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# air force e-publishing (air_force_pubs) — five-column product-index table
# ---------------------------------------------------------------------------

AF_HOST = "www.e-publishing.af.mil"
AF_STATIC = "https://static.e-publishing.af.mil/pubs"

# (product_number, title, pub_date_raw, cert_date_raw, last_action)
AF_ROWS = [
    ("AFI21-101", "Maintenance, Mgmt: of Systems!", "20240102 081500", "20240103", "UpdatedRewrite"),
    ("CFETP2A3X3", "Career Field Training", "20230601 090000", "20230601", "Update"),
    ("2T0X1_F-35_AFJQS", "F-35 Qual Standard", "20220315 120000", "20220316", "New"),
    ("AFHandbook1", "Airman Handbook", "20210701 000000", "20210702", "Rewrite"),
    ("BOWFUSF", "Blue Book", "20200101 000000", "20200102", "Update"),
    ("AFI16-1404SMALL", "Small Format Security", "20230901 070000", "20230902", "Update"),
    ("DODI8510.01_AFI17-101", "Risk Mgmt Framework", "20231101 060000", "20231102", "Certified"),
    ("dafgm2024-36-01", "Guidance Memo", "20240201 050000", "20240202", "New"),
    ("AFMAN17-1301-S", "FOUO Comsec Manual", "20240301 040000", "20240302", "Update"),
]


def air_force_rows() -> list[dict]:
    trs = []
    for prod, title, pub, cert, action in AF_ROWS:
        url = f"{AF_STATIC}/{prod.lower()}.pdf"
        trs.append(
            f'<tr><td><a href="{url}">{prod}</a></td><td><a>{title}</a></td>'
            f"<td><span>{pub}</span></td><td><span>{cert}</span></td>"
            f"<td>{action}</td></tr>"
        )
    rows = [
        {"url": f"https://{AF_HOST}/Product-Index/cat-1", "status": 200,
         "body": "<table>" + "".join(trs) + "</table>", "links": None,
         "kind": "listing", "media_sha": None, "zip_entries": None}
    ]
    for prod, *_ in AF_ROWS:
        u = f"{AF_STATIC}/{prod.lower()}.pdf"
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})
    return rows


def air_force_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(air_force_rows(), schema=PAGES)


def air_force_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [{"source": "air_force_pubs",
          "url": f"https://{AF_HOST}/Product-Index/cat-1", "host": AF_HOST}],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# marine corps MCPEL (marine_pubs) — two-hop: listing → detail page → pdf
# ---------------------------------------------------------------------------

MC_HOST = "www.marines.mil"
MC_BASE = f"https://{MC_HOST}/News/Publications/MCPEL/?Page="

# (doc_type_raw, doc_type_num_raw, doc_title_raw, status, slug, has_download)
MC_ROWS = [
    ("MCO", "MCO 5215.1K", "Marine Corps Directives System", "Active", "mco-5215", True),
    ("NAVMC", "NAVMC 2915", "Mess Management", "Active", "navmc-2915", True),
    ("Historical", "Small Wars Manual", "Historic Pubs", "Active", "small-wars", True),
    ("Navy Pubs", "SECNAV M-5210.1", "Records Management", "Active", "secnav-m", True),
    ("Misc Pubs", "IRM-2300-05A", "IRM Standards FOUO", "Active", "irm-2300", True),
    ("MCO", "MCO 1200.18", "Deleted MOS Manual", "Deleted", "mco-1200", True),
    ("Weird Type", "XX 1", "Unknown", "Active", "weird", True),
    ("MCO P", "MCO P1080.40C", "MCTFS Codes Manual", "Active", "mco-p1080", False),
]


def marine_rows() -> list[dict]:
    litems = []
    for t, num, title, status, slug, _dl in MC_ROWS:
        litems.append(
            f'<div class="litem"><a href="/detail/{slug}/">'
            f'<div class="list-type"><span>{t}</span></div>'
            f'<div class="list-title">{num}</div>'
            f'<div class="cat"><span>{title}</span></div>'
            f'<div class="status">{status}</div></a></div></div>'
        )
    rows = [
        {"url": f"{MC_BASE}1", "status": 200,
         "body": '<div class="alist-more-here">' + "".join(litems) + "</div>",
         "links": None, "kind": "listing", "media_sha": None, "zip_entries": None},
        # empty page ends the ?Page=N pagination
        {"url": f"{MC_BASE}2", "status": 200, "body": "<div></div>", "links": None,
         "kind": "listing", "media_sha": None, "zip_entries": None},
    ]
    for t, num, title, status, slug, has_dl in MC_ROWS:
        pdf = f"https://{MC_HOST}/files/{slug}.pdf"
        body = (
            f'<div class="download-section"><a href="{pdf}">Download</a></div>'
            if has_dl
            else '<div class="body-text">no link here</div>'
        )
        rows.append({"url": f"https://{MC_HOST}/detail/{slug}/", "status": 200,
                     "body": body, "links": None, "kind": "detail",
                     "media_sha": None, "zip_entries": None})
        if has_dl:
            rows.append({"url": pdf, "status": 200, "body": None, "links": None,
                         "kind": "binary", "media_sha": media_sha_for(pdf),
                         "zip_entries": None})
    return rows


def marine_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(marine_rows(), schema=PAGES)


def marine_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [{"source": "marine_pubs", "url": f"{MC_BASE}1", "host": MC_HOST}],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# wave-2 combined site: DISA_pubs + SORN + maradmin_pubs in one crawl
# ---------------------------------------------------------------------------

SORN_QUERY_URL = (
    "https://www.federalregister.gov/api/v1/documents.json?per_page=1000"
    "&order=newest&conditions[term]=%22Privacy%20Act%20of%201974%22%20%7C"
    "%20%22System%20of%20Records%22"
    "&conditions[agencies][]=defense-department"
    "&conditions[type][]=NOTICE"
)


def wave2_rows() -> list[dict]:
    import json as _json

    rows = []
    # --- DISA: one listing, two pdf docs
    disa_body = (
        "<table>"
        '<tr><td><a href="/pdfs/DISAI-100-50-3.pdf">DISAI 100-50-3</a></td>'
        "<td>Information Technology</td><td>03/17/ 17</td></tr>"
        '<tr><td><a href="/pdfs/DISAC-310-65-1.pdf">DISAC 310-65-1</a></td>'
        "<td>Circuit Mgmt</td><td>04/15/13</td></tr>"
        "</table>"
    )
    rows.append({"url": "https://disa.mil/About/DISA-Issuances/Instructions",
                 "status": 200, "body": disa_body, "links": None, "kind": "listing",
                 "media_sha": None, "zip_entries": None})
    for p in ("DISAI-100-50-3", "DISAC-310-65-1"):
        u = f"https://disa.mil/pdfs/{p}.pdf"
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})

    # --- SORN: agencies api → constructed query → page 2
    rows.append({"url": "https://www.federalregister.gov/api/v1/agencies/defense-department",
                 "status": 200, "body": _json.dumps({"child_slugs": ["defense-department"]}),
                 "links": None, "kind": "api", "media_sha": None, "zip_entries": None})
    page2_url = "https://www.federalregister.gov/api/v1/documents.json?page=2"
    sorn_docs = [
        {"document_number": "2024-11111", "title": "Privacy Act; Records A",
         "pdf_url": "https://www.govinfo.gov/pdf/2024-11111.pdf",
         "html_url": "https://www.federalregister.gov/documents/2024-11111",
         "publication_date": "2024-06-03"},
        {"document_number": "2024-22222", "title": "Privacy Act; Records B",
         "pdf_url": "https://www.govinfo.gov/pdf/2024-22222.pdf",
         "html_url": "https://www.federalregister.gov/documents/2024-22222",
         "publication_date": "2024-05-01"},
    ]
    rows.append({"url": SORN_QUERY_URL, "status": 200,
                 "body": _json.dumps({"results": sorn_docs[:1], "next_page_url": page2_url}),
                 "links": None, "kind": "api", "media_sha": None, "zip_entries": None})
    rows.append({"url": page2_url, "status": 200,
                 "body": _json.dumps({"results": sorn_docs[1:], "next_page_url": None}),
                 "links": None, "kind": "api", "media_sha": None, "zip_entries": None})
    for d in sorn_docs:
        rows.append({"url": d["pdf_url"], "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(d["pdf_url"]),
                     "zip_entries": None})

    # --- maradmin: 2 board pages (header row + messages), html 'downloads'
    def mrow(num, title, href, date, status):
        return ('<div class="maradmin-row">'
                f'<div class="msg-num msg-col"><a>{num}</a></div>'
                f'<div class="msg-title msg-col"><a href="{href}">{title}</a></div>'
                f'<div class="msg-pub-date msg-col">{date}</div>'
                f'<div class="msg-status msg-col">{status}</div>'
                "</div></div>")

    base = "https://www.marines.mil/News/Messages/MARADMINS/"
    msg = ["https://www.marines.mil/msg/123", "https://www.marines.mil/msg/124",
           "https://www.marines.mil/msg/125"]
    p1 = (mrow("hdr", "header", "#", "", "")
          + mrow("123/24", "TRAINING GUIDANCE", msg[0], "1/5/2024", "Active")
          + mrow("124/24", "CANCELLED THING", msg[1], "1/6/2024", "Cancelled")
          + f'<a class="da_next_pager" href="{base}?Page=2">next</a>')
    p2 = (mrow("hdr", "header", "#", "", "")
          + mrow("125/24", "FY25 POLICY", msg[2], "2/1/2024", "Active"))
    rows.append({"url": base, "status": 200, "body": p1, "links": None,
                 "kind": "listing", "media_sha": None, "zip_entries": None})
    rows.append({"url": f"{base}?Page=2", "status": 200, "body": p2, "links": None,
                 "kind": "listing", "media_sha": None, "zip_entries": None})
    for u in msg:
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})
    return rows


def wave2_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(wave2_rows(), schema=PAGES)


def wave2_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            {"source": "DISA_pubs", "url": "https://disa.mil/About/DISA-Issuances/Instructions",
             "host": "disa.mil"},
            {"source": "SORN",
             "url": "https://www.federalregister.gov/api/v1/agencies/defense-department",
             "host": "www.federalregister.gov"},
            {"source": "maradmin_pubs",
             "url": "https://www.marines.mil/News/Messages/MARADMINS/",
             "host": "www.marines.mil"},
        ],
        schema=SEEDS,
    )


# ---------------------------------------------------------------------------
# wave-3 combined site: CNSS + secnav_pubs + SASC in one crawl
# ---------------------------------------------------------------------------


def wave3_rows() -> list[dict]:
    import json as _json

    rows = []
    # --- CNSS: landing fans out to 9 issuance pages; two have docs
    rows.append({"url": "https://www.cnss.gov/CNSS/index.cfm", "status": 200,
                 "body": "<html>landing</html>", "links": None, "kind": "landing",
                 "media_sha": None, "zip_entries": None})
    def cnss_item(name, desc, date, href):
        return (f'<tr><td>i</td><td><a href="{href}">dl</a>'
                f'<p class="documentTitle"><span itemprop="name">{name}</span>'
                f'<span itemprop="description">{desc}</span></p>'
                f'<p class="documentInfo"><span itemprop="dateCreated">{date}</span></p>'
                "</td></tr>")
    pages = {
        "Policies.cfm": "<table>" + cnss_item("CNSSP 22", "IA Risk Policy", "2016-01-04", "/l/p22") + "</table>",
        "Instructions.cfm": "<table>" + cnss_item("CNSS-041-15", "Advisory Memo", "2015-06-01", "/l/i41") + "</table>",
    }
    for page in ("Policies.cfm", "Directives.cfm", "Instructions.cfm", "Memoranda.cfm",
                 "TSG_Standards.cfm", "TSG_Information.cfm", "CNSS_Reports.cfm",
                 "Supplemental.cfm", "historicalIndex.cfm"):
        rows.append({"url": f"https://www.cnss.gov/CNSS/issuances/{page}", "status": 200,
                     "body": pages.get(page, "<table></table>"), "links": None,
                     "kind": "listing", "media_sha": None, "zip_entries": None})
    for path in ("/l/p22", "/l/i41"):
        u = f"https://www.cnss.gov{path}"
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})

    # --- secnav: default.aspx -> two boards; one page of each, no NextHref
    rows.append({"url": "https://www.secnav.navy.mil/doni/default.aspx", "status": 200,
                 "body": "<html/>", "links": None, "kind": "landing",
                 "media_sha": None, "zip_entries": None})
    blob = {"Row": [
        {"Echelon": "SECNAV", "FileLeafRef": "5215.1E.pdf",
         "FileRef": "/doni/Directives/5215.1E.pdf", "Subject": "Directives Policy",
         "Status": "Active", "Sponsor": "DNS", "Cancelled_x0020_Date": "",
         "File_x0020_Type": "pdf", "Effective_x0020_Date": "2016-03-01"}]}
    rows.append({"url": "https://www.secnav.navy.mil/doni/allinstructions.aspx",
                 "status": 200, "body": f"<script>var WPQ3ListData = {_json.dumps(blob)};</script>",
                 "links": None, "kind": "listing", "media_sha": None, "zip_entries": None})
    rows.append({"url": "https://www.secnav.navy.mil/doni/notices.aspx", "status": 200,
                 "body": "<script>var WPQ3ListData = {\"Row\": []};</script>",
                 "links": None, "kind": "listing", "media_sha": None, "zip_entries": None})
    u = "https://www.secnav.navy.mil/doni/Directives/5215.1E.pdf"
    rows.append({"url": u, "status": 200, "body": None, "links": None,
                 "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})

    # --- SASC: hearings root -> 1 page -> 1 hearing -> witness pdf redirect
    rows.append({"url": "https://www.armed-services.senate.gov/hearings", "status": 200,
                 "body": '<select id="showing-page"><option>1</option></select>',
                 "links": None, "kind": "landing", "media_sha": None, "zip_entries": None})
    rows.append({"url": "https://www.armed-services.senate.gov/hearings?pagenum_rs=1",
                 "status": 200,
                 "body": ('<div class="LegislationList__item">'
                          '<a href="https://www.armed-services.senate.gov/hearings/posture">x</a>'
                          '<div class="LegislationList__typeCol col-12 col-xl-3">'
                          "<span>t</span>Full Committee Hearing</div>"),
                 "links": None, "kind": "listing", "media_sha": None, "zip_entries": None})
    hearing = (
        '<div class="SiteLayout__main">'
        '<h1 class="Heading__title">Posture of the Department</h1>'
        '<div class="Hearing__type">Full Committee Hearing</div>'
        '<div class="Hearing__detail"><time datetime="2024-04-09">Apr 9</time></div>'
        '<li class="col-12 col-md-6 p-2"><h3 class="Heading__title">'
        "<span>General</span><span>Jane Doe</span></h3>"
        '<div class="mt-3"><a href="https://www.armed-services.senate.gov/r/apq1">'
        "<span>APQ Responses</span></a></div></li></div>"
    )
    # the hearing page is BOTH a parse target and its own html download
    # (downloadable item doc_type 'html' pointing at the page), so the row
    # carries a media_sha alongside its body
    rows.append({"url": "https://www.armed-services.senate.gov/hearings/posture",
                 "status": 200, "body": hearing, "links": None, "kind": "detail",
                 "media_sha": media_sha_for("https://www.armed-services.senate.gov/hearings/posture"),
                 "zip_entries": None})
    rows.append({"url": "https://www.armed-services.senate.gov/r/apq1", "status": 200,
                 "body": '<p><a href="https://www.armed-services.senate.gov/dl/doe-apq.pdf">f</a></p>',
                 "links": None, "kind": "detail", "media_sha": None, "zip_entries": None})
    for u in ("https://www.armed-services.senate.gov/dl/doe-apq.pdf",):
        rows.append({"url": u, "status": 200, "body": None, "links": None,
                     "kind": "binary", "media_sha": media_sha_for(u), "zip_entries": None})
    return rows


def wave3_pages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(wave3_rows(), schema=PAGES)


def wave3_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            {"source": "CNSS", "url": "https://www.cnss.gov/CNSS/index.cfm",
             "host": "www.cnss.gov"},
            {"source": "secnav_pubs", "url": "https://www.secnav.navy.mil/doni/default.aspx",
             "host": "www.secnav.navy.mil"},
            {"source": "SASC", "url": "https://www.armed-services.senate.gov/hearings",
             "host": "www.armed-services.senate.gov"},
        ],
        schema=SEEDS,
    )
