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
