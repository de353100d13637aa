"""Sequential reference simulator — the crawl-order/seen-set oracle.

A faithful single-threaded model of the reference's effective semantics
(sequential spiders, per-host politeness budget, discovery-order scheduling,
manifest dedup, zip explode) sharing ONLY the per-page parse functions with
the engine (gc_spark.extractors registry). Scheduling, dedup, sequencing,
hashing-at-explode are re-implemented independently in plain Python so the
distributed engine's ordering and seen-set can be asserted equal against it
(SURVEY.md §5: crawl-order equality, URL-seen-set equality, span equality).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from urllib.parse import urlparse

from gc_spark.extractors import registry
from gc_spark.functions.hashing import dict_to_sha256_hex_digest
from gc_spark.functions.urls import canonicalize_url, is_valid_web_url


@dataclass
class SimResult:
    fetch_batch: dict[str, int] = field(default_factory=dict)  # url -> batch drained
    seen: set[tuple[str, str]] = field(default_factory=set)  # (doc_name, version_hash)
    feed: list[tuple[str, str]] = field(default_factory=list)  # crawl output incl. skips
    dead: list[str] = field(default_factory=list)
    spans: dict[str, list[tuple]] = field(default_factory=dict)  # doc_id -> [(kind,text,media_ref,offset)]


def simulate(
    seeds: list[dict],
    pages: dict[str, dict],
    budget_per_host: int = 10,
    prev_hashes: set[str] | None = None,
    batch_ts: str = "2024-01-01T00:00:00",
    max_batches: int = 100,
) -> SimResult:
    prev_hashes = prev_hashes or set()
    res = SimResult()

    # frontier entries: (priority, depth, seq, url, host, source)
    frontier: list[tuple] = []
    seen_urls: set[str] = set()
    seq = 0
    for row in sorted(seeds, key=lambda r: (r["source"], canonicalize_url(r["url"]))):
        cu = canonicalize_url(row["url"])
        if cu in seen_urls:
            continue
        seen_urls.add(cu)
        frontier.append((0, 0, seq, row["url"], row["host"], row["source"]))
        seq += 1

    emitted_names: set[tuple[str, str]] = set()

    for batch in range(1, max_batches + 1):
        pending = sorted(frontier, key=lambda t: (t[0], t[1], t[2]))
        if not pending:
            break
        taken_per_host: dict[str, int] = {}
        take, rest = [], []
        for entry in pending:
            host = entry[4]
            if taken_per_host.get(host, 0) < budget_per_host:
                taken_per_host[host] = taken_per_host.get(host, 0) + 1
                take.append(entry)
            else:
                rest.append(entry)
        frontier = rest

        new_entries = []
        for priority, depth, pseq, url, host, source in take:
            res.fetch_batch[url] = batch
            page = pages.get(url)
            if page is None or not (200 <= page["status"] < 300):
                res.dead.append(url)
                continue
            ex = registry.get(source)
            if ex is None:
                continue
            links, docs = ex.extract(url, page["body"] or "", page["kind"])

            for idx, href in enumerate(links):
                if "mailto:" in href.lower() or not is_valid_web_url(href):
                    continue
                cu = canonicalize_url(href)
                if cu in seen_urls:
                    continue
                seen_urls.add(cu)
                new_entries.append(
                    ((pseq, idx), (0, depth + 1, None, href, urlparse(href).netloc, source))
                )

            for doc in docs:
                doc_name = doc["doc_name"].replace("/", "_")[0:235]
                if not doc_name:
                    continue
                if (source, doc_name) in emitted_names:
                    continue
                emitted_names.add((source, doc_name))
                vh = dict_to_sha256_hex_digest(doc["version_hash_raw_data"])
                if vh in prev_hashes or any(h == vh for _, h in res.seen):
                    res.feed.append((doc_name, vh))
                    continue
                if doc.get("cac_login_required") == "true":
                    res.feed.append((doc_name, vh))
                    continue

                segments = doc.get("segments") or []
                dl_items = doc.get("downloadable_items") or []
                file_item = next(
                    (i for i in dl_items if i["doc_type"] in ["pdf", "html", "txt", "zip"]),
                    None,
                )
                if file_item:
                    dl_url = file_item["download_url"]
                    dl_page = pages.get(dl_url)
                    if dl_page is None or not (200 <= dl_page["status"] < 300):
                        res.dead.append(dl_url)
                        res.feed.append((doc_name, vh))
                        continue
                    parent_sha = dl_page["media_sha"]
                    entries = sorted(dl_page.get("zip_entries") or [])
                    if entries:
                        for raw_entry in entries:
                            stem = _title42_stem(raw_entry, doc_name)
                            c_raw = dict(doc["version_hash_raw_data"])
                            c_raw["doc_name"] = stem
                            c_vh = dict_to_sha256_hex_digest(c_raw)
                            c_title = stem.split("-", 1)[1].strip() if source != "far_subpart_regs" else stem
                            c_sha = hashlib.sha256(f"{parent_sha}:{stem}".encode()).hexdigest()
                            res.seen.add((stem, c_vh))
                            res.feed.append((stem, c_vh))
                            res.spans[f"{source}::{stem}"] = [
                                ("text", c_title, None, 0),
                                ("media", None, f"blob://sha256/{c_sha}.{file_item['doc_type']}", 1),
                            ]
                    else:
                        res.seen.add((doc_name, vh))
                        res.feed.append((doc_name, vh))
                        res.spans[f"{source}::{doc_name}"] = [
                            ("text", doc.get("doc_title") or doc_name, None, 0),
                            (
                                "media",
                                None,
                                f"blob://sha256/{parent_sha}.{file_item['doc_type']}",
                                1,
                            ),
                        ]
                elif segments:
                    res.seen.add((doc_name, vh))
                    res.feed.append((doc_name, vh))
                    res.spans[f"{source}::{doc_name}"] = [
                        (
                            s["kind"],
                            s["payload"] if s["kind"] == "text" else None,
                            s["payload"] if s["kind"] == "media" else None,
                            i,
                        )
                        for i, s in enumerate(segments)
                    ]
                else:
                    res.feed.append((doc_name, vh))

        # assign seq in discovery order (parent_seq, link_idx)
        for key, (priority, depth, _, href, host, source) in sorted(
            new_entries, key=lambda t: t[0]
        ):
            frontier.append((priority, depth, seq, href, host, source))
            seq += 1

    return res


def _title42_stem(raw_entry: str, parent_doc_name: str) -> str:
    """Child doc_name per the REFERENCE's rules (so the simulator detects
    engine divergence instead of mirroring it): Title-42 entries get the
    chapter/section rename of utils.py:211-227 (then .pdf stripped by the
    stem rule), everything else is Path(entry).stem (pipelines.py:98)."""
    import re as _re

    ch = _re.search(r"ch(\d+)to(\d+)", raw_entry)
    sc = _re.search(r"Secs(\d+)to(\d+)", raw_entry)
    if raw_entry.startswith("usc42") and ch and sc:
        return (
            f"{parent_doc_name} - Ch{ch.group(1)} to Ch{ch.group(2)}"
            f" - Sec{sc.group(1)} to Sec{sc.group(2)}"
        )
    # reference rule, NOT the engine's: child doc_name = sub_path.stem
    # (pipelines.py:98) — pathlib strips the last extension only
    from pathlib import PurePosixPath

    return PurePosixPath(raw_entry).stem
