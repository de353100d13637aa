"""Derivation tests for the wave-2 extractor families (pubs_tables.py +
misc_sites.py). Each test feeds the family's synthetic twin page to
extract() and pins the reference spider's distinctive logic: doc_name/num
carving, display maps, date formats, dedup rules, and hash-dict contents
and KEY ORDER (dict_to_sha256_hex_digest folds in insertion order, so order
is part of the version-hash contract)."""

from __future__ import annotations

import json

import pytest

from gc_spark.extractors import registry


def ex(source):
    return registry[source]


# ---------------------------------------------------------------- DISA_pubs


class TestDisa:
    BODY = (
        "<table>"
        '<tr><td>Header</td></tr>'
        '<tr><td><a href="/pdfs/DISAI-100-50-3.pdf">DISAI 100-50-3</a></td>'
        "<td>Information Technology</td><td>03/17/ 17</td></tr>"
        '<tr><td><a href="/pdfs/DISAC-310-65-1.pdf">DISAC 310-65-1</a></td>'
        "<td>Circuit Mgmt</td><td>04/15/13</td></tr>"
        '<tr><td><a href="/pdfs/other.pdf">OTHER 1</a></td>'
        "<td>Unknown type</td><td>01/01/20</td></tr>"
        "</table>"
    )

    def test_derivations(self):
        _, docs = ex("DISA_pubs").extract(
            "https://disa.mil/About/DISA-Issuances/Instructions", self.BODY, "listing"
        )
        # header row (1 cell) and unknown type row dropped
        assert [d["doc_type"] for d in docs] == ["Instruction", "Circular"]
        d = docs[0]
        assert d["doc_name"] == "DISAI 100-50-3"
        assert d["doc_num"] == "100-50-3"  # last space-token
        # '03/17/ 17' → space-stripped %m/%d/%y → ISO
        assert d["publication_date"] == "2017-03-17T00:00:00"
        assert d["download_url"] == "https://disa.mil/pdfs/DISAI-100-50-3.pdf"
        # set_display_name: '{doc_name}: {doc_title}', NOT type+num
        assert d["display_title"] == "DISAI 100-50-3: Information Technology"
        assert list(d["version_hash_raw_data"]) == [
            "doc_name", "doc_num", "publication_date", "download_url", "display_title",
        ]


# -------------------------------------------------------------------- DCMA


class TestDcma:
    BODY = (
        "<table>"
        '<tr><td>Contract Audits</td><td>DPS</td><td>4-101</td>'
        '<td>February 14, 2019</td><td><a href="/Portals/31/Documents/Policy/DCMA-PTM-4101.pdf">link</a></td></tr>'
        '<tr><td>Plain Manual</td><td>MAN</td><td>2501</td>'
        '<td>not a date</td><td><a href="/Portals/31/m.pdf">link</a></td></tr>'
        "</table>"
    )

    def test_derivations(self):
        _, docs = ex("DCMA").extract("https://www.dcma.mil/Policy/", self.BODY, "listing")
        a, b = docs
        assert a["display_doc_type"] == "Memo"  # DPS → Memo
        assert a["doc_type"] == "DCMA DPS"
        assert a["doc_name"] == "DCMA DPS 4-101"
        assert a["download_url"].startswith("https://www.dcma.mil/Portals/31/")
        assert a["publication_date"] == "2019-02-14T00:00:00"
        assert b["display_doc_type"] == "MAN"
        assert b["publication_date"] == ""  # dcma get_pub_date: '' on failure
        # custom 3-field hash dict (dcma_spider.py:80-84)
        assert list(a["version_hash_raw_data"]) == [
            "item_currency", "document_title", "display_title",
        ]
        assert a["version_hash_raw_data"]["item_currency"] == (
            "/Portals/31/Documents/Policy/DCMA-PTM-4101.pdf"
        )


# -------------------------------------------------------------------- STIG


class TestStig:
    BODY = (
        "<table>"
        '<tr><td><a href="/wp-content/uploads/stig Ver 2 doc.pdf">x</a>'
        '<span style="display:none;">Application Security Ver 2 Rel 3 STIG/ Guide</span>'
        '<span style="display:none;">2024-01-05</span></td></tr>'
        '<tr><td><a href="/memo.pdf">x</a>'
        '<span style="display:none;">Traditional Security Release Memo</span>'
        '<span style="display:none;">2023-06-01</span></td></tr>'
        '<tr><td><a href="/thing.zip">x</a>'
        '<span style="display:none;">Zipped Ver 1</span>'
        '<span style="display:none;">2023-06-01</span></td></tr>'
        "</table>"
    )

    def test_derivations(self):
        _, docs = ex("stig_pubs").extract("https://public.cyber.mil/stigs/downloads/", self.BODY, "listing")
        assert len(docs) == 2  # .zip row dropped (pdf-only filter)
        a, b = docs
        assert a["doc_num"] == "V2R3"  # ' Ver 2' + ' Rel 3'
        # slash cleanup: 'STIG/ Guide' → 'STIG Guide'
        assert a["doc_title"] == "Application Security Ver 2 Rel 3 STIG Guide"
        assert a["doc_name"] == f"STIG V2R3 {a['doc_title']}"
        assert a["display_doc_type"] == "STIG"
        assert b["doc_num"] == "V0R1"  # Release Memo → rel 1, no ver
        assert b["display_doc_type"] == "Memo"
        # items URL space-encoded; hash URL raw
        assert docs[0]["downloadable_items"][0]["download_url"].endswith("stig%20Ver%202%20doc.pdf")
        assert docs[0]["version_hash_raw_data"]["download_url"].endswith("stig Ver 2 doc.pdf")


# ---------------------------------------------------------------- dha_pubs


class TestDha:
    BODY = (
        "<table>"
        '<tr><th>DHA-Procedural Instruction</th><td><a href="/p/6025.pdf">6025.13</a></td>'
        "<td>Clinical Quality</td><td>Active</td><td>01/05/2023</td></tr>"
        '<tr><th>DHA-Procedural Instruction</th><td><a href="/p/6025v2.pdf">6025.13</a></td>'
        "<td>Clinical Quality v2</td><td>Active</td><td>03/05/2023</td></tr>"
        '<tr><th>DHA-Procedural Instruction</th><td><a href="/p/6025v0.pdf">6025.13</a></td>'
        "<td>Clinical Quality old</td><td>Active</td><td>01/01/2020</td></tr>"
        "</table>"
    )

    def test_updated_suffix_rule(self):
        _, docs = ex("dha_pubs").extract("https://www.health.mil/x", self.BODY, "listing")
        # row2 has a NEWER date → kept with ' Updated'; row3 older → dropped
        assert [d["doc_name"] for d in docs] == [
            "DHA Procedural Instruction 6025.13",
            "DHA Procedural Instruction 6025.13 Updated",
        ]
        assert docs[0]["doc_type"] == "DHA Procedural Instruction"  # 'DHA-' → 'DHA '
        assert docs[0]["display_doc_type"] == "Instruction"  # contains-map
        assert docs[0]["download_url"] == "https://www.health.mil/p/6025.pdf"
        assert docs[0]["publication_date"] == "2023-01-05T00:00:00"


# ---------------------------------------------------------------- fmr_pubs


class TestFmr:
    LANDING = (
        '<div id="sitetitle"><a href="#prev">«</a>'
        '<a href="vol1_chapters.aspx">1</a><a href="vol2a_chapters.aspx">2A</a>'
        '<a href="#next">»</a></div>'
    )
    VOLUME = (
        "<table>"
        '<tr><td><a href="Documents/fmr/Volume_02a/02a_01 new.pdf">Chapter 1</a></td>'
        "<td>General Information (July 2024)</td><td>2024-07-01</td></tr>"
        '<tr><td><a href="Documents/fmr/02a_intro.pdf">Introduction 010203</a></td>'
        "<td>Overview: Basics</td><td>2024-06-01</td></tr>"
        '<tr><td><a href="Documents/fmr/02a_01b.pdf">Chapter 1</a></td>'
        "<td>Duplicate: Chapter Title</td><td>2024-05-01</td></tr>"
        "</table>"
    )

    def test_landing_drops_nav_arrows(self):
        links, docs = ex("fmr_pubs").extract(
            "https://comptroller.defense.gov/FMR/", self.LANDING, "landing"
        )
        assert links == [
            "https://comptroller.defense.gov/FMR/vol1_chapters.aspx",
            "https://comptroller.defense.gov/FMR/vol2a_chapters.aspx",
        ]
        assert docs == []

    def test_volume_rows(self):
        _, docs = ex("fmr_pubs").extract(
            "https://comptroller.defense.gov/FMR/vol2a_chapters.aspx", self.VOLUME, "listing"
        )
        a, b, c = docs
        assert a["doc_num"] == "V2aCH1"
        assert a["doc_title"] == "General Information"  # paren strip + ascii_clean strip
        # non-Chapter/Appendix: ch clamped to 3 chars
        assert b["doc_num"] == "V2aCH010"
        # duplicate doc_name → title pre-colon prefix appended
        assert c["doc_name"] == "DoDFMR V2aCH1 Duplicate"
        # items URL encoded, hash raw; file_ext is the doc_type quirk
        assert a["downloadable_items"][0]["download_url"].endswith("02a_01%20new.pdf")
        assert a["version_hash_raw_data"]["download_url"].endswith("02a_01 new.pdf")
        assert a["file_ext"] == "DoDFMR"


# ---------------------------------------------------------------- jcs_pubs


class TestJcs:
    LANDING = (
        '<div class="librarylinkscontainer">'
        '<a href="/Library/CJCS-Instructions/">Instructions</a>'
        '<a href="/Library/Other/">Other</a></div>'
    )
    TABLE = (
        "<table>"
        '<tr><td class="DocNoCol"><a href="/Portals/36/CJCSI 1100.01E.pdf">CJCSI 1100.01E</a></td>'
        '<td class="DocTitle">Assignment FOUO</td><td>2023-01-10</td><td>2024-01-01</td></tr>'
        '<tr><td class="DocNoCol"><a href="/Portals/36/g.pdf">NONUMBER</a></td>'
        '<td class="DocTitle">No digits</td><td>2023-01-10</td><td></td></tr>'
        "</table>"
        '<a class="CommandButton" href="/Library/CJCS-Instructions/?page=2">Next</a>'
    )

    def test_landing_cjcs_only(self):
        links, _ = ex("jcs_pubs").extract("https://www.jcs.mil/Library/", self.LANDING, "landing")
        assert links == ["https://www.jcs.mil/Library/CJCS-Instructions/"]

    def test_table(self):
        links, docs = ex("jcs_pubs").extract(
            "https://www.jcs.mil/Library/CJCS-Instructions/", self.TABLE, "listing"
        )
        assert links == ["https://www.jcs.mil/Library/CJCS-Instructions/?page=2"]
        assert len(docs) == 1  # numberless row dropped by the carve regex
        d = docs[0]
        assert (d["doc_type"], d["doc_num"]) == ("CJCSI", "1100.01E")
        assert d["display_doc_type"] == "Instruction"
        assert d["cac_login_required"] == "true"  # FOUO in title
        assert d["downloadable_items"][0]["download_url"].endswith("CJCSI%201100.01E.pdf")


# ------------------------------------------------------------------- FASAB


class TestFasab:
    BODY = (
        '<ul><li><a href="//files.fasab.gov/pdffiles/handbook_sffas_1.pdf">SFFAS 1</a>'
        "<ul><li>Accounting for Selected Assets &amp; Liabilities</li></ul></li>"
        '<li><a href="https://files.fasab.gov/tr21.pdf">Technical Release 21</a>'
        "<ul><li>Leases Implementation</li></ul></li></ul>"
    )

    def test_derivations(self):
        _, docs = ex("FASAB Crawler").extract("https://fasab.gov/x", self.BODY, "listing")
        a, b = docs
        assert a["doc_name"] == "SFFAS 1"  # no FASAB prefix for SFFAS
        assert a["doc_num"] == "1"
        assert a["doc_type"] == "SFFAS"
        assert a["download_url"] == "https://files.fasab.gov/pdffiles/handbook_sffas_1.pdf"
        # scrub regex drops '&' but keeps '()- '
        assert a["doc_title"] == "Accounting for Selected Assets  Liabilities"
        assert b["doc_name"] == "FASAB Technical Release 21"
        assert b["doc_type"] == "FASAB Technical Release"
        # hash dict: display_org first, URL basename only
        assert list(a["version_hash_raw_data"]) == [
            "display_org", "doc_name", "doc_num", "publication_date",
            "download_url", "display_title",
        ]
        assert a["version_hash_raw_data"]["download_url"] == "handbook_sffas_1.pdf"
        assert a["publication_date"] == ""


# -------------------------------------------------------------------- SORN


class TestSorn:
    def test_stage1_builds_query_url(self):
        body = json.dumps({"child_slugs": ["defense-department", "army-department"]})
        links, docs = ex("SORN").extract("https://www.federalregister.gov/api/v1/agencies/defense-department", body, "api")
        assert docs == []
        assert links == [
            "https://www.federalregister.gov/api/v1/documents.json?per_page=1000"
            "&order=newest&conditions[term]=%22Privacy%20Act%20of%201974%22%20%7C"
            "%20%22System%20of%20Records%22"
            "&conditions[agencies][]=defense-department"
            "&conditions[agencies][]=army-department"
            "&conditions[type][]=NOTICE"
        ]

    def test_stage2_docs_and_pagination(self):
        body = json.dumps({
            "results": [{
                "document_number": "2024-12345",
                "title": "Privacy Act of 1974; System of Records",
                "pdf_url": "https://www.govinfo.gov/content/pkg/FR-2024/pdf/2024-12345.pdf",
                "html_url": "https://www.federalregister.gov/documents/2024/2024-12345",
                "publication_date": "2024-06-03",
            }],
            "next_page_url": "https://www.federalregister.gov/api/v1/documents.json?page=2",
        })
        links, docs = ex("SORN").extract("https://x/documents.json", body, "api")
        assert links == ["https://www.federalregister.gov/api/v1/documents.json?page=2"]
        d = docs[0]
        assert d["doc_name"] == "SORN 2024-12345"
        assert d["display_doc_type"] == "Notice"
        assert d["publication_date"] == "2024-06-03T00:00:00"
        # per-doc source_page_url override: the row's html_url
        assert d["source_page_url"] == "https://www.federalregister.gov/documents/2024/2024-12345"


# ---------------------------------------------------------------- omb_pubs


class TestOmb:
    BODY = (
        "<ul>"
        '<li><a href="/wp-content/uploads/M-24-10.pdf">M-24-10, Advancing Governance</a> (March 28, 2024)</li>'
        '<li><a href="/wp-content/uploads/M-24-10.pdf">M-24-10, Duplicate entry</a> (March 28, 2024)</li>'
        '<li>This memo supersedes <a href="/old.pdf">M-20-01, Old guidance</a> (January 1, 2020)</li>'
        '<li><a href="/no-dashes.pdf">M24, Not enough dashes</a> (May 5, 2024)</li>'
        '<li><a href="/nopdf">M-24-11, No pdf link at all</a></li>'
        "</ul>"
    )

    def test_filters_and_carving(self):
        _, docs = ex("omb_pubs").extract("https://www.whitehouse.gov/omb/", self.BODY, "listing")
        # dup num deduped; supersede skipped; bad dash count skipped; no-pdf skipped
        assert len(docs) == 1
        d = docs[0]
        assert d["doc_name"] == "OMBM M-24-10"
        assert d["doc_num"] == "M-24-10"
        assert d["doc_title"] == "Advancing Governance"  # comma-strip + ascii_clean strip
        assert d["publication_date"] == "2024-03-28T00:00:00"
        assert d["download_url"] == "https://www.whitehouse.gov/wp-content/uploads/M-24-10.pdf"
        assert d["file_ext"] == "OMBM"  # reference quirk: file_ext = doc_type


# ----------------------------------------------------------- maradmin_pubs


class TestMaradmin:
    def row(self, num, title, href, date, status):
        return (
            '<div class="maradmin-row">'
            f'<div class="msg-num msg-col"><a>{num}</a></div>'
            f'<div class="msg-title msg-col"><a href="{href}">{title}</a></div>'
            f'<div class="msg-pub-date msg-col">{date}</div>'
            f'<div class="msg-status msg-col">{status}</div>'
            "</div></div>"
        )

    def test_derivations(self):
        body = (
            self.row("hdr", "header", "#", "", "")  # first row = header, skipped
            + self.row("123/24", "ANNUAL TRAINING GUIDANCE FOR FY25 AND BEYOND WITH MORE WORDS",
                       "https://www.marines.mil/msg/123", "1/5/2024", "Active")
            + self.row("124/24", "CANCELLED MESSAGE", "https://www.marines.mil/msg/124",
                       "1/6/2024", "Cancelled")
            + '<a class="da_next_pager" href="/News/Messages/MARADMINS/?Page=2">next</a>'
        )
        links, docs = ex("maradmin_pubs").extract(
            "https://www.marines.mil/News/Messages/MARADMINS/", body, "listing"
        )
        assert links == ["https://www.marines.mil/News/Messages/MARADMINS/?Page=2"]
        a, b = docs
        # 8-token clamp on 'MARADMIN 123-24 ANNUAL TRAINING GUIDANCE FOR FY25 AND ...'
        assert a["doc_name"] == "MARADMIN 123-24 ANNUAL TRAINING GUIDANCE FOR FY25 AND"
        assert a["doc_num"] == "123/24"
        assert a["is_revoked"] == "false"
        assert b["is_revoked"] == "true"
        assert a["downloadable_items"][0]["doc_type"] == "html"
        assert a["file_ext"] == "MARADMIN"


# -------------------------------------------------------------------- HASC


class TestHasc:
    LISTING = (
        '<div class="evo-views-row"><a href="/hearings/fy25-posture">FY25 Posture</a></div>'
        '<div class="evo-views-row"><a href="/hearings/cyber-review">Cyber Review</a></div>'
    )
    HEARING = (
        '<h1 class="display-4">FY25 Defense Posture</h1>'
        "<time>Wed, 03/20/2024 - 10:00 AM</time>"
        "<b>Dr. Jane Smith</b><b>Gen. John Doe</b>"
        '<p><a href="/files/smith-statement.pdf">Statement of Dr. Jane Smith</a></p>'
        '<p><a href="/files/doe-bio.pdf">Biography of Gen. John Doe</a></p>'
        '<p><a href="/files/doe-statement.pdf">Statement by Gen. John Doe</a></p>'
    )

    def test_listing_links_and_pager(self):
        links, _ = ex("HASC").extract(
            "https://armedservices.house.gov/committee-activity/hearings/all?page=0",
            self.LISTING, "listing",
        )
        assert links == [
            "https://armedservices.house.gov/hearings/fy25-posture",
            "https://armedservices.house.gov/hearings/cyber-review",
            # reference's literal next-page arithmetic on the last char
            "https://armedservices.house.gov/committee-activity/hearings/all?page=1",
        ]

    def test_hearing_docs(self):
        _, docs = ex("HASC").extract(
            "https://armedservices.house.gov/hearings/fy25-posture", self.HEARING, "detail"
        )
        # 'statement' + speaker-name filter: bio link dropped
        assert len(docs) == 2
        a, b = docs
        assert a["doc_name"] == "smithstatement"  # URL carving
        assert a["display_title"] == "HASC FY25 Defense Posture - Dr. Jane Smith"
        assert a["publication_date"] == "2024-03-20T10:00:00"
        # hash dict: standard minus doc_num plus doc_title, in mutation order
        assert list(a["version_hash_raw_data"]) == [
            "doc_name", "publication_date", "download_url", "display_title", "doc_title",
        ]
        assert b["doc_name"] == "doestatement"


# ---------------------------------------------------------- defense_travel


class TestDefenseTravel:
    BODY = (
        '<div class="grid-item">'
        "<button onclick=\"window.open('/Portals/119/Documents/JTR/JTR.PDF')\">Download JTR</button>"
        "</div>"
    )

    def test_single_doc(self):
        _, docs = ex("defense_travel").extract(
            "https://www.travel.dod.mil/Policy-Regulations/Joint-Travel-Regulations/",
            self.BODY, "listing",
        )
        assert len(docs) == 1
        d = docs[0]
        assert d["doc_name"] == "JTR"
        assert d["download_url"] == "https://www.travel.dod.mil/Portals/119/Documents/JTR/JTR.PDF"
        assert d["publication_date"] == "2024-01-01"
        # hash display_title is the TITLE (defense_spider.py:82), not type+num
        assert d["version_hash_raw_data"]["display_title"] == "Joint Travel Regulations"
        assert d["display_title"] == "JTR: Joint Travel Regulations"


# ------------------------------------------------- source defaults config


class TestSourceDefaults:
    def test_all_seed_sources_covered(self):
        from gc_spark.sources.seeds import SEED_LIST
        from gc_spark.sources.source_defaults import DISPLAY_DEFAULTS, source_config_rows

        seed_sources = {s for s, _, _ in SEED_LIST}
        assert seed_sources == set(DISPLAY_DEFAULTS)
        rows = source_config_rows()
        assert len(rows) == 41
        by_src = {r["source"]: r for r in rows}
        assert by_src["DCMA"]["display_source"] == (
            "Defense Contract Management Agency Policy Publications - DCMA Policy"
        )
        assert all(r["start_url"] for r in rows)


# --------------------------------------------------- engine e2e (3 sources)


@pytest.mark.usefixtures("spark")
class TestWave2EngineE2E:
    def test_combined_crawl(self, spark, tmp_path):
        """One engine crawl over the DISA + SORN + maradmin synthetic sites:
        pagination (SORN next_page_url, maradmin da_next_pager), the SORN
        stage-1 constructed query URL, and the per-doc override fields
        (display_title / source_page_url / file_ext / is_revoked) all the
        way into the 22-field feed."""
        from gc_spark.plans.drain import CrawlEngine, EngineConfig
        from gc_spark.sources.fetch import TableFetcher
        from gc_spark.sources.source_defaults import source_config_df
        from gc_spark.sources.tables import SnapshotStore
        from tests.fixtures import wave2_pages, wave2_seeds

        store = SnapshotStore(spark, str(tmp_path / "w2"))
        eng = CrawlEngine(
            spark, store, TableFetcher(wave2_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=8),
        )
        eng.source_config = source_config_df(spark)
        eng.bootstrap(wave2_seeds(spark))
        eng.run(max_batches=10)

        from gc_spark import schema as S
        feed = store.read("feed", S.DOC_ITEMS)
        rows = {r["doc_name"]: r for r in feed.collect()}

        # DISA: set_display_name override ('{doc_name}: {doc_title}')
        disa = rows["DISAI 100-50-3"]
        assert disa["display_title"] == "DISAI 100-50-3: Information Technology"
        assert disa["display_org"] == "Defense Information Systems Agency"
        assert disa["source_title"] == "DISA Policy/Issuances"

        # SORN: per-doc source_page_url override (the row's html_url), and
        # both API pages were reached via the constructed query + pagination
        a = rows["SORN 2024-11111"]
        b = rows["SORN 2024-22222"]
        assert a["source_page_url"] == "https://www.federalregister.gov/documents/2024-11111"
        assert b["source_page_url"] == "https://www.federalregister.gov/documents/2024-22222"
        assert a["display_doc_type"] == "Notice"

        # maradmin: is_revoked + file_ext overrides survive to the feed;
        # page-2 row proves the pager link was followed
        active = rows["MARADMIN 123-24 TRAINING GUIDANCE"]
        dead = rows["MARADMIN 124-24 CANCELLED THING"]
        assert active["is_revoked"] is False
        assert dead["is_revoked"] is True
        assert active["file_ext"] == "MARADMIN"
        assert "MARADMIN 125-24 FY25 POLICY" in rows

        # all three sources' documents landed in seen
        seen_names = {r["doc_name"] for r in store.read("seen", S.SEEN).collect()}
        assert {"DISAI 100-50-3", "DISAC 310-65-1", "SORN 2024-11111",
                "SORN 2024-22222"} <= seen_names


# ------------------------------------------------------------ dla_dedso_pubs


class TestDlaDedso:
    BODY = (
        "<table>"
        '<tr class="dnnGridItem"><td><a href="/Portals/ADC_1414A_Final.pdf">x</a></td>'
        "<td>ADC 1414A: Revise Procedures</td><td>03/15/2023</td></tr>"
        '<tr class="dnnGridAltItem"><td><a href="/Portals/PDC_notice.pdf">x</a></td>'
        "<td>No colon here</td><td>04/01/2023</td></tr>"
        '<tr><td><a href="/Portals/skipme.pdf">x</a></td><td>not a grid row</td><td>05/01/2023</td></tr>'
        "</table>"
    )

    def test_derivations(self):
        from gc_spark.extractors import registry
        _, docs = registry["dla_dedso_pubs"].extract(
            "https://www.dla.mil/Defense-Data-Standards/Resources/ADC/", self.BODY, "listing"
        )
        assert len(docs) == 2  # non-grid row skipped
        a, b = docs
        assert a["doc_name"] == "ADC 1414A Final"  # basename, _ → space
        assert a["doc_num"] == "1414A"  # digit run + letter suffix
        assert a["doc_title"] == "Revise Procedures"  # after-colon
        assert a["publication_date"] == "2023-03-15T00:00:00"
        assert b["doc_title"] == "No colon here"  # split(':')[-1] when none
        # hash display_title holds the TITLE (reference quirk)
        assert a["version_hash_raw_data"]["display_title"] == "Revise Procedures"
        assert a["display_title"] == "ADC 1414A: Revise Procedures"


# ------------------------------------------------------------ National_Guard


class TestCngb:
    BODY = (
        "<table>"
        '<tr><td><a href="/Portals/27/CNGBI 1000.01A.pdf">CNGBI\xa01000.01A</a></td>'
        "<td><span>3/14/2019</span></td><td><a>Org Manual</a></td></tr>"
        '<tr><td><a href="https://intelshare.mil/doc.pdf">CNGBI 2000.01</a></td>'
        "<td><span>1/1/2020</span></td><td><span>Gated Doc</span></td></tr>"
        "</table>"
    )

    def test_derivations(self):
        from gc_spark.extractors import registry
        _, docs = registry["National_Guard"].extract(
            "https://www.ngbpmc.ng.mil/Publications/CNGB-Instructions/", self.BODY, "listing"
        )
        a, b = docs
        assert a["doc_name"] == "CNGBI 1000.01A"  # \xa0 → space
        assert a["doc_num"] == "1000.01A"
        assert a["cac_login_required"] == "false"  # '/'-leading href
        assert b["cac_login_required"] == "true"  # off-site href
        assert a["publication_date"] == "3/14/2019"  # RAW, no get_pub_date
        assert a["download_url"].endswith("CNGBI%201000.01A.pdf")
        assert list(a["version_hash_raw_data"]) == [
            "item_currency", "document_title", "document_number",
        ]
        assert a["version_hash_raw_data"]["item_currency"] == "/Portals/27/CNGBI 1000.01A.pdf"


# ---------------------------------------------------------------------- CNSS


class TestCnss:
    def item(self, name, desc, date, href):
        return (
            f'<tr><td>i</td><td><a href="{href}">dl</a>'
            f'<p class="documentTitle"><span itemprop="name">{name}</span>'
            f'<span itemprop="description">{desc}</span></p>'
            f'<p class="documentInfo"><span itemprop="dateCreated">{date}</span></p>'
            "</td></tr>"
        )

    def test_landing_links(self):
        from gc_spark.extractors import registry
        links, docs = registry["CNSS"].extract(
            "https://www.cnss.gov/CNSS/index.cfm", "<html></html>", "landing"
        )
        assert len(links) == 9 and docs == []
        assert links[0].endswith("Policies.cfm")

    def test_split_dispatch(self):
        from gc_spark.extractors import registry
        body = "<table>" + self.item(
            "CNSSP 22", "IA Risk Management Policy", "2016-01-04", "/libraries/f?id=1"
        ) + "</table>"
        _, docs = registry["CNSS"].extract(
            "https://www.cnss.gov/CNSS/issuances/Policies.cfm", body, "listing"
        )
        d = docs[0]
        assert (d["doc_type"], d["doc_num"], d["display_doc_type"]) == ("CNSSP", "22", "Policy")
        assert d["doc_name"] == "CNSSP 22"
        assert d["download_url"] == "https://www.cnss.gov/libraries/f?id=1"
        assert d["file_ext"] == "CNSSP"  # file_ext = doc_type quirk
        assert list(d["version_hash_raw_data"]) == [
            "doc_title", "doc_num", "publication_date", "display_title",
        ]

    def test_split_functions(self):
        from gc_spark.extractors.issuance_libraries import (
            _cnss_report, _directive, _instruction, _tsg_std,
        )
        assert _instruction("CNSSI 4009") == ("CNSSI", "4009", "Instruction")
        assert _instruction("CNSS-041-15") == ("CNSSAM", "041-15", "Memo")
        assert _directive("901") == ("CNSSD", "Template 901", "Directive")
        assert _tsg_std("TSG STANDARD 2") == ("TSG STANDARD", "2", "Standard")
        assert _cnss_report("CNSS Report: Spectrum Study") == (
            "CNSS Report", "Spectrum Study", "Report")


# -------------------------------------------------------- milpersman_crawler


class TestMilpersman:
    ROOT = (
        '<li title="MILPERSMAN"><ul>'
        '<a href="/References/MILPERSMAN/1000/">1000 Military Personnel</a>'
        '<a href="/References/MILPERSMAN/About/">About</a>'
        "</ul></li>"
    )
    SUBNAV = (
        '<ul class="afAccordionMenuSubMenu">'
        '<a href="/References/MILPERSMAN/1000/1000-010/">1000-010</a></ul>'
    )
    LEAF = (
        '<div class="livehtml"><table>'
        '<tr><td><a href="/docs/1070-290 main.pdf">1070-290</a></td><td>Record Docs</td></tr>'
        '<tr><td></td><td><a href="/docs/1070-290supp.pdf">Supplement</a></td></tr>'
        '<tr><td>no-link-row</td><td>skipped</td></tr>'
        "</table></div>"
    )

    def test_nav_levels(self):
        from gc_spark.extractors import registry
        links, _ = registry["milpersman_crawler"].extract(
            "https://www.mynavyhr.navy.mil/References/MILPERSMAN/", self.ROOT, "listing"
        )
        # digit-leading anchors only
        assert links == ["https://www.mynavyhr.navy.mil/References/MILPERSMAN/1000/"]
        links, _ = registry["milpersman_crawler"].extract(
            "https://www.mynavyhr.navy.mil/References/MILPERSMAN/1000/", self.SUBNAV, "listing"
        )
        assert links == ["https://www.mynavyhr.navy.mil/References/MILPERSMAN/1000/1000-010/"]

    def test_leaf_rows_and_supplement(self):
        from gc_spark.extractors import registry
        _, docs = registry["milpersman_crawler"].extract(
            "https://www.mynavyhr.navy.mil/References/MILPERSMAN/1000/1000-010/",
            self.LEAF, "listing",
        )
        assert len(docs) == 1  # supplement row has no td1 anchor; third row skipped
        d = docs[0]
        assert d["doc_name"] == "MILPERSMAN 1070-290"
        # supplement quirk: next row's link appended as 2nd downloadable item
        assert [i["download_url"].split("/")[-1] for i in d["downloadable_items"]] == [
            "1070-290%20main.pdf", "1070-290supp.pdf",
        ]
        # five-field hash, no publication_date
        assert list(d["version_hash_raw_data"]) == [
            "doc_name", "doc_num", "download_url", "display_title", "doc_type",
        ]
        assert d["file_ext"] == "MILPERSMAN"


# -------------------------------------------------------------------- tradoc


class TestTradoc:
    LANDING = '<div id="content"><p><a href="regulations.html">TRADOC Regulations</a></p></div>'
    PAGE = (
        "<h2>TRADOC Regulations (TRs)</h2>"
        "<table>"
        # one row, two docs: base + a bare 'Change 1' entry (num comes from
        # the row's first entry via the base_doc_num fallback)
        '<tr><td>350-70<br/>Change 1</td>'
        "<td>05 Mar 2021<br/>Jul 2023</td>"
        '<td>Army Training Development'
        '<span class="fileLink"><a href="docs/tr350-70.pdf">pdf</a></span>'
        '<span class="fileLink"><a href="docs/tr350-70c1.docx">docx</a>'
        '<a href="docs/tr350-70c1.pdf">pdf</a></span></td></tr>'
        # CAC row skipped
        '<tr><td>1-11</td><td>Jan 2020</td>'
        '<td>Gated<span class="fileLink"><span class="CACrequired">CAC</span></span></td></tr>'
        "</table>"
    )

    def test_landing(self):
        from gc_spark.extractors import registry
        links, _ = registry["tradoc"].extract(
            "https://adminpubs.tradoc.army.mil/index.html", self.LANDING, "landing"
        )
        assert links == ["https://adminpubs.tradoc.army.mil/regulations.html"]

    def test_rows(self):
        from gc_spark.extractors import registry
        _, docs = registry["tradoc"].extract(
            "https://adminpubs.tradoc.army.mil/regulations.html", self.PAGE, "listing"
        )
        assert len(docs) == 2  # CAC row skipped
        base, change = docs
        assert base["doc_num"] == "TR350-70"  # category code prefix
        assert base["publication_date"] == "2021-03-05"
        # change doc: number from the row's FIRST entry + C suffix
        assert change["doc_num"] == "TR350-70C1"
        assert change["doc_title"] == "Army Training Development with Change 1"
        assert change["publication_date"] == "2023-07-01"  # '%b %Y' cascade
        # pdf forced first even though docx listed before it
        assert [i["doc_type"] for i in change["downloadable_items"]] == ["pdf", "docx"]
        assert list(base["version_hash_raw_data"])[0] == "download_url"


# --------------------------------------------------------------- secnav_pubs


class TestSecnav:
    def test_board_json(self):
        import json as _json
        from gc_spark.extractors import registry
        blob = {
            "Row": [
                {"Echelon": "SECNAV", "FileLeafRef": "5215.1E.pdf",
                 "FileRef": "/doni/Directives/5215.1E.pdf", "Subject": "DON Directives Policy",
                 "Status": "Active", "Sponsor": "DNS&amp;X", "Cancelled_x0020_Date": "",
                 "File_x0020_Type": "pdf", "Effective_x0020_Date": "2016-03-01"},
                {"Echelon": "OPNAV", "FileLeafRef": "C3120.pdf",
                 "FileRef": "/doni/Directives/C3120.pdf", "Subject": "Classified Org Manual",
                 "Status": "Cancelled", "Sponsor": "", "Cancelled_x0020_Date": "2020-01-01",
                 "File_x0020_Type": "pdf", "Effective_x0020_Date": "2010-05-05"},
            ],
            "NextHref": "?Paged=TRUE&p_ID=30",
        }
        body = f"<script>var WPQ3ListData = {_json.dumps(blob)};</script>"
        links, docs = registry["secnav_pubs"].extract(
            "https://www.secnav.navy.mil/doni/allinstructions.aspx", body, "listing"
        )
        assert links == ["https://www.secnav.navy.mil/doni/allinstructions.aspx?Paged=TRUE&p_ID=30"]
        a, b = docs
        assert a["doc_type"] == "SECNAVINST"  # Echelon + URL type suffix
        assert a["doc_name"] == "SECNAVINST 5215.1E"
        assert a["display_doc_type"] == "Instruction"
        assert a["cac_login_required"] == "false"
        assert a["is_revoked"] == "false"
        assert a["version_hash_raw_data"]["sponsor"] == "DNS&X"  # &amp; fix
        assert a["source_page_url"] == "https://www.secnav.navy.mil/doni/default.aspx"
        # letter-leading number → CAC; Cancelled → revoked
        assert b["cac_login_required"] == "true"
        assert b["is_revoked"] == "true"
        assert set(a["version_hash_raw_data"]) == {
            "doc_name", "doc_num", "publication_date", "download_url",
            "status", "sponsor", "cancel_date", "display_title",
        }

    def test_landing(self):
        from gc_spark.extractors import registry
        links, _ = registry["secnav_pubs"].extract(
            "https://www.secnav.navy.mil/doni/default.aspx", "<html/>", "landing"
        )
        assert len(links) == 2


# --------------------------------------------------------------- samm_policy


class TestSamm:
    CHAPTERS = (
        '<a href="/chapter/chapter-1" title="Security Cooperation Overview/ Intro" rel="x">C1</a>'
        '<a href="/other/thing" title="nope">X</a>'
    )
    MEMOS = (
        "<table>"
        '<tr><td><time datetime="2023-05-04T12:00:00Z">May 4</time></td>'
        '<td><a href="/policy-memoranda/2023-05-04">DSCA 23-35 (Rev 1.)</a></td>'
        "<td>x</td><td>x</td><td>Amends the SAMM</td><td>Active</td></tr>"
        "</table>"
    )
    MEMO_PAGE = '<div class="PM_PDF_ink x"><span><a href="/sites/default/memo.pdf">PDF</a></span></div>'

    def test_chapters_as_html_docs(self):
        from gc_spark.extractors import registry
        _, docs = registry["samm_policy"].extract(
            "https://samm.dsca.mil/listing/chapters", self.CHAPTERS, "listing"
        )
        assert len(docs) == 1  # non-/chapter/ anchor ignored
        d = docs[0]
        assert d["doc_name"] == "SAMM_C1"
        assert d["doc_title"] == "Security Cooperation Overview Intro"  # slash cleanup
        assert d["downloadable_items"][0]["doc_type"] == "html"
        assert d["publication_date"] == "N/A"
        assert d["version_hash_raw_data"]["status"] == "N/A"

    def test_memo_listing_parks_pending(self):
        from gc_spark.extractors import registry
        links, docs = registry["samm_policy"].extract(
            "https://samm.dsca.mil/policy-memoranda/PolicyMemoList-All", self.MEMOS, "listing"
        )
        d = docs[0]
        # name scrub: spaces→_, parens/commas dropped, trailing specials dropped
        assert d["doc_name"] == "DSCA_23-35_Rev_1"
        assert d["doc_num"] == "23-35"
        assert d["publication_date"] == "2023-05-04T00:00:00"
        assert d["detail_url"] == "https://samm.dsca.mil/policy-memoranda/2023-05-04"
        assert links == [d["detail_url"]]
        assert "download_url" not in d["version_hash_raw_data"]

    def test_memo_page_detail_record(self):
        from gc_spark.extractors import registry
        _, recs = registry["samm_policy"].extract(
            "https://samm.dsca.mil/policy-memoranda/2023-05-04", self.MEMO_PAGE, "detail"
        )
        assert recs == [{"detail_download_href": "https://samm.dsca.mil/sites/default/memo.pdf"}]


# ------------------------------------------------- navy_personnel_messages


class TestNavyMessages:
    LANDING = '<div class="afMenuLinkHeader">\n<a href="/References/Messages/NAVADMIN-2024/">NAVADMINS 2024</a></div>'
    BOARD = (
        "<div><strong>NAVADMIN 2024</strong></div>"
        "<table>"
        "<tr><td>Number</td><td>Subject</td><td>Date</td></tr>"
        '<tr><td>001/23</td><td><a href="/bupers-npc/dead.txt">x</a>'
        '<a href="/msgs/NAV24001.txt">ADVANCEMENT CYCLE</a></td><td>1/3/2024</td></tr>'
        '<tr><td>002/24</td><td><a href="/msgs/NAV24002.txt">CANCELLED POLICY NOTICE</a></td>'
        "<td>8/16/201</td></tr>"
        "</table>"
    )

    def test_landing(self):
        from gc_spark.extractors import registry
        links, _ = registry["navy_personnel_messages"].extract(
            "https://www.mynavyhr.navy.mil/References/Messages/", self.LANDING, "landing"
        )
        assert links == ["https://www.mynavyhr.navy.mil/References/Messages/NAVADMIN-2024/"]

    def test_board_rows(self):
        from gc_spark.extractors import registry
        _, docs = registry["navy_personnel_messages"].extract(
            "https://www.mynavyhr.navy.mil/References/Messages/NAVADMIN-2024/",
            self.BOARD, "listing",
        )
        a, b = docs
        # typo'd year replaced from the page heading: 001/23 → 001/24
        assert a["doc_num"] == "001/24"
        assert a["doc_name"] == "NAVADMIN 001_24"  # clean_name: / → _
        # bupers link skipped in favor of the real one
        assert a["download_url"] == "https://www.mynavyhr.navy.mil/msgs/NAV24001.txt"
        # hash download_url is the basename
        assert a["version_hash_raw_data"]["download_url"] == "NAV24001.txt"
        assert a["publication_date"] == "2024-01-03T00:00:00"
        # the literal '8/16/201' typo pin; 'cancelled' title → revoked
        assert b["publication_date"] == "2021-08-16T00:00:00"
        assert b["is_revoked"] == "true"
        assert a["downloadable_items"][0]["doc_type"] == "txt"


# ----------------------------------------------------------------- army_pubs


class TestArmyPubs:
    NAV = (
        '<li class="usa-nav__primary-item"><a href="/Home/">Home</a></li>'
        '<li class="usa-nav__primary-item"><a href="/About/">About</a></li>'
        '<li class="usa-nav__primary-item">'
        '<a href="/ProductMaps/PubForm/AR.aspx">AR</a>'
        '<a href="/ProductMaps/PubForm/PB.aspx">PB</a>'
        '<a href="/ProductMaps/PubForm/EM.aspx">EM</a></li>'
    )
    CATEGORY = '<table><tr><td><a href="Details.aspx?PUB_ID=1234">AR 25-30</a></td></tr></table>'
    DETAIL = (
        "<table>"
        "<tr><th>Pub/Form Number</th><td>AR 25-30</td></tr>"
        "<tr><th>Pub/Form Title</th><td>ARMY PUBLISHING PROGRAM</td></tr>"
        "<tr><th>Pub/Form Date</th><td>06/14/2021</td></tr>"
        "<tr><th>Pub/Form Proponent</th><td>AASA</td></tr>"
        '<tr><th>Unit Of Issue(s)</th><td><a href="/epubs/DR_a/ARN30176-AR_25-30 final.pdf">PDF</a></td></tr>'
        "</table>"
    )

    def test_nav_stoplist(self):
        from gc_spark.extractors import registry
        links, _ = registry["army_pubs"].extract(
            "https://armypubs.army.mil/", self.NAV, "landing"
        )
        # PB.aspx is in the do_not_process stoplist; only 3rd nav item read
        assert links == [
            "https://armypubs.army.mil/ProductMaps/PubForm/AR.aspx",
            "https://armypubs.army.mil/ProductMaps/PubForm/EM.aspx",
        ]

    def test_category_links(self):
        from gc_spark.extractors import registry
        links, _ = registry["army_pubs"].extract(
            "https://armypubs.army.mil/ProductMaps/PubForm/AR.aspx", self.CATEGORY, "listing"
        )
        assert links == [
            "https://armypubs.army.mil/ProductMaps/PubForm/Details.aspx?PUB_ID=1234"
        ]

    def test_detail_fields(self):
        from gc_spark.extractors import registry
        _, docs = registry["army_pubs"].extract(
            "https://armypubs.army.mil/ProductMaps/PubForm/Details.aspx?PUB_ID=1234",
            self.DETAIL, "detail",
        )
        d = docs[0]
        assert (d["doc_name"], d["doc_type"], d["doc_num"]) == ("AR 25-30", "AR", "25-30")
        assert d["publication_date"] == "2021-06-14T00:00:00"
        assert d["downloadable_items"][0]["download_url"].endswith("AR_25-30%20final.pdf")
        assert d["downloadable_items"][0]["doc_type"] == "pdf"
        assert d["cac_login_required"] == "false"

    def test_gated_category_cac(self):
        from gc_spark.extractors import registry
        _, docs = registry["army_pubs"].extract(
            "https://armypubs.army.mil/ProductMaps/PubForm/EM_details.aspx?id=9",
            self.DETAIL, "detail",
        )
        assert docs[0]["cac_login_required"] == "true"

    def test_linkless_unit_of_issue(self):
        from gc_spark.extractors import registry
        detail = self.DETAIL.replace(
            '<a href="/epubs/DR_a/ARN30176-AR_25-30 final.pdf">PDF</a>', "EBOOK"
        )
        _, docs = registry["army_pubs"].extract(
            "https://armypubs.army.mil/ProductMaps/PubForm/Details.aspx?PUB_ID=1",
            detail, "detail",
        )
        item = docs[0]["downloadable_items"][0]
        assert item == {"doc_type": "ebook", "download_url": "https://armypubs.army.mil",
                        "compression_type": None}


# -------------------------------------------------------------- army_g1_pubs


class TestArmyG1:
    PAGE = (
        '<div class="inner-container"><h4>DA PAM 600-25 Guides</h4>'
        '<div class="accordion-container">'
        '<div class="accordion"><label for="t1">NCO Guide</label>'
        '<div class="rich-text-element bodytext">'
        '<a href="https://api.army.mil/e2/c/downloads/2024/05/01/abc.pdf">'
        "DA PAM 600-25 NCO Guide</a>"
        '<a href="https://api.army.mil/e2/c/downloads/intro.html">Intro page</a>'
        "</div></div>"
        "</div></div></div></div>"
    )

    def test_derivations(self):
        from gc_spark.extractors import registry
        _, docs = registry["army_g1_pubs"].extract(
            "https://www.army.mil/g-1#org-g-1-publications", self.PAGE, "listing"
        )
        assert len(docs) == 1  # .html link skipped
        d = docs[0]
        assert d["doc_name"] == "abc"  # URL basename
        assert d["doc_num"] == "600-25"  # from the section h4
        assert d["doc_title"] == "NCO Guide"  # 'DA PAM d-d' stripped from text
        assert d["publication_date"] == "2024-05-01T00:00:00"  # from URL path
        # hash display_title overwritten with doc_title (backwards compat)
        assert d["version_hash_raw_data"]["display_title"] == "NCO Guide"
        assert d["display_title"] == "DA PAM 600-25: NCO Guide"


# ------------------------------------------------------------ Bupers_Crawler


class TestBupers:
    def row(self, num_html, title, date_html, links_html):
        return f"<tr><td>{links_html}{num_html}</td><td><span>{title}</span></td><td>{date_html}</td></tr>"

    def test_derivations(self):
        from gc_spark.extractors import registry
        body = "<table>" + "".join([
            self.row("<a>hdr</a>", "x", "<span>d</span>", '<a href="#1"></a>'),
            self.row("<a>hdr</a>", "x", "<span>d</span>", '<a href="#2"></a>'),
            self.row("<a>hdr</a>", "x", "<span>d</span>", '<a href="#3"></a>'),
            # suffix merge: ['1001.5', 'B'] → '1001.5B'
            self.row("<a><strong>1001.5</strong></a><span>B</span>",
                     "Officer Promotions", "<span>0</span><span>5/9/2019</span>",
                     '<a href="/Portals/o/b 1001.pdf"></a>'),
            # CH-1 preference on duplicate nums + old-name normalization
            self.row("<a>12600.4</a><span>12600.4 CH-1</span>",
                     "Shore Activities", "<span>1/2/2020</span>",
                     '<a href="/Portals/x/12600.pdf"></a>'),
        ]) + "</table>"
        _, docs = registry["Bupers_Crawler"].extract(
            "https://www.mynavyhr.navy.mil/References/BUPERS-Instructions/", body, "listing"
        )
        assert len(docs) == 2  # first three rows are pseudo-headers
        a, b = docs
        assert a["doc_num"] == "1001.5B"
        assert a["publication_date"] == "2019-05-09T00:00:00"  # latest, '0' dropped
        assert a["download_url"] == "https://www.mynavyhr.navy.mil/Portals/o/b%201001.pdf"
        assert b["doc_num"] == "12600.4 CH-1"
        # match_old_doc_name: 'BUPERSINST 12600.4 CH-1' → 'BUPERSINST 12600.4CH1'
        assert b["doc_name"] == "BUPERSINST 12600.4CH1"
        assert list(a["version_hash_raw_data"])[0] == "download_url"


# ---------------------------------------------------------------- ic_policies


class TestIcPolicies:
    PAGE = (
        '<div itemprop="articleBody">'
        '<p><a href="/files/ICD/ICD-101 (28-1-2017).pdf">ICD 101.01.02.03 Intelligence Community Policy System</a></p>'
        "<p>no link here</p>"
        '<p><a href="/files/legal/ref (2020).pdf">IC Legal Reference Book 2020</a></p>'
        "</div>"
    )

    def test_policy_and_legal_fallback(self):
        from gc_spark.extractors import registry
        _, docs = registry["ic_policies"].extract(
            "https://www.dni.gov/index.php/what-we-do/ic-related-menus/ic-related-links/"
            "intelligence-community-directives", self.PAGE, "listing",
        )
        a, b = docs
        assert a["doc_type"] == "ICD"  # from URL suffix
        assert a["display_doc_type"] == "Directive"
        assert (a["doc_name"], a["doc_num"]) == ("ICD 101.01.02.03", "101.01.02.03")
        assert a["doc_title"] == "Intelligence Community Policy System"
        assert a["publication_date"] == "2017-01-28T00:00:00"  # (...) in URL
        # legal fallback: name = all-but-last token, num = last
        assert (b["doc_name"], b["doc_num"]) == ("IC Legal Reference Book", "2020")
        assert b["doc_title"] == b["doc_name"]


# -------------------------------------------------------------- navy_med_pubs


class TestNavyMed:
    NOTE_BODY = (
        "<table>"
        '<tr><td>i</td><td><a href="/directives/n1.pdf">NOTE 6000</a></td>'
        "<td>Note One</td><td>2024-01-01</td></tr>"
        '<tr><td>i</td><td><a href="/directives/n2.pdf">NOTE 6000</a></td>'
        "<td>Note Two</td><td>2024-02-01</td></tr>"
        '<tr><td>i</td><td><a href="/directives/n3.pdf">NOTE 6000</a></td>'
        "<td>Note Two</td><td>2024-03-01</td></tr>"
        "</table>"
    )
    NAVMED_BODY = (
        "<table>"
        '<tr><td>Pub Title</td><td>2024-05-01</td><td><a href="/p/5055.pdf">5055.pdf</a></td></tr>'
        '<tr><td>Manual Ch</td><td>2024-06-01</td><td><a href="/p/m126.pdf">MANMED CHANGE 126</a></td></tr>'
        '<tr><td>Manual Ch2</td><td>2024-06-02</td><td><a href="/p/m126b.pdf">MANMED CHANGE 126</a></td></tr>'
        "</table>"
    )

    def test_tabs_from_landing(self):
        links, _ = ex("navy_med_pubs").extract(
            "https://www.med.navy.mil/Directives/", "<html/>", "landing")
        assert len(links) == 3 and all("#" in u for u in links)

    def test_bumednote_dedup(self):
        _, docs = ex("navy_med_pubs").extract(
            "https://www.med.navy.mil/Directives/#bumednote", self.NOTE_BODY, "listing")
        # NOTE strip, dup num → title appended (third row differs by title)
        assert [d["doc_num"] for d in docs] == ["6000", "6000 Note Two", "6000 Note Two-REVISION"]
        assert docs[0]["doc_type"] == "BUMEDNOTE"

    def test_navmed_swaps_and_p117(self):
        _, docs = ex("navy_med_pubs").extract(
            "https://www.med.navy.mil/Directives/#navmed", self.NAVMED_BODY, "listing")
        a, b, c = docs
        # digit-led num gets P- prefix; title/date columns swapped
        assert a["doc_name"] == "NAVMED P-5055"
        assert a["doc_title"] == "Pub Title"  # NAVMED tab swaps title/date cells
        assert a["publication_date"] == "2024-05-01T00:00:00"
        # non-digit num attaches to P-117; stateful 126 → 126-1 on 2nd hit
        assert b["doc_name"] == "NAVMED P-117 MANMED CHANGE 126"
        assert c["doc_name"] == "NAVMED P-117 MANMED CHANGE 126-1"

    def test_star_means_cac(self):
        body = ('<table><tr><td>i</td><td><a href="/p/x.pdf">6010.13</a></td>'
                "<td>Gated Doc*</td><td>2024-01-01</td></tr></table>")
        _, docs = ex("navy_med_pubs").extract(
            "https://www.med.navy.mil/Directives/#bumedinst", body, "listing")
        d = docs[0]
        assert d["cac_login_required"] == "true"
        assert d["doc_title"] == "Gated Doc"
        assert not d["doc_name"].endswith("*")


# -------------------------------------------------------------- navy_reserves


class TestNavyReserves:
    BODY = (
        "<table>"
        '<tr class="x"><td>5400.1</td><td>Org Manual (2)</td>'
        '<td><a href="/Portals/nr 5400.pdf">dl</a></td></tr>'
        '<tr class="x"><td>0524</td><td>Notice Doc</td><td><a href="/Portals/n.pdf">dl</a></td></tr>'
        '<tr class="x"><td>nodigits</td><td>skip</td><td><a href="/x.pdf">dl</a></td></tr>'
        "</table>"
    )

    def test_type_suffix_and_name_suffix(self):
        _, docs = ex("navy_reserves").extract(
            "https://www.navyreserve.navy.mil/Resources/Instructions/", self.BODY, "listing")
        a, b = docs
        assert a["doc_type"] == "COMNAVRESFORCOMINST"  # '.' in num → INST
        assert b["doc_type"] == "COMNAVRESFORCOMNOTE"  # no '.' → NOTE
        assert a["doc_name"] == "COMNAVRESFORCOMINST 5400.1_2"  # '(2)' suffix
        # hash quirks: download_url = RAW href, doc_name key = TITLE
        assert a["version_hash_raw_data"]["download_url"] == "/Portals/nr 5400.pdf"
        assert a["version_hash_raw_data"]["doc_name"] == a["doc_title"]
        assert a["publication_date"] == "N/A"


# ---------------------------------------------------------------- Army_Reserve


class TestArmyReserve:
    BODY = (
        "<p><strong>USAR Reg 27-2</strong> <a href=\"/Portals/98/reg 27-2.pdf\">"
        "Legal Office Operations</a></p>"
        '<p><strong>FY20 Policy Update</strong> <a href="https://usar.dod.afpims.mil/x.pdf"><span></span></a></p>'
    )

    def test_derivations(self):
        _, docs = ex("Army_Reserve").extract(
            "https://www.usar.army.mil/Publications/", self.BODY, "listing")
        a, b = docs
        assert (a["doc_type"], a["doc_num"]) == ("USAR Reg", "27-2")
        assert a["display_doc_type"] == "Regulation"
        assert a["download_url"].endswith("reg%2027-2.pdf")
        # hash: URL basename, no date
        assert a["version_hash_raw_data"]["download_url"] == "reg%2027-2.pdf"
        assert "publication_date" not in a["version_hash_raw_data"]
        # no-title item falls back to the bold name; afpims URL → CAC
        assert b["doc_title"] == "FY20 Policy Update"
        assert b["cac_login_required"] == "true"
        assert (b["doc_type"], b["doc_num"]) == ("USAR Doc", "")


# ----------------------------------------------------------------- Coast_Guard


class TestCoastGuard:
    BODY = (
        "<table>"
        '<tr><td>CIM_5215_6F</td><td><a href="/Portals/10/CIM 5215 6F.pdf">Directives Manual</a></td>'
        "<td>CG-61</td><td>x</td><td>24 May 2019</td></tr>"
        '<tr><td>COMDTINST M5000.3</td><td><a href="/Portals/10/m5000.pdf">Org Manual</a></td>'
        "<td>CG-1</td><td>x</td><td>bad date</td></tr>"
        "</table>"
    )

    def test_derivations(self):
        links, _ = ex("Coast_Guard").extract("https://x/About-CG-Directives-System/", "", "landing")
        assert len(links) == 5
        _, docs = ex("Coast_Guard").extract("https://x/Commandant-Instruction-Manuals/", self.BODY, "listing")
        a, b = docs
        assert (a["doc_type"], a["doc_num"]) == ("CIM", "5215.6F")  # _ → .
        assert a["display_doc_type"] == "Manual"
        assert a["publication_date"] == "2019-05-24T00:00:00"
        assert a["download_url"].endswith("CIM%205215%206F.pdf")
        assert a["version_hash_raw_data"]["download_url"] == a["download_url"]
        # COMDTINST normalization + '' date on failure
        assert b["doc_type"] == "CI"
        assert b["publication_date"] == ""


# ----------------------------------------------------- code_of_federal_regulations


class TestCfr:
    def test_walk_and_detail(self):
        import json as _json
        links, _ = ex("code_of_federal_regulations").extract(
            "https://www.govinfo.gov/wssearch/rb/cfr?fetchChildrenOnly=0", "{}", "api")
        assert len(links) == 3 and "2000" in links[0]
        browse = _json.dumps({"childNodes": [
            {"nodeValue": {"packageid": "CFR-2021-title32-vol1"}},
        ]})
        links, _ = ex("code_of_federal_regulations").extract(links[1], browse, "api")
        assert links == [
            "https://www.govinfo.gov/wssearch/getContentDetail?packageId=CFR-2021-title32-vol1"
        ]
        detail = _json.dumps({
            "documentincontext": {"packageId": "CFR-2021-title32-vol1"},
            "download": {"pdflink": "//www.govinfo.gov/content/pkg/CFR-2021-title32-vol1.pdf"},
            "title": "Code of Federal Regulations Title 32 - National Defense",
            "metadata": {"columnnamevalueset": [
                {"colname": "Publication Title", "colvalue": "Title 32"},
                {"colname": "Date", "colvalue": "2021-07-01"},
            ]},
        })
        _, docs = ex("code_of_federal_regulations").extract(links[0], detail, "api")
        d = docs[0]
        assert d["doc_name"] == "Title 32 2021"  # year appended
        assert d["doc_num"] == "32"
        assert d["doc_title"] == "Regulations Title 32 - National Defense"  # title minus first 3 words
        assert d["download_url"].startswith("https://www.govinfo.gov/")
        assert d["source_page_url"].endswith("/app/details/CFR-2021-title32-vol1")


# ------------------------------------------------------------- legislation_pubs


class TestLegislation:
    def test_congress_filter_and_details(self):
        import json as _json
        root = _json.dumps({"childNodes": [
            {"nodeValue": {"value": "116"}}, {"nodeValue": {"value": "117"}},
        ]})
        links, _ = ex("legislation_pubs").extract(
            "https://www.govinfo.gov/wssearch/rb/bills?fetchChildrenOnly=0", root, "api")
        assert len(links) == 1 and "/bills/117?" in links[0]  # 116 filtered for bills
        links, _ = ex("legislation_pubs").extract(
            "https://www.govinfo.gov/wssearch/rb/plaw?fetchChildrenOnly=0", root, "api")
        assert len(links) == 2  # plaw keeps all congresses

        law = _json.dumps({
            "documentincontext": {"packageId": "PLAW-117publ81"},
            "download": {"pdflink": "//www.govinfo.gov/content/pkg/PLAW-117publ81.pdf"},
            "title": "Public Law 117 - 81 - National Defense Authorization Act",
            "metadata": {"columnnamevalueset": [
                {"colname": "Law Number", "colvalue": "Public Law 117-81"},
                {"colname": "Date Approved", "colvalue": "2021-12-27"},
            ]},
        })
        _, docs = ex("legislation_pubs").extract(
            "https://www.govinfo.gov/wssearch/getContentDetail?packageId=PLAW-117publ81",
            law, "api")
        d = docs[0]
        assert d["doc_name"] == "Public Law 117-81"
        assert d["doc_num"] == "117-81"
        assert d["doc_type"] == "Public Law"
        assert d["doc_title"] == "National Defense Authorization Act"  # minus 6 words

        bill = _json.dumps({
            "documentincontext": {"packageId": "BILLS-117hr7776enr"},
            "download": {"pdflink": "//x/BILLS-117hr7776enr.pdf"},
            "title": "x",
            "metadata": {"columnnamevalueset": [
                {"colname": "Bill Version", "colvalue": "Enrolled Bill (ENR)"},
                {"colname": "Bill Number", "colvalue": "H.R. 7776"},
                {"colname": "Congress Number", "colvalue": "117th Congress"},
                {"colname": "Full Title", "colvalue": "An Act"},
                {"colname": "Last Action Date Listed", "colvalue": "2022-12-23"},
            ]},
        })
        _, docs = ex("legislation_pubs").extract(
            "https://www.govinfo.gov/wssearch/getContentDetail?packageId=BILLS-117hr7776enr",
            bill, "api")
        d = docs[0]
        assert d["doc_name"] == "H.R. 7776 ENR 117th"
        # the literal NDAA title pin
        assert d["doc_title"] == "National Defense Authorization Act (NDAA) for Fiscal Year 2023"

    def test_package_offset_pagination(self):
        import json as _json
        page = _json.dumps({"childNodes": [{"nodeValue": {"packageid": "P1"}}]})
        url = "https://www.govinfo.gov/wssearch/rb//plaw/117?fetchChildrenOnly=1&offset=0&pageSize=100"
        links, _ = ex("legislation_pubs").extract(url, page, "api")
        assert links[-1].endswith("offset=1&pageSize=100")


# ------------------------------------------------------------------- dfars_pgi


class TestDfars:
    LANDING = (
        '<select class="tocselect"><option>Current Version (05/30/2024)</option></select>'
        '<iframe title="DFARS Table" src="toc.html"></iframe>'
    )
    TABLE = (
        '<select class="tocselect"><option>Current Version (05/30/2024)</option></select>'
        "<table>"
        '<tr class="rule"><td>PART 204 - ADMINISTRATIVE MATTERS</td></tr>'
        '<tr class=""><td><span>SUBPART 204.1</span> - Contract Execution</td>'
        '<td>x</td><td><a href="dfars/204_1.pdf">pdf</a></td><td>x</td><td>x</td>'
        '<td><a href="pgi/204_1.pdf">pdf</a></td></tr>'
        '<tr class=""><td><span>TABLE OF CONTENTS</span></td>'
        '<td>x</td><td><a href="dfars/toc204.pdf">pdf</a></td><td>x</td><td>x</td><td></td></tr>'
        "</table>"
    )

    def test_landing_iframe(self):
        links, _ = ex("dfars_pgi").extract(
            "https://www.acq.osd.mil/dpap/dars/dfarspgi/current", self.LANDING, "landing")
        assert links == ["https://www.acq.osd.mil/dpap/dars/dfarspgi/toc.html"]

    def test_stateful_rows_and_pgi(self):
        _, docs = ex("dfars_pgi").extract(
            "https://www.acq.osd.mil/dpap/dars/dfarspgi/toc.html", self.TABLE, "listing")
        assert [d["doc_type"] for d in docs] == ["DFARS", "PGI", "DFARS"]
        a, pgi, toc = docs
        assert a["doc_name"] == "DFARS SUBPART 204.1 - Contract Execution"
        assert a["publication_date"] == "2024-05-30T00:00:00"
        assert pgi["doc_num"] == "PGI 204.1"  # derived from SUBPART 204.1
        # TOC row inherits the running part number and title
        assert toc["doc_num"] == "SUBPART 204.1 TABLE OF CONTENTS"
        assert toc["doc_title"] == "Contract Execution"
        # hash download_url is the basename
        assert a["version_hash_raw_data"]["download_url"] == "204_1.pdf"


# ------------------------------------------------------------- far_subpart_regs


class TestFar:
    BODY = (
        '<table class="usa-table meta"><tbody><tr><td>FAC</td><td>2024-05</td></tr></tbody></table>'
        '<table class="usa-table docs"><tbody>'
        '<tr><td><a>Part 1 Federal Acquisition Regulations System</a></td>'
        '<td><a href="/far/part-1">html</a></td></tr>'
        "</tbody></table>"
        '<tr class="agov-browse-tr"><td><a>Subpart 1.1 Purpose</a></td>'
        '<td><a href="/far/subpart-1.1">html</a></td></tr>'
    )

    def test_parts_and_subparts_one_page(self):
        _, docs = ex("far_subpart_regs").extract(
            "https://www.acquisition.gov/far", self.BODY, "listing")
        part, sub = docs
        assert part["doc_name"] == "FAR Part 1"
        assert sub["doc_name"] == "FAR Subpart 1.1"
        assert sub["downloadable_items"][0]["compression_type"] == "zip"
        # hash download_url is the raw href
        assert sub["version_hash_raw_data"]["download_url"] == "/far/subpart-1.1"
        assert part["publication_date"] == "2024-05-01T00:00:00"


# ------------------------------------------------------------------- NDAA_pubs


class TestNdaa:
    LANDING = (
        '<a href="/fy24-ndaa-subcommittee-marks">marks</a>'
        '<a href="/fy24-ndaa-floor-amendment-tracker">tracker</a>'
        '<a href="/files/FY24 Executive Summary.pdf">summary</a>'
        '<a href="/other">x</a>'
    )

    def test_landing_dispatch(self):
        links, docs = ex("NDAA_pubs").extract(
            "https://armedservices.house.gov/fy24-ndaa-resources", self.LANDING, "landing")
        assert links == [
            "https://armedservices.house.gov/fy24-ndaa-subcommittee-marks",
            "https://armedservices.house.gov/fy24-ndaa-floor-amendment-tracker",
        ]
        d = docs[0]
        # URL carving: basename, space→_, minus extension
        assert d["doc_name"] == "FY24_Executive_Summary"
        assert d["doc_title"] == "NDAA FY24 Executive Summary"
        assert d["version_hash_raw_data"]["display_title"] == d["doc_title"]

    def test_tracker_page_is_html_doc(self):
        body = ('<h1 id="page-title">FY24 NDAA Floor Amendment Tracker</h1>'
                '<p class="date">Posted June 14, 2023 by staff</p>')
        _, docs = ex("NDAA_pubs").extract(
            "https://armedservices.house.gov/fy24-ndaa-floor-amendment-tracker",
            body, "listing")
        d = docs[0]
        assert d["file_ext"] == "html"
        assert d["publication_date"] == "2023-06-14T00:00:00"
        assert d["doc_name"].startswith("NDAA - 2023-06-14T00:00:00 - ")


# ------------------------------------------------------------------------ SASC


class TestSasc:
    HEARING = (
        '<div class="SiteLayout__main">'
        '<h1 class="Heading__title">Posture of the Department</h1>'
        '<div class="Hearing__type">Full Committee Hearing</div>'
        '<div class="Hearing__detail"><time datetime="2024-04-09">Apr 9</time></div>'
        '<li class="Hearing__linkListItem RelatedIssuesLink mb-2">'
        '<a href="https://x/transcript-redirect"><span>Printed Transcript</span></a></li>'
        '<li class="col-12 col-md-6 p-2"><h3 class="Heading__title">'
        "<span>General</span><span>Jane Doe</span></h3>"
        '<div class="mt-3"><a href="https://x/apq-redirect"><span>APQ Responses</span></a></div>'
        "</li></div>"
    )

    def test_hearing_page_docs(self):
        links, docs = ex("SASC").extract("https://www.armed-services.senate.gov/hearings/posture", self.HEARING, "detail")
        page, transcript, witness = docs
        assert page["doc_name"] == "SASC Hearing - Posture of the Department"
        assert page["file_ext"] == "html"
        assert transcript["display_doc_type"] == "Transcript"
        assert transcript["detail_url"] == "https://x/transcript-redirect"
        assert witness["doc_name"] == (
            "SASC Hearing - Posture of the Department - General Jane Doe Advance Policy Questions"
        )
        assert witness["doc_type"] == "SASC Full Committee Hearing Advance Policy Questions"
        # pendings: redirect pages entered the frontier
        assert links == ["https://x/transcript-redirect", "https://x/apq-redirect"]
        assert "download_url" not in transcript["version_hash_raw_data"]

    def test_redirect_page_detail_record(self):
        _, recs = ex("SASC").extract(
            "https://x/apq-redirect", '<p><a href="https://cdn.x/final.pdf">here</a></p>', "detail")
        assert recs == [{"detail_download_href": "https://cdn.x/final.pdf"}]

    def test_landing_pagination(self):
        body = '<select id="showing-page"><option>1</option><option>3</option></select>'
        links, _ = ex("SASC").extract("https://www.armed-services.senate.gov/hearings", body, "landing")
        assert links == [
            "https://www.armed-services.senate.gov/hearings?pagenum_rs=1",
            "https://www.armed-services.senate.gov/hearings?pagenum_rs=2",
            "https://www.armed-services.senate.gov/hearings?pagenum_rs=3",
        ]


# ------------------------------------------------------------------------- UFC


class TestUfc:
    DOC_PAGE = (
        "<h1>UFC 1-200-01 DoD Building Code</h1>"
        "<div>Date: </div><div>2024-03-08</div>"
        "<div>Status: </div><div>Active</div>"
        '<div>View/Download: </div><div><a href="/ffc/x.docx">docx</a>'
        '<a href="https://wbdg.org/FFC/DOD/UFC/ufc_1_200_01.pdf">pdf</a></div>'
    )
    UFGS_PAGE = (
        "<h1>UFGS 01 11 00.00 20 Summary of Work</h1>"
        "<div>Date: </div><div>2015-02-01</div>"
        '<div>View/Download: </div><div><a href="https://wbdg.org/x.pdf">pdf</a></div>'
    )

    def test_doc_page_carving(self):
        _, docs = ex("UFC").extract(
            "https://wbdg.org/ffc/dod/unified-facilities-criteria-ufc/ufc-1-200-01",
            self.DOC_PAGE, "detail")
        d = docs[0]
        assert d["doc_name"] == "UFC 1-200-01 DoD Building Code"  # full h1
        assert (d["doc_num"], d["doc_title"]) == ("1-200-01", "DoD Building Code")
        assert d["download_url"].endswith(".pdf")  # pdf wins over docx
        assert d["display_title"] == d["doc_name"]  # set_display_name(full)

    def test_ufgs_numeric_carving(self):
        _, docs = ex("UFC").extract(
            "https://wbdg.org/ffc/dod/unified-facilities-guide-specifications-ufgs/ufgs-01-11",
            self.UFGS_PAGE, "detail")
        d = docs[0]
        assert d["doc_type"] == "UFGS"
        assert d["doc_num"] == "01 11 00.00 20"  # 4-token number (5th is digit)
        assert d["doc_title"] == "Summary of Work"

    def test_inactive_dropped(self):
        body = self.DOC_PAGE.replace("<div>Active</div>", "<div>Inactive</div>")
        _, docs = ex("UFC").extract("https://wbdg.org/ffc/dod/unified-facilities-criteria-ufc/x", body, "detail")
        assert docs == []

    def test_listing_pagination(self):
        body = ('<table><tr><td><a href="/ffc/dod/unified-facilities-criteria-ufc/ufc-1-200-01">x</a></td>'
                "<td>t</td></tr></table>")
        links, _ = ex("UFC").extract(
            "https://wbdg.org/ffc/dod/unified-facilities-criteria-ufc", body, "listing")
        assert links == [
            "https://wbdg.org/ffc/dod/unified-facilities-criteria-ufc/ufc-1-200-01",
            "https://wbdg.org/ffc/dod/unified-facilities-criteria-ufc?page=1",
        ]


# ---------------------------------------------------- DOD_Coronavirus_Guidance


class TestDodCoronavirus:
    GRID = (
        '<div class="dgov-grid"><div class="block"><h2 class="cat">Travel</h2>'
        '<div class="common-grid">'
        '<div class="item"><a class="title" href="/memo travel.pdf">Travel Memo</a>'
        '<p class="date">March 1, 2021</p></div>'
        '<div class="item"><a class="title" href="https://other.mil/page">Guidance Page</a>'
        '<p class="date">April 5, 2021</p></div>'
        "</div></div></div>"
    )

    def test_direct_vs_follow(self):
        links, docs = ex("DOD_Coronavirus_Guidance").extract(
            "https://www.defense.gov/Explore/Spotlight/Coronavirus/Latest-DOD-Guidance/",
            self.GRID, "listing")
        direct, follow = docs
        assert direct["doc_name"] == "Travel: Travel Memo"
        assert direct["doc_num"] == "None"
        assert direct["version_hash_raw_data"]["item_currency"].endswith("memo%20travel.pdf")
        assert direct["file_ext"] == "DoD Coronavirus Guidance"  # quirk
        # follow page parks pending keyed on item_currency
        assert follow["detail_url"] == "https://other.mil/page"
        assert follow["pending_hash_key"] == "item_currency"
        assert "item_currency" not in follow["version_hash_raw_data"]
        assert links == ["https://other.mil/page"]

    def test_follow_page_completion(self):
        body = '<div class="body"><a href="mailto:x@y.mil">m</a><a href="/files/guide.pdf">g</a></div>'
        _, recs = ex("DOD_Coronavirus_Guidance").extract("https://other.mil/page", body, "detail")
        assert recs == [{"detail_download_href": "https://www.defense.gov/files/guide.pdf"}]

    def test_follow_page_html_fallback(self):
        _, recs = ex("DOD_Coronavirus_Guidance").extract(
            "https://other.mil/page", "<div><a href='/nope'>covid info</a></div>", "detail")
        assert recs == [{"detail_download_href": "https://other.mil/page"}]


class TestCoronavirusPendingE2E:
    def test_follow_page_completion_in_engine(self, spark, tmp_path):
        """Engine crawl of the coronavirus spotlight: a direct-download item
        lands immediately; a follow-page item parks pending and completes
        from the follow page's first downloadable href, with item_currency
        (not download_url) receiving the completing URL in the hash dict —
        the pending_hash_key path end-to-end."""
        from gc_spark import schema as S
        from gc_spark.plans.drain import CrawlEngine, EngineConfig
        from gc_spark.sources.fetch import TableFetcher
        from gc_spark.sources.tables import SnapshotStore
        from tests.fixtures import PAGES, SEEDS, media_sha_for

        start = "https://www.defense.gov/Explore/Spotlight/Coronavirus/Latest-DOD-Guidance/"
        grid = (
            '<div class="dgov-grid"><div class="block"><h2 class="cat">Travel</h2>'
            '<div class="common-grid">'
            '<div class="item"><a class="title" href="/memo.pdf">Travel Memo</a>'
            '<p class="date">March 1, 2021</p></div>'
            '<div class="item"><a class="title" href="https://www.defense.gov/guide-page">Guide Page</a>'
            '<p class="date">April 5, 2021</p></div>'
            "</div></div></div>"
        )
        follow = '<div class="body"><a href="/files/real guide.pdf">the guide</a></div>'
        rows = [
            {"url": start, "status": 200, "body": grid, "links": None,
             "kind": "listing", "media_sha": None, "zip_entries": None},
            {"url": "https://www.defense.gov/guide-page", "status": 200, "body": follow,
             "links": None, "kind": "detail", "media_sha": None, "zip_entries": None},
        ]
        for u in ("https://www.defense.gov/memo.pdf",
                  "https://www.defense.gov/files/real%20guide.pdf"):
            rows.append({"url": u, "status": 200, "body": None, "links": None,
                         "kind": "binary", "media_sha": media_sha_for(u),
                         "zip_entries": None})
        pages = spark.createDataFrame(rows, schema=PAGES)
        seeds = spark.createDataFrame(
            [{"source": "DOD_Coronavirus_Guidance", "url": start, "host": "www.defense.gov"}],
            schema=SEEDS)
        store = SnapshotStore(spark, str(tmp_path / "cov"))
        eng = CrawlEngine(spark, store, TableFetcher(pages),
                          config=EngineConfig(budget_per_host=10, fetch_partitions=4))
        eng.bootstrap(seeds)
        eng.run(max_batches=6)

        feed = {r["doc_name"]: r for r in store.read("feed", S.DOC_ITEMS).collect()}
        direct = feed["Travel: Travel Memo"]
        assert direct["version_hash_raw_data"]["item_currency"].endswith("/memo.pdf")
        completed = feed["Travel: Guide Page"]
        # completed from the follow page, hash keyed by item_currency
        assert completed["version_hash_raw_data"]["item_currency"].endswith("real%20guide.pdf")
        assert "download_url" not in completed["version_hash_raw_data"] or (
            completed["version_hash_raw_data"].get("download_url") != ""
        )
        assert completed["downloadable_items"][0]["download_url"].endswith("real%20guide.pdf")


class TestWave3EngineE2E:
    def test_dispatch_jsonblob_and_redirect_pending(self, spark, tmp_path):
        """One engine crawl over CNSS + secnav + SASC: the CNSS landing
        fan-out and per-page split-function dispatch, the secnav SharePoint
        JSON blob with Echelon+suffix typing and the default.aspx
        source_page_url pin, and the SASC witness pdf completing through the
        redirect-page pending join."""
        from gc_spark import schema as S
        from gc_spark.plans.drain import CrawlEngine, EngineConfig
        from gc_spark.sources.fetch import TableFetcher
        from gc_spark.sources.tables import SnapshotStore
        from tests.fixtures import wave3_pages, wave3_seeds

        store = SnapshotStore(spark, str(tmp_path / "w3"))
        eng = CrawlEngine(
            spark, store, TableFetcher(wave3_pages(spark)),
            config=EngineConfig(budget_per_host=10, fetch_partitions=8),
        )
        eng.bootstrap(wave3_seeds(spark))
        eng.run(max_batches=10)

        feed = {r["doc_name"]: r for r in store.read("feed", S.DOC_ITEMS).collect()}
        # CNSS: dispatch-table typing per page
        assert feed["CNSSP 22"]["display_doc_type"] == "Policy"
        assert feed["CNSSAM 041-15"]["display_doc_type"] == "Memo"
        assert feed["CNSSP 22"]["file_ext"] == "CNSSP"  # file_ext=doc_type quirk
        # secnav: JSON blob row + source_page_url pinned to default.aspx
        sec = feed["SECNAVINST 5215.1E"]
        assert sec["display_doc_type"] == "Instruction"
        assert sec["source_page_url"] == "https://www.secnav.navy.mil/doni/default.aspx"
        assert sec["version_hash_raw_data"]["status"] == "Active"
        # SASC: hearing html doc + witness APQ completed via redirect pending
        base = "SASC Hearing - Posture of the Department"
        assert feed[base]["file_ext"] == "html"
        wit = feed[f"{base} - General Jane Doe Advance Policy Questions"]
        assert wit["version_hash_raw_data"]["download_url"] == (
            "https://www.armed-services.senate.gov/dl/doe-apq.pdf"
        )
        assert wit["downloadable_items"][0]["download_url"].endswith("doe-apq.pdf")
