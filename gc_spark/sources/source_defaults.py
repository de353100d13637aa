"""Per-source display constants — the Level 1/2/3 'Source' metadata each
reference spider hard-codes as class attributes (display_org / data_source /
source_title, e.g. disa_pubs_spider.py:22-27, dcma_spider.py:70-73).

These are data (public label strings), not code. They feed
operators/enrich.enrich_with_source_defaults (J3): item-level values win,
these fill gaps — matching AdditionalFieldsPipeline (pipelines.py:319-372).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gc_spark.sources.seeds import SEED_LIST

# source → (display_org, data_source, source_title)
DISPLAY_DEFAULTS: dict[str, tuple[str, str, str]] = {
    "air_force_pubs": ("Dept. of the Air Force", "Dept. of the Air Force E-Publishing", "Unlisted Source"),
    "army_g1_pubs": ("Dept. of the Army", "Army Publishing Directorate", "G-1 Publications"),
    "army_pubs": ("Dept. of the Army", "Army Publishing Directorate", "Unlisted Source"),
    "Army_Reserve": ("Dept. of the Army", "Army Publishing Directorate", "Unlisted Source"),
    "Bupers_Crawler": ("US Navy", "MyNavy HR", "Bureau of Naval Personnel Instructions"),
    "code_of_federal_regulations": ("Executive Branch", "National Archives and Records Administration", "Unlisted Source"),
    "National_Guard": ("National Guard", "National Guard Bureau Publications & Forms Library", "Unlisted Source"),
    "CNSS": ("Dept. of Defense", "Committee on National Security Systems Library", "Unlisted Source"),
    "Coast_Guard": ("Coast Guard", "Coast Guard Deputy Commandant for Mission Support", "Unlisted Source"),
    "DCMA": ("Dept. of Defense", "Defense Contract Management Agency Policy Publications", "DCMA Policy"),
    "defense_travel": ("Defense Travel", "Defense Travel", "Defense Travel Management Office"),
    "dfars_pgi": ("DFARS", "Defense Federal Acquisition Regulation", "Unlisted Source"),
    "dha_pubs": ("Defense Health Agency", "Military Health System", "Defense Health Agency Publications"),
    "DISA_pubs": ("Defense Information Systems Agency", "Defense Information Systems Agency", "DISA Policy/Issuances"),
    "DOD_Coronavirus_Guidance": ("Dept. of Defense", "Defense Publications", "Unlisted Source"),
    "dod_issuances": ("Dept. of Defense", "WHS DoD Directives Division", "Unlisted Source"),
    "ex_orders": ("Executive Branch", "Federal Register", "Unlisted Source"),
    "far_subpart_regs": ("FAR", "Federal Acquisition Regulation", "Unlisted Source"),
    "FASAB Crawler": ("FASAB", "Federal Accounting Standards Advisory Board", "Handbook of Accounting Standards"),
    "fmr_pubs": ("FMR", "Under Secretary of Defense (Comptroller)", "Unlisted Source"),
    "HASC": ("Congress", "House Armed Services Committee Publications", "House Armed Services Committee"),
    "ic_policies": ("Intelligence Community", "Office of Director of National Intelligence", "Unlisted Source"),
    "jcs_pubs": ("Joint Chiefs of Staff", "CJCS Directives Library", "Unlisted Source"),
    "legislation_pubs": ("Congress", "Congressional Legislation", "Unlisted Source"),
    "maradmin_pubs": ("US Marine Corps", "Marine Corps Publications Electronic Library", "Marine Administrative Message"),
    "marine_pubs": ("US Marine Corps", "Marine Corps Publications Electronic Library", "Unlisted Source"),
    "milpersman_crawler": ("US Navy", "MyNavy HR", "Unlisted Source"),
    "navy_med_pubs": ("US Navy Medicine", "Navy Medicine", "Unlisted Source"),
    "navy_personnel_messages": ("US Navy", "MyNavy HR", "Bureau of Naval Personnel Messages"),
    "navy_reserves": ("US Navy Reserve", "U.S. Navy Reserve", "Unlisted Source"),
    "NDAA_pubs": ("House Armed Services Committee", "House Armed Services Committee Publications", "NDAA Resources"),
    "omb_pubs": ("OMB", "Executive Office of the President", "Office of Management and Budget Memoranda"),
    "samm_policy": ("Defense Security Cooperation Agency", "SAMM", "Unlisted Source"),
    "SASC": ("Congress", "Senate Armed Services Committee Publications", "Senate Armed Services Committee"),
    "secnav_pubs": ("US Navy", "Dept. of the Navy Issuances", "Unlisted Source"),
    "SORN": ("Dept. of Defense", "Federal Register", "Unlisted Source"),
    "stig_pubs": ("Security Technical Implementation Guides", "Security Technical Implementation Guides", "Unlisted Source"),
    "tradoc": ("United States Army Training and Doctrine Command", "TRADOC", "TRADOC Administrative Publications"),
    "UFC": ("Department of Defense", "Whole Building Design Guide", "Unified Facilities Criteria"),
    "us_code": ("United States Code", "Office of Law Revision Counsel", "Unlisted Source"),
    "dla_dedso_pubs": ("Defense Logistics Agency", "DLA DEDSO", "DLA DEDSO"),
}


def source_config_rows() -> list[dict]:
    start_urls = {source: urls[0] for source, urls, _domains in SEED_LIST}
    rows = []
    for source, (display_org, data_source, source_title) in DISPLAY_DEFAULTS.items():
        rows.append(
            {
                "source": source,
                "display_org": display_org,
                "data_source": data_source,
                "source_title": source_title,
                "display_source": data_source + " - " + source_title,
                "start_url": start_urls.get(source),
                "cac_login_required_default": False,
            }
        )
    return rows


def source_config_df(spark: SparkSession) -> DataFrame:
    """Broadcast-sized per-source defaults table for J3 enrichment."""
    return spark.createDataFrame(source_config_rows())
