"""The GAMECHANGER source-site seed list (SURVEY.md §2.1-S1).

Each entry mirrors one reference spider's ``name`` / ``start_urls`` /
``allowed_domains`` class attributes (reference: spiders/*_spider.py, e.g.
us_code_spider.py:22-23, dod_issuances_spider.py:13-14,
executive_orders_spider.py:17-20, air_force_spider.py:40-51).
These are data (public URLs), not code.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

from gc_spark.schema import SEEDS

# (source, [start_urls], [allowed_domains]) — one row per reference spider.
SEED_LIST: list[tuple[str, list[str], list[str]]] = [
    ("air_force_pubs", [f"https://www.e-publishing.af.mil/Product-Index/#/?view=cat&catID={c}" for c in (1, 16, 20, 2, 18, 3, 4, 5, 7)], ["e-publishing.af.mil"]),
    ("army_g1_pubs", ["https://www.army.mil/g-1#org-g-1-publications"], []),
    ("army_pubs", ["https://armypubs.army.mil/"], ["armypubs.army.mil"]),
    ("Army_Reserve", ["https://www.usar.army.mil/Publications/"], ["usar.army.mil"]),
    ("Bupers_Crawler", ["https://www.mynavyhr.navy.mil/References/BUPERS-Instructions/"], ["mynavyhr.navy.mil"]),
    ("code_of_federal_regulations", ["https://www.govinfo.gov/wssearch/rb/cfr?fetchChildrenOnly=0"], []),
    ("National_Guard", ["https://www.ngbpmc.ng.mil/Publications/CNGB-Instructions/"], ["ngbpmc.ng.mil"]),
    ("CNSS", ["https://www.cnss.gov/CNSS/index.cfm"], []),
    ("Coast_Guard", ["https://www.dcms.uscg.mil/Our-Organization/Assistant-Commandant-for-C4IT-CG-6/The-Office-of-Information-Management-CG-61/About-CG-Directives-System/"], ["dcms.uscg.mil"]),
    ("DCMA", ["https://www.dcma.mil/Policy/"], []),
    ("defense_travel", ["https://www.travel.dod.mil/Policy-Regulations/Joint-Travel-Regulations/"], ["www.travel.dod.mil"]),
    ("dfars_pgi", ["https://www.acq.osd.mil/dpap/dars/dfarspgi/current"], ["www.acq.osd.mil"]),
    ("dha_pubs", ["https://www.health.mil/Reference-Center/DHA-Publications"], []),
    ("DISA_pubs", ["https://disa.mil/About/DISA-Issuances/Instructions", "https://disa.mil/About/DISA-Issuances/Circulars"], []),
    ("DOD_Coronavirus_Guidance", ["https://www.defense.gov/Explore/Spotlight/Coronavirus/Latest-DOD-Guidance/"], []),
    ("dod_issuances", ["https://www.esd.whs.mil/DD/DoD-Issuances/DTM/"], ["www.esd.whs.mil"]),
    ("ex_orders", ["https://www.federalregister.gov/presidential-documents/executive-orders"], []),
    ("far_subpart_regs", ["https://www.acquisition.gov/far"], []),
    ("FASAB Crawler", ["https://fasab.gov/accounting-standards/document-by-chapter/"], ["fasab.gov"]),
    ("fmr_pubs", ["https://comptroller.defense.gov/FMR/vol1_chapters.aspx"], []),
    ("HASC", ["https://armedservices.house.gov/committee-activity/hearings/all?page=0"], ["armedservices.house.gov"]),
    ("ic_policies", ["https://www.dni.gov/index.php/what-we-do/ic-related-menus/ic-related-links/intelligence-community-directives"], ["www.dni.gov"]),
    ("jcs_pubs", ["https://www.jcs.mil/Library/"], []),
    ("legislation_pubs", ["https://www.govinfo.gov/wssearch/rb/plaw?fetchChildrenOnly=0", "https://www.govinfo.gov/wssearch/rb/bills?fetchChildrenOnly=0"], []),
    ("maradmin_pubs", ["https://www.marines.mil/News/Messages/MARADMINS/"], ["marines.mil"]),
    ("marine_pubs", ["https://www.marines.mil/News/Publications/MCPEL/?Page=1"], ["marines.mil"]),
    ("milpersman_crawler", ["https://www.mynavyhr.navy.mil/References/MILPERSMAN/"], []),
    ("navy_med_pubs", ["https://www.med.navy.mil/Directives/"], []),
    ("navy_personnel_messages", ["https://www.mynavyhr.navy.mil/References/Messages/"], ["mynavyhr.navy.mil"]),
    ("navy_reserves", ["https://www.navyreserve.navy.mil/"], ["navyreserve.navy.mil"]),
    ("NDAA_pubs", ["https://armedservices.house.gov/fy24-ndaa-resources"], []),
    ("omb_pubs", ["https://www.whitehouse.gov/omb/information-for-agencies/memoranda/"], []),
    ("samm_policy", ["https://samm.dsca.mil/listing/chapters", "https://samm.dsca.mil/policy-memoranda/PolicyMemoList-All"], ["samm.dsca.mil"]),
    ("SASC", ["https://www.armed-services.senate.gov/hearings"], []),
    ("secnav_pubs", ["https://www.secnav.navy.mil/doni/default.aspx"], []),
    ("SORN", ["https://www.federalregister.gov/api/v1/agencies/defense-department"], []),
    ("stig_pubs", ["https://public.cyber.mil/stigs/downloads/"], []),
    ("tradoc", ["https://adminpubs.tradoc.army.mil/index.html"], ["adminpubs.tradoc.army.mil"]),
    ("UFC", ["https://www.wbdg.org/dod/ufc"], []),
    ("us_code", ["https://uscode.house.gov/download/download.shtml"], []),
    ("dla_dedso_pubs", ["https://www.dla.mil/Defense-Data-Standards/Resources/ADC/"], ["dla.mil"]),
]


def seed_rows() -> list[dict]:
    rows = []
    for source, urls, domains in SEED_LIST:
        for url in urls:
            rows.append(
                {
                    "source": source,
                    "url": url,
                    "host": urlparse(url).netloc,
                    "allowed_domains": domains,
                }
            )
    return rows


def seeds_df(spark: SparkSession) -> DataFrame:
    """Small seeds DataFrame — broadcast-join-sized by construction."""
    return spark.createDataFrame(seed_rows(), schema=SEEDS)
