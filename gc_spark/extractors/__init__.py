"""Per-source extractor registry (SURVEY.md §2.11).

The reference's 41 spiders are per-site parse callbacks
(Response → Iterator[DocItem ∪ Request]). Here each source registers a pure
function over (url, body) returning (links, docs); the engine runs the whole
registry inside one Arrow-batched ``mapInPandas`` pass over the fetched
micro-batch — per-page Python happens only inside Arrow batches, never
row-at-a-time through the JVM boundary.
"""

from gc_spark.extractors.base import (
    EXTRACTED_SCHEMA,
    Extractor,
    register,
    registry,
    run_extractors,
)
from gc_spark.extractors import (  # noqa: F401 (register on import)
    acquisition_hearings,
    air_force,
    army_navy_pubs,
    govinfo,
    executive_orders,
    issuance_libraries,
    issuances,
    json_api,
    marine_corp,
    misc_sites,
    pubs_tables,
    reserve_guard,
    service_pubs,
    synthetic,
    us_code,
)

__all__ = ["Extractor", "register", "registry", "run_extractors", "EXTRACTED_SCHEMA"]
