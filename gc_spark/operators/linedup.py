"""Corpus-level line deduplication (C4 / CCNet-style boilerplate removal).

Training-data pipelines drop *lines* that recur across many documents
(cookie banners, nav bars, license footers) even when the documents as a
whole are unique — the complement of whole-document dedup
(operators/text_dedup) and local-substring dedup (winnowing,
functions/text.winnow_fingerprints_col). Reference analog: the crawl feed
keeps raw page text; this is the op a consumer runs before training
(C4: Raffel et al. 2020 "three-sentence dedup"; CCNet: Wenzek et al. 2020
per-paragraph hash dedup).

Scale shape (the part that matters at 100 TB):
  - one shuffle: lines group by 60-bit line hash with a two-phase
    count-distinct-docs aggregate (map-side partial on (hash, doc_id));
  - the "common lines" set is tiny relative to the corpus (boilerplate is
    by definition heavy-tailed), so the removal join is broadcast-able —
    same shape as the seen-set anti-join (operators/dedup), and the same
    bloom prefilter applies if it ever outgrows broadcast;
  - the rebuild is a per-doc groupBy on the already-partitioned doc_id —
    text bytes shuffle ONCE (lines → per-doc collect); with input bucketed
    by doc_id it would shuffle zero times.

The unit of dedup here is a fixed-width word chunk ("line") because the
synthetic corpus has no newlines; `split_lines_col` takes the delimiter
regex so real newline-delimited corpora use the same operator unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gc_spark.functions.text import _sha60_local


def chunk_lines_col(col: Column, words_per_line: int = 8) -> Column:
    """Array of fixed-width word chunks (the no-newline stand-in for lines):
    consecutive groups of `words_per_line` whitespace-split words, re-joined
    with single spaces. The last chunk may be short. DuckDB twin:
    list_transform(range(...), i -> array_to_string(list_slice(w, ...)))."""
    from gc_spark.functions.text import bind_once

    def _chunks(t: Column) -> Column:
        n_chunks = F.ceil(F.size(t).cast("double") / words_per_line).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: F.array_join(
                F.slice(t, i * words_per_line + 1, words_per_line), " "
            ),
        )

    # token array bound once — HOF lambdas re-evaluate captured subtrees
    # per element (functions/text.bind_once)
    return bind_once(F.split(F.trim(col), r"\s+"), _chunks)


def split_lines_col(col: Column, delim: str = r"\n") -> Column:
    """Real-corpus variant: newline (or custom regex) split, blanks dropped."""
    return F.filter(F.split(col, delim), lambda x: F.trim(x) != "")


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lines_col: Column | None = None,
    min_docs: int = 2,
) -> DataFrame:
    """Remove every line that occurs in >= `min_docs` DISTINCT documents;
    return one row per input document:

      (id_col, n_lines, n_removed, kept_sha)

    kept_sha is sha256 of the surviving lines re-joined in original order —
    it pins the exact rewritten bytes without shipping them (same contract
    as q47's redacted_sha). Documents whose every line is boilerplate stay
    in the output with n_removed == n_lines and the sha of ''.

    Lines are keyed by the portable 60-bit sha256 prefix (_sha60_local) so
    the grouping state is 8 bytes/line, not the line bytes — at corpus
    scale the count-distinct aggregate shuffles only (hash, doc_id)."""
    lines = lines_col if lines_col is not None else chunk_lines_col(F.col(text_col))
    # `exploded` feeds two consumers (the common-line aggregate and the
    # rebuild join side); without materialization each runs its own full
    # chunk+sha parse of the corpus (the planner shares nothing across
    # subtree instantiations). One lazy localCheckpoint trades a single
    # local write of the exploded lines for the second parse pass —
    # computed fresh from the inputs every invocation. The corpus-sized
    # text shuffle count is unchanged (still exactly one, the rebuild).
    exploded = (
        df.select(F.col(id_col), F.posexplode(lines).alias("_pos", "_line"))
        .withColumn("_lh", _sha60_local(F.col("_line")))
        .localCheckpoint(eager=False)
    )

    common = (
        exploded.groupBy("_lh")
        .agg(F.count_distinct(id_col).alias("_ndocs"))
        .filter(F.col("_ndocs") >= min_docs)
        .select("_lh", F.lit(1).alias("_dup"))
    )

    flagged = exploded.join(F.broadcast(common), "_lh", "left")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("_pos"), F.col("_line"), F.col("_dup")))
    )
    kept = F.filter(ordered, lambda x: x["_dup"].isNull())
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.coalesce(F.col("_dup"), F.lit(0))).cast("long").alias("n_removed"),
        F.sha2(F.array_join(F.transform(kept, lambda x: x["_line"]), " "), 256).alias(
            "kept_sha"
        ),
    )
