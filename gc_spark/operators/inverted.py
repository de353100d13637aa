"""Inverted-index construction — term -> positional posting lists.

The reference's crawl output feeds the GAMECHANGER search indexer
(manifest.json + downloaded docs are its input contract); this operator is
the Spark-native version of that downstream step, so a consumer can build
the searchable index in the same job that crawled the corpus.

Shape:
  - (term, doc, positions) from one posexplode over the token stream —
    the ONLY corpus-sized shuffle, keyed (term, doc_id) with map-side
    combine;
  - per-term postings aggregate over the already term-partitioned frame:
    Spark keeps the (term, doc) partitioning compatible (term is a prefix
    of the key), so the second groupBy reuses the shuffle in AQE;
  - hot terms (stopwords) make giant posting rows — production segments
    the index like Lucene does: write with .write.partitionBy(segment)
    where segment = hash(doc_id) % S, giving S bounded per-term rows that
    merge at query time; the segment column is plumbed here, S=1 keeps the
    oracle-comparable single-row form.

Postings are rendered "doc:pos|pos,..." sorted by doc then position —
deterministic bytes both engines can reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segments: int = 1,
) -> DataFrame:
    """(term, doc_freq, postings[, segment]) — positional inverted index.
    Positions are 0-based token offsets within the document."""
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "term"),
    )
    if segments > 1:
        toks = toks.withColumn(
            "segment", F.pmod(F.xxhash64(F.col(id_col)), F.lit(segments)).cast("int")
        )
        seg_cols = ["segment"]
    else:
        seg_cols = []

    # One exchange for both aggregations (guide §2.4): hash-partitioning on
    # term alone satisfies the clustering requirement of the (term, doc)
    # groupBy AND the term-grain groupBy, so the second aggregate runs in
    # the same stage instead of paying its own shuffle. Term-hash layout is
    # what the final index needs anyway, so hot-term placement is unchanged
    # — a stopword's postings always end up on one task either way.
    toks = toks.repartition(*(seg_cols + ["term"]))
    per_doc = toks.groupBy(*seg_cols, "term", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_plist")
    )
    entry = F.concat(
        F.col(id_col).cast("string"),
        F.lit(":"),
        F.array_join(F.transform("_plist", lambda p: p.cast("string")), "|"),
    )
    return per_doc.groupBy(*seg_cols, "term").agg(
        F.count("*").cast("long").alias("doc_freq"),
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("d"), entry.alias("e")))
            ).getField("e"),
            ",",
        ).alias("postings"),
    )


def incremental_postings(
    index_df: DataFrame,
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Absorb a batch of NEW documents into a stored inverted index without
    rescanning the corpus — the index twin of text_dedup.incremental_components.

    Contract (the crawl's natural shape): delta doc ids are strictly greater
    than every indexed id — manifest ids are append-monotonic, so new
    postings concatenate AFTER the stored, already doc-sorted postings
    string and the merged row stays sorted without re-parsing it.

    Scale shape: the delta alone is tokenized (delta-sized posexplode +
    groupBy); the stored index — term-keyed, corpus-sized — is touched by
    ONE join on the delta's term set. Brand-new terms survive via the
    full-outer side. Output: the replacement rows for touched terms only;
    a MERGE of these into the stored table is the production write.
    """
    d = inverted_index(delta_docs, text_col=text_col, id_col=id_col)
    # Broadcast the delta's term set to PRUNE the stored index with a scan +
    # semi join (no shuffle of the corpus-sized index); the outer merge then
    # runs between two delta-sized frames.
    touched = index_df.join(
        F.broadcast(d.select("term").distinct()), "term", "left_semi"
    )
    merged = touched.alias("o").join(d.alias("n"), "term", "full_outer")
    return merged.select(
        "term",
        (
            F.coalesce(F.col("o.doc_freq"), F.lit(0))
            + F.coalesce(F.col("n.doc_freq"), F.lit(0))
        )
        .cast("long")
        .alias("doc_freq"),
        F.concat_ws(
            ",", F.col("o.postings"), F.col("n.postings")
        ).alias("postings"),
    )
