"""Span algebra for interleaved text+media documents.

The engine's document model (schema.py SPAN / DOCUMENTS) is the input-hint
shape: ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`` and the
per-row correctness invariant is SPAN-SEQUENCE EQUALITY — same (kind, text,
media_ref) in the same order. This module gives that invariant first-class,
reusable operators (all pure JVM expressions — no UDFs, no Python):

  - build_interleaved_spans: deterministic spans from a flat text column
    (fixed-width text chunks with a media span interleaved after every
    ``media_every``-th chunk) — the synthetic generator used by tests and
    benchmarks; the real crawl path builds spans in
    operators/explode.py (assemble_spans / interleave_spans_from_segments).
  - flatten_spans: documents → one row per span (order carried by offset).
    Scale shape: a single explode, no shuffle; downstream filters on `kind`
    prune media payloads before any join.
  - spans_from_rows: the inverse — per-span rows → ordered spans array.
    One groupBy(doc_id) shuffle; ordering is restored with array_sort on
    (offset, ...) structs, NOT a global sort.
  - span_sequence_fingerprint: per-doc sha256 over the ordered
    "kind|text|media_ref" lines — span-sequence equality collapsed to one
    comparable value (two documents are span-equal iff fingerprints match).
    This is how the engine e2e suite pins span parity cheaply at scale:
    compare fingerprints, not exploded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEXT_CHUNK = 80  # chars per text span in the synthetic builder
MEDIA_EVERY = 3  # a media span follows every 3rd text chunk


def build_interleaved_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = TEXT_CHUNK,
    media_every: int = MEDIA_EVERY,
) -> DataFrame:
    """Deterministic interleaved spans from flat text.

    Text chunk i (0-based, ``chunk`` chars) sits at offset ``i + i//media_every``;
    after every chunk with ``i % media_every == media_every-1`` a media span
    follows at the next offset with ``media_ref = blob://doc/<id>/<i>``.
    Pure array expressions (sequence/transform/filter) — no shuffle.
    """
    text = F.col(text_col)
    did = F.col(id_col).cast("string")
    n_chunks = F.greatest(F.ceil(F.length(text) / F.lit(float(chunk))), F.lit(1)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    gap = lambda i: F.floor(i / F.lit(media_every)).cast("int")  # noqa: E731
    text_spans = F.transform(
        idx,
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            text.substr(i * chunk + 1, F.lit(chunk)).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i + gap(i)).cast("int").alias("offset"),
        ),
    )
    media_spans = F.transform(
        F.filter(idx, lambda i: i % media_every == media_every - 1),
        lambda i: F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("blob://doc/"), did, F.lit("/"), i.cast("string")).alias("media_ref"),
            (i + gap(i) + 1).cast("int").alias("offset"),
        ),
    )
    spans = F.array_sort(
        F.concat(text_spans, media_spans),
        lambda a, b: a["offset"] - b["offset"],
    )
    return df.select(F.col(id_col).alias("doc_id"), spans.alias("spans"))


def flatten_spans(df: DataFrame) -> DataFrame:
    """documents → one row per span: (doc_id, span_offset, kind, span_text,
    media_ref). A single generator expand — no shuffle, order is data
    (the offset column), never an implicit row order."""
    s = F.explode("spans").alias("s")
    return df.select("doc_id", s).select(
        "doc_id",
        F.col("s.offset").alias("span_offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("span_text"),
        F.col("s.media_ref").alias("media_ref"),
    )


def spans_from_rows(flat: DataFrame) -> DataFrame:
    """Inverse of flatten_spans: per-span rows → (doc_id, spans) with spans
    ordered by offset. collect_list gives NO ordering guarantee after a
    shuffle, so ordering is restored by array_sort on the offset key —
    correct under AQE/speculation, unlike sortWithinPartitions tricks."""
    packed = F.struct(
        F.col("span_offset").alias("offset"),
        F.col("kind").alias("kind"),
        F.col("span_text").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    ordered = F.array_sort(
        F.collect_list(packed),
        lambda a, b: a["offset"] - b["offset"],
    )
    spans = F.transform(
        ordered,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    return flat.groupBy("doc_id").agg(spans.alias("spans"))


def span_sequence_fingerprint(df: DataFrame) -> DataFrame:
    """Per-doc span-sequence fingerprint: sha256 over newline-joined
    "kind|text|media_ref" lines in offset order, plus span counts.
    Two documents are span-sequence-equal (the north-rule invariant:
    kind, text, media_ref, order) iff their fingerprints are equal —
    the cheap way to compare 10^10 documents without exploding them."""
    ordered = F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"])

    def line(s):
        # length-prefixed fields make the encoding injective: payloads may
        # contain '|' or '\n', but an explicit char count before each field
        # leaves only one parse (kind itself is engine-controlled, no '|')
        t = F.coalesce(s["text"], F.lit(""))
        m = F.coalesce(s["media_ref"], F.lit(""))
        return F.concat_ws("|", s["kind"], F.length(t).cast("string"), t,
                           F.length(m).cast("string"), m)
    return df.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", lambda s: s["kind"] == "media")).alias("n_media"),
        F.sha2(F.concat_ws("\n", F.transform(ordered, line)), 256).alias("span_seq_sha"),
    )


SPAN_ARRAY_T = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def coalesce_text_spans(df: DataFrame) -> DataFrame:
    """Merge every run of CONSECUTIVE text spans into a single text span
    (texts concatenated in offset order); media spans are run boundaries
    and pass through unchanged; offsets are renumbered densely 0..n-1.

    Why: extractors emit text in fixed-width chunks (build_interleaved_
    spans) or per-HTML-node fragments; training consumers want maximal
    text pieces between media items. Coalescing build_interleaved_spans'
    output reconstructs each contiguous text segment exactly (chunks are
    substrings, so concatenation is the inverse of chunking).

    Scale shape: a per-row array fold (F.aggregate) — NO shuffle, no
    explode/regroup round-trip; the whole operator is a map. The fold
    copies the accumulator per element (O(k²) in spans-per-doc), which is
    fine for document-scale span counts (tens); a doc with thousands of
    spans should go through the exploded-row window form instead."""
    ordered = F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"])

    def step(acc, s):
        last = F.try_element_at(acc, F.lit(-1))
        merged_last = F.struct(
            F.lit("text").alias("kind"),
            F.concat(last["text"], s["text"]).alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            last["offset"].alias("offset"),
        )
        # empty acc: last is NULL, the condition is NULL → otherwise-branch
        return F.when(
            (s["kind"] == F.lit("text")) & (last["kind"] == F.lit("text")),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged_last)),
        ).otherwise(F.concat(acc, F.array(s)))

    merged = F.aggregate(ordered, F.array().cast(SPAN_ARRAY_T), step)
    renumbered = F.transform(
        merged,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.select("doc_id", renumbered.alias("spans"))


def _span_line(s) -> "F.Column":
    """Length-prefixed 'kind|len|text|len|media_ref' encoding shared with
    span_sequence_fingerprint (injective: see note there)."""
    t = F.coalesce(s["text"], F.lit(""))
    m = F.coalesce(s["media_ref"], F.lit(""))
    return F.concat_ws(
        "|", s["kind"], F.length(t).cast("string"), t,
        F.length(m).cast("string"), m,
    )


def truncate_spans(df: DataFrame, char_budget: int) -> DataFrame:
    """Truncate each interleaved span sequence to a text budget: walk spans
    in offset order, keep media spans while budget remains, cut the
    boundary text span mid-way, drop everything after — the context-window
    packing step for multimodal documents (keeps media refs that still
    have surrounding text; a media span arriving with zero budget left is
    dropped with its context).

    Returns (doc_id, n_spans, n_chars, truncated, span_seq_sha) — the
    fingerprint uses the same injective line encoding as
    span_sequence_fingerprint, so truncated-sequence equality is one
    string compare. Entirely map-side: a single array fold per document,
    no shuffle, no explode.
    """
    ordered = F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"])

    # F.aggregate with a (rem, lines, n_spans, n_chars) accumulator; the
    # lambda builds each kept span's encoded line directly.
    zero = F.struct(
        F.lit(char_budget).alias("rem"),
        F.array().cast("array<string>").alias("lines"),
        F.lit(0).alias("n_spans"),
        F.lit(0).alias("n_chars"),
    )

    def fold(acc, s):
        rem = acc["rem"]
        is_text = s["kind"] == F.lit("text")
        tlen = F.length(F.coalesce(s["text"], F.lit("")))
        take = F.least(tlen, rem)
        kept = F.struct(
            s["kind"].alias("kind"),
            F.when(is_text, F.substring(s["text"], 1, take).cast("string"))
            .otherwise(F.lit(None).cast("string"))
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        )
        keep = rem > 0
        return F.struct(
            F.when(is_text & keep, rem - take).otherwise(rem).alias("rem"),
            F.when(keep, F.concat(acc["lines"], F.array(_span_line(kept))))
            .otherwise(acc["lines"])
            .alias("lines"),
            F.when(keep, acc["n_spans"] + 1).otherwise(acc["n_spans"]).alias(
                "n_spans"
            ),
            F.when(is_text & keep, acc["n_chars"] + take)
            .otherwise(acc["n_chars"])
            .alias("n_chars"),
        )

    total_text = F.aggregate(
        ordered,
        F.lit(0),
        lambda acc, s: acc
        + F.when(
            s["kind"] == F.lit("text"),
            F.length(F.coalesce(s["text"], F.lit(""))),
        ).otherwise(F.lit(0)),
    )
    acc = F.aggregate(ordered, zero, fold)
    return df.select(
        "doc_id",
        acc["n_spans"].alias("n_spans"),
        acc["n_chars"].alias("n_chars"),
        (total_text > char_budget).alias("truncated"),
        F.sha2(F.array_join(acc["lines"], "\n"), 256).alias("span_seq_sha"),
    )


def caption_candidates(df: DataFrame, prefix: int = 40) -> DataFrame:
    """(doc_id, media_ref, caption) — for every media span, the first
    `prefix` chars of the IMMEDIATELY following text span (offset + 1), or
    null when the media span ends the document / abuts another media span.
    The standard caption-mining heuristic for interleaved corpora (public
    practice: adjacent-text pairing in multimodal dataset pipelines).
    Map-side: one pass over each ordered span array pairing element i with
    i+1 — no self-join, no shuffle."""
    ordered = F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"])
    from gc_spark.functions.text import bind_once

    def pairs(arr):
        idx = F.sequence(F.lit(1), F.size(arr))
        return F.filter(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(arr, i)["kind"].alias("kind"),
                    F.element_at(arr, i)["media_ref"].alias("media_ref"),
                    F.when(
                        (i < F.size(arr))
                        & (F.element_at(arr, i + 1)["kind"] == F.lit("text"))
                        & (
                            F.element_at(arr, i + 1)["offset"]
                            == F.element_at(arr, i)["offset"] + 1
                        ),
                        F.substring(F.element_at(arr, i + 1)["text"], 1, prefix),
                    )
                    .otherwise(F.lit(None).cast("string"))
                    .alias("caption"),
                ),
            ),
            lambda p: p["kind"] == F.lit("media"),
        )

    exploded = df.select(
        "doc_id", F.explode(bind_once(ordered, pairs)).alias("p")
    )
    return exploded.select(
        "doc_id",
        F.col("p.media_ref").alias("media_ref"),
        F.col("p.caption").alias("caption"),
    )


def audit_spans(df: DataFrame) -> DataFrame:
    """Ingest-time integrity audit of interleaved span sequences: (doc_id,
    n_spans, offset_violations, kind_violations, payload_violations,
    is_valid).

    The north-rule invariant is span-sequence equality on (kind, text,
    media_ref, order) — which is only meaningful if the stored sequences
    are well-formed in the first place. Checks, all pure per-row array
    expressions (map-side, no shuffle, blobs untouched):

    - offset_violations: adjacent pairs where offset fails to strictly
      increase (duplicate or out-of-order offsets — a corrupted reorder);
    - kind_violations: kind outside {text, media};
    - payload_violations: a text span missing text / carrying media_ref,
      or a media span missing media_ref / carrying text.
    """
    spans = F.col("spans")
    nexts = F.slice(spans, 2, F.greatest(F.size(spans) - 1, F.lit(0)))
    off_viol = F.size(
        F.filter(
            F.zip_with(spans, nexts, lambda a, b: b["offset"] <= a["offset"]),
            lambda x: x,
        )
    )
    kind_viol = F.size(
        F.filter(spans, lambda s: ~s["kind"].isin("text", "media"))
    )
    payload_bad = lambda s: (  # noqa: E731
        (s["kind"] == "text")
        & (s["text"].isNull() | s["media_ref"].isNotNull())
    ) | (
        (s["kind"] == "media")
        & (s["media_ref"].isNull() | s["text"].isNotNull())
    )
    pay_viol = F.size(F.filter(spans, payload_bad))
    return df.select(
        "doc_id",
        F.size(spans).alias("n_spans"),
        off_viol.alias("offset_violations"),
        kind_viol.alias("kind_violations"),
        pay_viol.alias("payload_violations"),
        ((off_viol == 0) & (kind_viol == 0) & (pay_viol == 0)).alias("is_valid"),
    )


def media_dedup_stats(df: DataFrame) -> DataFrame:
    """Cross-document media deduplication over interleaved span sequences:
    (doc_id, n_media, n_dup_media, dup_media_frac) where a media span is a
    duplicate iff its media_ref appears in MORE THAN ONE document (shared
    logos, headers, stock images — the image-side analog of line dedup,
    and the signal a VLM pipeline drops or down-weights repeated images
    on).

    Plan: media refs are projected out of the span arrays (map-side — the
    span structs and any blob payloads never move), one groupBy(media_ref)
    computes document frequency, and the vocabulary-sized (ref, df) frame
    joins back onto the per-doc ref lists. The join is keyed on media_ref,
    so only (doc_id, media_ref) pairs shuffle — never span content."""
    # (doc_id, media_ref) is the lightweight proxy of the span stream
    # (guide §8) and feeds BOTH the docfreq aggregate and the join-back
    # side; without materialization each consumer re-builds the upstream
    # span arrays over the corpus, so checkpoint the proxy once.
    refs = df.select(
        "doc_id",
        F.explode(
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == "media"),
                lambda s: s["media_ref"],
            )
        ).alias("media_ref"),
    ).localCheckpoint(eager=False)
    docfreq = refs.groupBy("media_ref").agg(
        F.count_distinct("doc_id").alias("_df")
    )
    per_doc = (
        refs.join(docfreq, "media_ref")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_media"),
            F.sum((F.col("_df") > 1).cast("int")).alias("n_dup_media"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_media",
        "n_dup_media",
        F.round(F.col("n_dup_media") / F.col("n_media"), 6).alias(
            "dup_media_frac"
        ),
    )


def modality_mix(
    df: DataFrame, source_col: str = "source", token_split: str = r"\s+"
) -> DataFrame:
    """Per-source modality ledger over interleaved span sequences — the
    release_report (operators/report) sibling for the multimodal axis:

      (source, n_docs, text_tokens, n_media, media_text_ratio,
       leading_media_frac)

    text_tokens counts whitespace tokens inside text spans (per-span, the
    same split the quality ops use); media_text_ratio is the corpus-level
    media-per-token density VLM training mixes are tuned on;
    leading_media_frac is the share of docs whose FIRST span (min offset)
    is media — caption-style docs behave differently from article-style
    docs in packing (pack_multimodal) and truncation (truncate_spans).

    Scale shape: every per-doc figure is ONE array fold over the spans
    column (blobs and span structs never shuffle, no explode), then a
    single source-keyed aggregate of 4 longs — the output is
    source-cardinality.
    """
    spans = F.col("spans")
    toks = F.aggregate(
        F.filter(spans, lambda s: s["kind"] == "text"),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.size(F.split(F.trim(s["text"]), token_split)),
    )
    n_media = F.size(F.filter(spans, lambda s: s["kind"] == "media"))
    min_off = F.array_min(F.transform(spans, lambda s: s["offset"]))
    leads = F.exists(
        spans,
        lambda s: (s["offset"] == min_off) & (s["kind"] == "media"),
    ).cast("int")
    per_doc = df.select(
        F.col(source_col).alias("source"),
        toks.alias("_toks"),
        n_media.cast("long").alias("_m"),
        leads.alias("_lead"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_toks").alias("text_tokens"),
        F.sum("_m").alias("n_media"),
        F.round(
            F.sum("_m") / F.greatest(F.sum("_toks"), F.lit(1)), 6
        ).alias("media_text_ratio"),
        F.round(F.avg("_lead"), 6).alias("leading_media_frac"),
    )


def redact_spans(df: DataFrame) -> DataFrame:
    """PII-redact interleaved documents WITHOUT flattening them: emails and
    phone-shaped runs inside text spans become typed placeholders
    (functions/text.redact_pii_col's kernel), media spans and the span
    structure pass through untouched. Emits (doc_id, spans, n_emails,
    n_phones) — the redacted sequence plus the audit counts.

    Run coalesce_text_spans FIRST: extractors chunk text arbitrarily, and
    PII straddling an artificial chunk boundary matches in neither half;
    after coalescing, the only span boundaries left are real media
    boundaries, which genuinely do split text. Pure per-row array
    transforms + folds — map-side, blobs never move, no Python.
    """
    from gc_spark.functions.text import EMAIL_PATTERN, PHONE_PATTERN

    spans = F.col("spans")

    def scrubbed(t):
        return F.regexp_replace(
            F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
            PHONE_PATTERN,
            "<PHONE>",
        )

    red = F.transform(
        spans,
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(s["kind"] == "text", scrubbed(s["text"]))
            .otherwise(s["text"])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )

    def pat_count(pattern: str):
        return F.aggregate(
            F.filter(spans, lambda s: s["kind"] == "text"),
            F.lit(0),
            lambda acc, s: acc
            + F.size(F.regexp_extract_all(s["text"], F.lit(pattern), 0)),
        )

    keep = [c for c in df.columns if c != "spans"]
    return df.select(
        *keep,
        red.alias("spans"),
        pat_count(EMAIL_PATTERN).cast("int").alias("n_emails"),
        pat_count(PHONE_PATTERN).cast("int").alias("n_phones"),
    )


def span_language_profile(df: DataFrame) -> DataFrame:
    """Span-grain language segmentation for interleaved documents: the
    doc-level language-ID heuristic (stopword hit — q12's kernel) applied
    PER TEXT SPAN, then rolled up per doc:

      (doc_id, n_text_spans, n_en_spans, en_frac, doc_lang, is_mixed)

    Mixed-language documents (en_frac strictly between 0 and 1) are the
    rows a training mix either drops or routes to per-span filtering —
    doc-grain language ID silently mislabels them. Run after
    coalesce_text_spans so spans are maximal runs, not arbitrary chunks.

    Pure per-row array expressions (two sizes over a filter each), one map
    pass — the same scan-riding shape as every other span metric.
    """
    def _is_en(t):
        return (
            t.like("% the %") | t.like("the %") | t.like("% a %")
        )

    text_spans = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
    n_text = F.size(text_spans)
    n_en = F.size(F.filter(text_spans, lambda s: _is_en(s["text"])))
    en_frac = F.when(n_text > 0, F.round(n_en / n_text, 6)).otherwise(
        F.lit(0.0)
    )
    return df.select(
        "doc_id",
        n_text.cast("int").alias("n_text_spans"),
        n_en.cast("int").alias("n_en_spans"),
        en_frac.alias("en_frac"),
        F.when((n_text > 0) & (n_en * 2 >= n_text), F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("doc_lang"),
        ((n_en > 0) & (n_en < n_text)).cast("int").alias("is_mixed"),
    )


def blob_integrity(
    spans_df: DataFrame, manifest: DataFrame, ref_col: str = "media_ref"
) -> DataFrame:
    """Referential-integrity audit between the interleaved document table
    and the blob store manifest — the invariant an interleaved corpus
    lives or dies by: every media span's ref must resolve (an ORPHAN ref
    renders as a broken image at training time), and every stored blob
    should be referenced (an UNREFERENCED blob is paid-for storage the
    compactor can reclaim).

    Returns one row per distinct ref with its class:
      ok           — referenced and stored
      orphan_ref   — referenced by spans, missing from the manifest
      unreferenced — stored, referenced by nothing (plus n_docs = 0)

    Scale shape: refs are projected out of span arrays MAP-SIDE (blobs
    and span structs never move), reduced to (ref, doc count) — then ONE
    full-outer join against the manifest at distinct-ref grain, orders of
    magnitude smaller than the span table. The deletion feed for the
    compactor is `class = 'unreferenced'`; the block-release gate is
    `orphan_ref` count == 0."""
    refs = (
        spans_df.select(
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] == "media")
            ).alias("_s"),
            F.col("doc_id"),
        )
        .select(F.col("_s")[ref_col].alias("ref"), "doc_id")
        .groupBy("ref")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
    )
    man = manifest.select(F.col(ref_col).alias("ref")).distinct().select(
        "ref", F.lit(1).alias("_stored")
    )
    joined = refs.join(man, "ref", "full_outer")
    return joined.select(
        "ref",
        F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
        F.when(
            F.col("n_docs").isNotNull() & F.col("_stored").isNotNull(),
            F.lit("ok"),
        )
        .when(F.col("n_docs").isNotNull(), F.lit("orphan_ref"))
        .otherwise(F.lit("unreferenced"))
        .alias("class"),
    )
