"""The composed pre-training-corpus pipeline as a library function —
the corpus-management operators chained the way production runs them
(C4/FineWeb/Dolma shape), returning the per-stage funnel counts.

`examples/pretrain_corpus.py` narrates this interactively; `bench.py`
times it as one block (the composition is what a user actually runs —
stage costs hide fusion wins and barrier losses that per-operator
numbers can't show). Every stage keeps the scale posture documented on
its operator: hash groupBys, broadcast eval sets, id-only candidate
shuffles; nothing collects a corpus-sized result to the driver.

Stage boundaries are ``localCheckpoint``-materialized: the funnel
forces a count per stage, and without materialization stage k would
re-execute stages 1..k (the iterative components pass alone would rerun
half a dozen times). At 100 TB the same role is played by writing each
stage to storage — which a real run does anyway; they are its restart
points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logpipe_spark.operators.corpus import (
    chunk_documents,
    clean_text,
    corpus_filter,
    decontaminate,
    pii_redact,
    remove_eval_spans,
    sequence_pack,
    shuffle_corpus,
    temperature_mix,
)
from logpipe_spark.operators.dedup import (
    dedup_lines,
    exact_dedup,
    neardup_keep_best,
    ngram_jaccard_pairs,
)


def run_corpus_funnel(
    spark: SparkSession,
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    alpha: float = 0.5,
    chunk_size: int = 128,
    pack_budget: int = 256,
    html_col: str | None = None,
    url_blocklist: DataFrame | None = None,
    classifier_threshold: float | None = None,
    decontam_mode: str = "drop",
) -> dict:
    """[URL blocklist →] [HTML extract →] clean text → quality gate →
    [classifier gate →] exact dedup → near-dup keep-best →
    decontaminate → PII scrub → line dedup → temperature mix → chunk →
    pack → shuffle order.
    Returns {stage: count} (forcing each stage — this is the
    audit/benchmark entry; a production run would fuse stages it does
    not need counts for).

    The three optional crawl-side gates mirror C4/RefinedWeb order:
    ``url_blocklist`` drops blocked domains FIRST (cheapest predicate,
    broadcast anti-joins, before any text is even parsed),
    ``html_col`` runs the map-only tag-strip chain to produce ``text``,
    and ``classifier_threshold`` applies the hashed-linear quality model
    after the heuristic gate (both map-only; the heuristic first because
    it is cheaper per byte).

    ``decontam_mode``: "drop" (default) removes whole contaminated
    documents (the decontaminate flag); "excise" cuts only the
    contaminated spans (remove_eval_spans) and keeps the remainder,
    dropping a doc only when nothing survives."""
    funnel = {"input": docs.count()}

    if url_blocklist is not None:
        from logpipe_spark.operators.urls import url_blocklist_filter

        docs = url_blocklist_filter(docs, url_blocklist).localCheckpoint()
        funnel["url_blocklist"] = docs.count()

    if html_col is not None:
        from logpipe_spark.operators.html import extract_text

        docs = (
            extract_text(docs.drop("text"), html_col=html_col)
            .drop(html_col, "text_chars")
            .localCheckpoint()
        )
        funnel["html_extract"] = docs.count()

    # normalization BEFORE any text-keyed stage: the quality heuristics,
    # dedup fingerprints, and shingles downstream must see one canonical
    # byte form, or composed-vs-decomposed variants of the same document
    # defeat exact dedup entirely. Map-only — the count never changes, the
    # stage is in the funnel because every recipe documents it.
    docs = (
        clean_text(docs)
        .drop("text")
        .withColumnRenamed("text_clean", "text")
        .localCheckpoint()
    )
    funnel["clean_text"] = docs.count()

    gated = (
        corpus_filter(docs)
        .filter(F.col("keep"))
        .select("doc_id")
        .join(docs, "doc_id")
    )
    gated = gated.localCheckpoint()
    funnel["quality_gate"] = gated.count()

    if classifier_threshold is not None:
        from logpipe_spark.operators.classify import classifier_score

        good = classifier_score(
            gated, threshold=classifier_threshold
        ).filter(F.col("keep")).select("doc_id")
        gated = gated.join(good, "doc_id").localCheckpoint()
        funnel["classifier_gate"] = gated.count()

    exact = exact_dedup(gated).localCheckpoint()
    funnel["exact_dedup"] = exact.count()

    pairs = ngram_jaccard_pairs(exact, n=3, threshold=0.8).select("doc_a", "doc_b")
    keep = neardup_keep_best(
        exact.select("doc_id", F.length("text").cast("long").alias("n_chars")),
        pairs,
    )
    deduped = exact.join(
        keep.filter("keep").select("doc_id"), "doc_id"
    ).localCheckpoint()
    funnel["neardup_keep_best"] = deduped.count()

    if eval_docs is not None:
        if decontam_mode == "excise":
            # span surgery: cut the contaminated 8-grams, keep the rest
            # of the doc (drop only docs with nothing left)
            cut = remove_eval_spans(deduped, eval_docs, n=8)
            deduped = deduped.drop("text").join(
                cut.filter(F.col("n_kept") > 0).select(
                    "doc_id", F.col("clean_text").alias("text")
                ),
                "doc_id",
            )
        else:
            flags = decontaminate(deduped, eval_docs, n=8, min_overlap=3)
            deduped = deduped.join(
                flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
            )
        deduped = deduped.localCheckpoint()
        funnel["decontaminate"] = deduped.count()

    scrubbed = pii_redact(deduped).drop("text").withColumnRenamed(
        "text_redacted", "text"
    )
    lined = dedup_lines(scrubbed, min_docs=5).filter(F.col("clean_text") != "")
    lined = lined.join(scrubbed.drop("text"), "doc_id").withColumnRenamed(
        "clean_text", "text"
    )
    lined = lined.localCheckpoint()
    funnel["pii_line_dedup"] = lined.count()

    mixed = lined.join(
        temperature_mix(lined, alpha=alpha, group_col="lang").select("doc_id"),
        "doc_id",
    )
    mixed = mixed.localCheckpoint()
    funnel["temperature_mix"] = mixed.count()

    chunks = chunk_documents(mixed, chunk_size=chunk_size)
    packed = sequence_pack(
        chunks.select(
            (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("doc_id"),
            F.col("chunk_text").alias("text"),
        ),
        budget=pack_budget,
    )
    funnel["chunks"] = chunks.count()
    funnel["packed_bins"] = packed.select("pack_id").distinct().count()

    ordered = shuffle_corpus(mixed, num_shards=8, seed="epoch0")
    funnel["shuffled"] = ordered.count()
    return funnel
