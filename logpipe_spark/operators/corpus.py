"""Corpus-management operators for training-data pipelines: deterministic
splits, C4-style quality filtering, and sequence packing.

The reference has no analogue (it forwards bytes); these are the ops a
100 TB pre-training corpus runs between dedup and tokenization. Design
rules shared with the rest of the package: pure JVM expressions wherever
the semantics allow, engine-portable hashing (md5-derived, so the DuckDB
oracle value-checks bit for bit), and the one genuinely sequential op
(next-fit packing) as an Arrow-batched ``applyInPandas`` over independent
shards — the custom-stateful escape hatch, with a recursive-CTE SQL mirror.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logpipe_spark.operators.dedup import _shingles, _tokens, base_hash60


def split_bucket(key: Column, salt: str = "split", buckets: int = 10000) -> Column:
    """Deterministic per-key bucket in [0, buckets): md5-derived so any
    engine reproduces it (never RAND() — resplits must be stable across
    runs, engines, and row order)."""
    return base_hash60(F.concat(F.lit(salt + ":"), key.cast("string"))) % buckets


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every doc a deterministic train/val/test split by hashed key.

    The industry rule for corpus splits: hash the STABLE KEY, not the row —
    adding or removing other docs never moves a doc across splits (a
    random() split re-rolls on every change and leaks val into train).
    Fractions are cumulative thresholds over a 10k-bucket space; the salt
    namespaces independent split schemes over the same corpus."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1: {fractions}")
    b = split_bucket(F.col(key_col), salt)
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        threshold = int(round(cum * 10000))
        cond = b < F.lit(threshold)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return docs.withColumn("split", expr)


def corpus_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 1_000_000,
    min_tokens: int = 10,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    min_alpha_ratio: float = 0.5,
) -> DataFrame:
    """C4-style quality gate: keep/drop decision + the FIRST failed rule as
    ``drop_reason`` (NULL when kept) — the reason column is what makes a
    filtering pass debuggable at corpus scale (groupBy drop_reason tells
    you what your thresholds are doing before you burn a full run).

    All rules are single-pass JVM expressions over ``text``; the rule
    order is the documented evaluation order (cheap length checks before
    the regex)."""
    t = F.col(text_col)
    toks = _tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    mean_tok = n_chars / F.greatest(n_tokens, F.lit(1))
    alpha_ratio = F.length(F.regexp_replace(t, "[^A-Za-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    reason = (
        F.when(n_chars < min_chars, F.lit("too_short"))
        .when(n_chars > max_chars, F.lit("too_long"))
        .when(n_tokens < min_tokens, F.lit("too_few_tokens"))
        .when(mean_tok < min_mean_token_len, F.lit("tokens_too_short"))
        .when(mean_tok > max_mean_token_len, F.lit("tokens_too_long"))
        .when(alpha_ratio < min_alpha_ratio, F.lit("low_alpha_ratio"))
    )
    return docs.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
    ]
)


def sequence_pack(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Next-fit sequence packing: assign docs to ``pack_id`` bins so each
    bin's token total stays ≤ ``budget`` (a doc larger than the budget
    gets its own bin) — the pre-training step that fills fixed context
    windows instead of padding each doc to one.

    Genuinely sequential semantics (each doc's bin depends on the running
    fill), so the parallel unit is the SHARD: docs hash into ``n_shards``
    independent streams, each packed in doc-id order by an Arrow-batched
    ``applyInPandas`` kernel (vectorless python loop over one shard's
    counts — thousands of ints, not the corpus). pack_id is globally
    unique as shard * 2^40 + seq. At 100 TB, shards ≈ output training
    files and the per-shard loop is O(docs/shard) integer ops — the
    shuffle to shards is the only data movement. Token counts are the
    whitespace tokenizer's (same as the dedup family), computed JVM-side
    BEFORE the python kernel so the kernel never touches text.

    Docs with zero tokens are dropped (they pack nowhere); the SQL mirror
    is a per-shard recursive CTE with identical next-fit arithmetic."""
    toks = F.size(_tokens(F.col(text_col))).cast("int")
    keyed = docs.select(
        F.col(key_col).cast("long").alias("doc_id"),
        (base_hash60(F.col(key_col).cast("string")) % n_shards)
        .cast("int")
        .alias("shard"),
        toks.alias("n_tokens"),
    ).filter(F.col("n_tokens") >= 1)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        fill = 0
        seq = 0
        out = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            fill += t
            out.append(shard * (1 << 40) + seq)
        pdf["pack_id"] = out
        return pdf[["doc_id", "shard", "n_tokens", "pack_id"]]

    return keyed.groupBy("shard").applyInPandas(_pack, _PACK_SCHEMA)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_overlap: int = 3,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose text shares
    ``min_overlap``+ distinct ``n``-gram token shingles with ANY doc in the
    held-out evaluation set — the standard pre-training hygiene pass that
    keeps test-set text out of the training corpus (n-gram overlap against
    the benchmark, per GPT-3/PaLM-style dataset reports; 8-13 gram windows
    are the published sweet spot — long enough that chance collisions
    vanish, short enough that light paraphrase still hits).

    Scale design — the asymmetry IS the plan: the benchmark side is tiny
    (millions of shingles) against a 100 TB corpus, so the eval shingle
    set is deduped and BROADCAST; the corpus is never shuffled by shingle.
    One pass: explode corpus shingles (``explode_outer`` so shingle-less
    docs survive with zeros), broadcast-hash mark matches, then a single
    ``groupBy(doc_id)`` with map-side partial aggregation. No self-join,
    no shuffle keyed on text.

    Returns one row per corpus doc: ``n_shingles`` (distinct), ``n_overlap``
    (distinct shingles shared with the eval set), and ``contaminated``.
    Docs also present in ``eval_docs`` (matched by ``key_col``) are excluded
    from the output — they are the benchmark, not candidates."""
    sh = F.explode_outer(_shingles(F.col(text_col), n)).alias("g")
    corpus = docs.select(F.col(key_col).alias("doc_id"), sh)
    ev = (
        eval_docs.select(F.explode(_shingles(F.col(text_col), n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    ev_keys = eval_docs.select(F.col(key_col).alias("doc_id"))
    return (
        corpus.join(F.broadcast(ev), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("g").alias("n_shingles"),
            F.count("_hit").alias("n_overlap"),
        )
        .join(F.broadcast(ev_keys), "doc_id", "left_anti")
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )


def mix_sample(
    docs: DataFrame,
    targets: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Mixture sampling: subsample the listed groups (domains / sources /
    languages) so their relative sizes match ``targets`` — the
    data-mixing step that turns raw domain counts into a designed
    pre-training mixture. The achievable total T is set by the binding
    group (T = min over g of n_g / target_g, so the scarcest group is
    kept whole and every other group is trimmed to floor(target_g · T));
    unlisted groups are dropped.

    Selection within a group is by deterministic md5-hash order of the
    stable key (same rule as ``hash_split``/``quota_sample``): invariant
    under repartitioning and reproducible across engines. Plan: one tiny
    per-group count aggregate collected to the driver (domains are few —
    dozens, not millions), then a hash-partitioned per-group window rank
    against a broadcast keep-count map. No global exchange; the
    quota_sample skew caveat applies to pathologically large groups."""
    from pyspark.sql import Window

    if not targets:
        raise ValueError("targets must be non-empty")
    for g, f in targets.items():
        if f <= 0:
            raise ValueError(f"target fraction for {g!r} must be > 0, got {f}")
    member = F.col(group_col).isin(list(targets))
    counts = {
        r["g"]: r["n"]
        for r in docs.filter(member)
        .groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    absent = sorted(set(targets) - set(counts))
    if absent:
        raise ValueError(f"target groups absent from corpus: {absent}")
    total = min(counts[g] / f for g, f in targets.items())
    keep = {g: int(f * total + 1e-9) for g, f in targets.items()}
    keep_expr = F.create_map(
        *[x for g, k in keep.items() for x in (F.lit(g), F.lit(k))]
    )[F.col(group_col)]
    h = base_hash60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.filter(member)
        .withColumn("_mrank", F.row_number().over(w))
        .filter(F.col("_mrank") <= keep_expr)
        .drop("_mrank")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Split every document into fixed-size token windows — the context-
    window prep step that complements ``sequence_pack`` (packing joins
    short docs; chunking splits long ones). ``stride`` < ``chunk_size``
    yields overlapping windows (the usual trick so no span is ever cut
    mid-context); default stride = chunk_size (disjoint). The tail chunk
    may be shorter; token-less docs emit nothing.

    Per-row generate-and-explode: window starts are a JVM ``sequence``,
    each chunk a ``slice`` + ``concat_ws`` — one generator, no shuffle,
    no Python; at 100 TB this is a map-only stage whose output feeds
    straight into the (sharded) packer or the tokenizer."""
    if stride is None:
        stride = chunk_size
    if not (1 <= stride <= chunk_size):
        raise ValueError(f"need 1 <= stride <= chunk_size, got {stride}/{chunk_size}")
    toks = _tokens(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride))
    chunks = F.filter(
        F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                F.slice(toks, s, chunk_size).alias("toks"),
            ),
        ),
        lambda c: F.size(c["toks"]) > 0,
    )
    ex = docs.select(
        F.col(key_col).alias("doc_id"), F.explode(chunks).alias("c")
    )
    return ex.select(
        "doc_id",
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.size("c.toks").cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.col("c.toks")).alias("chunk_text"),
    )


# RE2-safe patterns (no backreferences / lookaround), so Spark's Java regex
# and any RE2-family oracle engine agree token for token. Order matters:
# emails are redacted before IPv4 so a digit-bearing local part can't be
# half-eaten, and phones last (the leading + keeps them off IPv4 octets).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}([- ]?\d{2,4}){2,3}",
}


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace emails, IPv4 addresses, and +-prefixed phone
    numbers with typed placeholders (``<EMAIL>``/``<IP>``/``<PHONE>``) and
    count each category — the pre-training hygiene pass every published
    corpus pipeline runs before release.

    Pure per-row ``regexp_replace``/``regexp_count`` chain: JVM-side,
    whole-stage codegen, zero shuffles, embarrassingly parallel at 100 TB.
    Counts are taken BEFORE redaction (on the original text) so the three
    counters are independent of replacement order; the replacement chain
    itself is ordered email → ipv4 → phone, which is part of the
    documented contract (a phone match never sees an already-redacted
    email's digits). Patterns are deliberately RE2-safe so external
    engines reproduce the result bit for bit."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_PATTERNS["email"], "<EMAIL>"),
            PII_PATTERNS["ipv4"],
            "<IP>",
        ),
        PII_PATTERNS["phone"],
        "<PHONE>",
    )
    return docs.withColumn("n_emails", F.regexp_count(t, F.lit(PII_PATTERNS["email"]))) \
        .withColumn("n_ipv4", F.regexp_count(t, F.lit(PII_PATTERNS["ipv4"]))) \
        .withColumn("n_phones", F.regexp_count(t, F.lit(PII_PATTERNS["phone"]))) \
        .withColumn("text_redacted", redacted)


def quota_sample(
    docs: DataFrame,
    group_col: str = "lang",
    quota: int = 100,
    key_col: str = "doc_id",
    salt: str = "quota",
) -> DataFrame:
    """Cap every group at ``quota`` docs — the over-representation fix
    (per-language / per-domain / per-source caps) a corpus runs after
    filtering and before packing.

    Selection is by deterministic HASH order of the stable key, not
    first-seen order: the chosen subset is invariant under repartitioning,
    engine changes, and corpus growth outside the group (a doc only drops
    out when enough new docs hash BELOW it inside its own group — the same
    stability rule as ``hash_split``; ``salt`` namespaces independent
    sampling passes). Ties on the hash break by key, so the result is a
    total function of the group's key set.

    Plan: one hash-partitioned window per group (no global exchange, no
    SinglePartition — auto-screened by test_plan_quality); the sort is
    per-group over ~group-size rows. Skewed groups: a group 100× the
    median sorts 100× the rows in one task — at that shape, pre-filter
    with an approximate per-group threshold on the hash before the exact
    window, which this fixture-scale implementation deliberately omits.
    """
    from pyspark.sql import Window

    h = base_hash60(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        docs.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= quota)
        .drop("_qrank")
    )
