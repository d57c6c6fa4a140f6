"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with the dot product
expressed in JVM higher-order functions (`zip_with` + `aggregate`), no
Python in the loop. At 100 TB the scale path is LSH bucketing (random
hyperplane signs) so each query touches ~1/2^bits of the corpus; both share
the same scoring expression.

Everything is deterministic: hyperplanes are seeded numpy, embedded as
literal arrays (broadcast once, tiny).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — zip_with + aggregate, whole-stage codegen, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against the embedding of ``query_vec_id``.

    The query row is broadcast-cross-joined (1 row → zero shuffle of the
    corpus side); ordering ties broken by id for determinism. Returns the
    id set only (float similarity is engine-specific in the last ulp)."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv")
    )
    scored = (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            cosine(F.col(vec_col), F.col("_qv")).alias("sim"),
        )
    )
    return (
        scored.orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col)
    )


def cosine_topk_scored(
    emb: DataFrame, query_vec_id: int, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Same as cosine_topk but keeps the similarity column (for tests)."""
    q = emb.filter(F.col(id_col) == query_vec_id).select(F.col(vec_col).alias("_qv"))
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, cosine(F.col(vec_col), F.col("_qv")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i). Pure exprs.

    The planes ride as ONE nested-array literal walked by higher-order
    functions, instead of ``bits`` separate dot-product expression trees
    each carrying ``dim`` literals — same result, but the expression is
    O(1) in ``bits`` for codegen purposes (the round-2 bench showed ~3 s
    of fixed codegen at 8×64 literals; 16×64 would double it)."""
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    weights = F.lit([1 << i for i in range(len(planes))]).cast("array<long>")
    bits_arr = F.transform(planes_lit, lambda p: (dot(vec, p) > 0).cast("long"))
    return F.aggregate(
        F.zip_with(bits_arr, weights, lambda b, w: b * w),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ivf_build(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """IVF coarse quantizer: k-means cells over the corpus (pyspark.ml,
    seeded → deterministic). Returns (assigned_df with a `cell` column,
    centers as a python list). At 100 TB the assigned table is written
    partitioned by `cell`, so a query scans nprobe/n_cells of the data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn("_v", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_v", predictionCol="cell").fit(vecs)
    assigned = model.transform(vecs).drop("_v")
    centers = [c.tolist() for c in model.clusterCenters()]
    return assigned, centers


def ivf_topk(
    assigned: DataFrame,
    centers: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN query against an IVF index: rank cells by centroid distance
    (driver-side, |centers| is tiny), scan only the nprobe nearest cells,
    brute-force cosine within them."""
    import math

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    probe = sorted(range(len(centers)), key=lambda c: dist(centers[c], query_vec))[:nprobe]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(id_col, cosine(F.col(vec_col), qcol).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    mode: str = "overwrite",
) -> list[list[float]]:
    """Materialize an IVF index: the corpus partitioned by its k-means
    cell (`ivf_build`), one directory per cell, centers persisted as a
    JSON sidecar (`_ivf_centers.json` — driver-side metadata, KBs). A
    query then prunes to nprobe directories at the scan, the same
    partition-pruning contract as ``write_lsh_index``. Returns centers."""
    import json
    import os

    assigned, centers = ivf_build(emb, n_cells, id_col, vec_col, seed)
    (
        assigned.repartition(F.col("cell"))
        .write.mode(mode)
        .partitionBy("cell")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_centers.json"), "w") as f:
        json.dump(centers, f)
    return centers


def topk_from_ivf_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a ``write_ivf_index`` table: rank cells by
    centroid distance driver-side (|centers| is tiny), scan ONLY the
    nprobe nearest cell directories (``cell IN (...)`` is a
    partition-column predicate → file-list pruning, asserted via the
    scan's numFiles metric in tests), brute-force cosine within them."""
    import json
    import math
    import os

    with open(os.path.join(path, "_ivf_centers.json")) as f:
        centers = json.load(f)

    def dist(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    probe = sorted(range(len(centers)), key=lambda c: dist(centers[c], query_vec))[
        :nprobe
    ]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    return (
        idx.select(id_col, cosine(F.col(vec_col), qcol).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _infer_dim(emb: DataFrame, vec_col: str) -> int:
    """Read the vector dimension from the data (one 1-row job). Hardcoding
    a wrong dim would make zip_with pad with NULLs → NULL buckets → silent
    empty results."""
    row = emb.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dimension from column {vec_col!r}")
    return int(row["d"])


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = 8,
    dim: int | None = None,
    blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup mode): candidate pairs
    via matching LSH hyperplane buckets, then exact cosine ≥ threshold. At
    scale the bucket join bounds the quadratic term to within-bucket pairs.

    ``bits=None`` → *exact* mode. Exact cosine-threshold join is inherently
    O(n²) compute, but the plan need not be a cartesian product: rows are
    assigned to ``blocks`` hash blocks and joined through the upper-
    triangular (block_i ≤ block_j) grid — an equi-join whose B(B+1)/2
    cells each hold ~2n/B rows, so task memory and skew stay bounded and
    AQE can split cells further. Use the LSH modes (``bits=…`` here, or
    ``neardup_lsh_multiprobe`` for guaranteed-radius candidates) when n²
    compute itself is the problem."""
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if bits:
        planes = _hyperplanes(dim or _infer_dim(emb, vec_col), bits)
        base = base.withColumn("_b", lsh_bucket_col(F.col("v"), planes))
        a = base.alias("a")
        b = base.alias("b")
        cand = a.join(b, (F.col("a._b") == F.col("b._b")) & (F.col("a.id") < F.col("b.id")))
        pairs = cand.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
    else:
        spark = emb.sparkSession
        grid = spark.createDataFrame(
            [(i, j) for i in range(blocks) for j in range(i, blocks)],
            "bi int, bj int",
        )
        left = base.select(
            F.col("id").alias("ida"), F.col("v").alias("va"),
            F.pmod(F.hash("id"), F.lit(blocks)).cast("int").alias("bi"),
        )
        right = base.select(
            F.col("id").alias("idb"), F.col("v").alias("vb"),
            F.pmod(F.hash("id"), F.lit(blocks)).cast("int").alias("bj"),
        )
        cells = left.join(F.broadcast(grid), "bi").join(right, "bj")
        # off-diagonal cells see each unordered pair once (keep it, then
        # normalize id order); diagonal cells see both orderings (keep one)
        cand = cells.filter(
            (F.col("bi") < F.col("bj")) | (F.col("ida") < F.col("idb"))
        )
        pairs = cand.select(
            F.least("ida", "idb").alias("id_a"),
            F.greatest("ida", "idb").alias("id_b"),
            cosine(F.col("va"), F.col("vb")).alias("sim"),
        )
    return pairs.filter(F.col("sim") >= threshold)


def neardup_lsh_multiprobe(
    emb: DataFrame,
    threshold: float = 0.9,
    bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs via multi-probe hyperplane LSH — the 100 TB path.

    Each vector's ``bits``-bit signature explodes into bits+1 probe keys
    (identity + every single-bit flip); two rows sharing a probe key are
    within hamming ≤ 2 of each other's signatures (triangle through the
    key), so candidates cover any pair whose signatures differ in ≤ 2
    planes. Candidates are then verified with exact cosine, so every
    emitted pair is exact; for near-identical vectors (angle θ) each plane
    flips with probability θ/π, so at dedup thresholds missing 3+ planes
    is vanishingly rare — contract-tested empirically against the exact
    oracle on the fixtures.

    Plan shape (round-3 rework): ONE exchange total for candidates —
    explode (bits+1)× → groupBy probe key → in-bucket pair generation via
    array HOFs → exact-cosine verify joins (dimension-small, AQE
    broadcasts them). Two things make this cheaper than the previous
    self-join + distinct: (a) a self-join shuffles the keyed rows twice
    and recomputes the signature chain per side, the groupBy shuffles them
    once; (b) pairs are emitted EXACTLY ONCE from a canonical probe key —
    a pair with sig-xor ``diff`` shares exactly the keys {k, k^diff} when
    diff != 0 (emit iff k < k^diff) and all bits+1 keys when diff == 0
    (emit iff k == sig) — so there is no distinct exchange at all. The
    shuffle still carries (id, sig) only, ~16 bytes/row; vectors are
    re-attached per surviving pair (the round-1 measured 12× win)."""
    planes = _hyperplanes(dim or _infer_dim(emb, vec_col), bits)
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "_sig", lsh_bucket_col(F.col("v"), planes)
    )
    probes = F.array(
        F.col("_sig"),
        *[F.col("_sig").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(bits)],
    )
    keyed = base.select("id", "_sig", F.explode(probes).alias("_k"))
    buckets = (
        keyed.groupBy("_k")
        .agg(F.sort_array(F.collect_list(F.struct("id", "_sig"))).alias("ms"))
        .filter(F.size("ms") >= 2)
    )

    def _emit(x, y, k):
        # canonical-key rule: of the probe keys this pair shares, emit only
        # from one — no duplicates, hence no distinct
        diff = x["_sig"].bitwiseXOR(y["_sig"])
        return F.when(diff == 0, k == x["_sig"]).otherwise(k < k.bitwiseXOR(diff))

    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ms",
                        lambda x, i: F.filter(
                            F.transform(
                                F.slice(F.col("ms"), i + F.lit(2), F.size("ms")),
                                lambda y: F.struct(
                                    x["id"].alias("id_a"),
                                    y["id"].alias("id_b"),
                                    _emit(x, y, F.col("_k")).alias("keep"),
                                ),
                            ),
                            lambda s: s["keep"],
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )
    vecs = base.select("id", "v")
    scored = (
        pairs.join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
    )
    return scored.filter(F.col("sim") >= threshold).select("id_a", "id_b", "sim")


def write_lsh_index(
    emb: DataFrame,
    path: str,
    bits: int = 16,
    prefix_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize an LSH-bucketed ANN index: the corpus with its
    ``bits``-bit hyperplane signature, written **partitioned by the top
    ``prefix_bits`` of the signature** — so a query prunes to the probed
    partitions at the SCAN (Spark partition pruning on the directory
    column), never touching the rest of the corpus. 2^prefix_bits
    directories; keep prefix_bits ≤ ~12 so the file count stays sane."""
    planes = _hyperplanes(dim or _infer_dim(emb, vec_col), bits)
    sig = lsh_bucket_col(F.col(vec_col), planes)
    (
        emb.withColumn("_sig", sig)
        .withColumn(
            "bucket", F.shiftrightunsigned(F.col("_sig"), bits - prefix_bits)
        )
        # one file per bucket dir: the shuffle has 2^prefix_bits keys
        .repartition(F.col("bucket"))
        .write.mode(mode)
        .partitionBy("bucket")
        .parquet(path)
    )


def _prefixes_within_hamming(prefix: int, prefix_bits: int, radius: int) -> list[int]:
    """All prefix values within hamming ≤ radius of ``prefix`` (driver-side
    combinatorics: C(prefix_bits, ≤radius) values — 37 for 8 bits, r=2)."""
    from itertools import combinations

    out = [prefix]
    for r in range(1, radius + 1):
        for bits_to_flip in combinations(range(prefix_bits), r):
            v = prefix
            for b in bits_to_flip:
                v ^= 1 << b
            out.append(v)
    return out


def topk_from_lsh_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    bits: int = 16,
    prefix_bits: int = 8,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k against a ``write_lsh_index`` table. The query's signature
    prefix expands driver-side into every prefix within
    ``probe_hamming`` flips; the scan filters ``bucket IN (...)`` — a
    partition-column predicate, so Spark prunes the untouched directories
    from the file listing (assert: explain() shows the In(bucket) partition
    filter and inputFiles() shrinks — tests/test_similarity.py). Any pair
    of signatures within hamming ≤ probe_hamming overall differs in ≤
    probe_hamming prefix bits, so candidate recall matches the unindexed
    ``cosine_topk_lsh`` at the same radius. Candidates are re-ranked with
    the full-signature hamming filter, then exact cosine."""
    planes = _hyperplanes(len(query_vec), bits)
    import numpy as np

    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) > 0:
            qsig |= 1 << i
    qprefix = qsig >> (bits - prefix_bits)
    probes = _prefixes_within_hamming(qprefix, prefix_bits, probe_hamming)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    cand = idx.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig).cast("long")))
        <= probe_hamming
    )
    return (
        cand.select(id_col, cosine(F.col(vec_col), qcol).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_topk_lsh(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    bits: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """LSH-bucketed ANN: score only vectors whose hyperplane signature is
    within ``probe_hamming`` bits of the query's (multi-probe). At scale
    the bucket column is precomputed and the table partitioned by it, so a
    query prunes to a handful of partitions instead of a full scan."""
    planes = _hyperplanes(dim or _infer_dim(emb, vec_col), bits)
    with_bucket = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    q = with_bucket.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qv"), F.col("_bucket").alias("_qbucket")
    )
    cand = (
        with_bucket.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .filter(
            F.bit_count(F.col("_bucket").bitwiseXOR(F.col("_qbucket")))
            <= probe_hamming
        )
    )
    return (
        cand.select(id_col, cosine(F.col(vec_col), F.col("_qv")).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "sim")
    )
