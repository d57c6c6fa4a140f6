"""PageRank, persisted inverted index retrieval, skew-safe grouped top-k,
and sequential n-gram mining."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.graph import pagerank
from logpipe_spark.operators.profile import grouped_topk
from logpipe_spark.operators.asof import sequence_ngrams
from logpipe_spark.operators.search import (
    search_conjunctive,
    term_bucket,
    write_inverted_index,
)

PPM = 1_000_000
PPB = 1_000_000_000


def _py_pagerank(edges, iterations=5, d_ppm=850_000, scale=10_000_000_000):
    """Pure-Python twin of the integer recurrence in operators/graph.py."""
    counts: dict[tuple[str, str], int] = {}
    for s, t, w in edges:
        counts[(str(s), str(t))] = counts.get((str(s), str(t)), 0) + w
    outw: dict[str, int] = {}
    for (s, _), w in counts.items():
        outw[s] = outw.get(s, 0) + w
    share = {e: (w * PPB) // outw[e[0]] for e, w in counts.items()}
    nodes = sorted({s for s, _ in counts} | {t for _, t in counts})
    n = len(nodes)
    base = ((PPM - d_ppm) * scale) // (PPM * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        nxt = {v: base for v in nodes}
        for (s, t), sh in share.items():
            nxt[t] += ((r[s] * d_ppm) // PPM * sh) // PPB
        r = nxt
    return r


class TestPagerank:
    def _edges_df(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string, w long")

    def test_matches_pure_python_recurrence(self, spark):
        rows = [
            ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
            ("d", "c", 5), ("b", "a", 1),
        ]
        got = {
            r["node"]: r["pr"]
            for r in pagerank(
                self._edges_df(spark, rows), iterations=4, weight_col="w"
            ).collect()
        }
        assert got == _py_pagerank(rows, iterations=4)

    def test_unweighted_counts_duplicate_edges(self, spark):
        rows = [("a", "b", 1), ("a", "b", 1), ("a", "c", 1), ("c", "a", 1)]
        got = {
            r["node"]: r["pr"]
            for r in pagerank(self._edges_df(spark, rows), iterations=3).collect()
        }
        # unweighted == weight 1 per row, duplicates collapse by SUM
        assert got == _py_pagerank(rows, iterations=3)

    def test_hub_outranks_leaves_and_mass_bounded(self, spark):
        # star: every leaf points at the hub
        rows = [(f"leaf{i}", "hub", 1) for i in range(8)]
        res = {
            r["node"]: r["pr"]
            for r in pagerank(self._edges_df(spark, rows), iterations=5).collect()
        }
        assert res["hub"] > max(v for k, v in res.items() if k != "hub")
        # floors + dangling hub only DROP mass
        assert sum(res.values()) <= 10_000_000_000

    def test_dangling_node_keeps_teleport_base(self, spark):
        rows = [("a", "b", 1)]  # b has no out-edges
        res = {
            r["node"]: r["pr"]
            for r in pagerank(self._edges_df(spark, rows), iterations=2).collect()
        }
        base = ((PPM - 850_000) * 10_000_000_000) // (PPM * 2)
        assert res["a"] == base  # nothing points at a
        assert res["b"] > base  # a's damped mass lands on b

    def test_repartition_invariant(self, spark):
        rows = [(f"n{i % 7}", f"n{(i * 3) % 7}", 1 + i % 4) for i in range(40)]
        df = self._edges_df(spark, rows)
        a = sorted(pagerank(df, iterations=3, weight_col="w").collect())
        b = sorted(
            pagerank(df.repartition(13), iterations=3, weight_col="w").collect()
        )
        assert a == b

    def test_validation(self, spark):
        df = self._edges_df(spark, [("a", "b", 1)])
        with pytest.raises(ValueError, match="iterations"):
            pagerank(df, iterations=0)
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping_ppm=PPM)
        with pytest.raises(ValueError, match="overflow"):
            pagerank(df, scale=10**12)
        with pytest.raises(ValueError, match="empty"):
            pagerank(df.where(F.lit(False)))


class TestInvertedIndex:
    @pytest.fixture(scope="class")
    def idx_path(self, spark, tmp_path_factory):
        docs = spark.createDataFrame(
            [
                (1, "spark merge join merge"),
                (2, "merge window"),
                (3, "window   vector merge"),  # separator run collapses
                (4, "vector"),
                (5, ""),
            ],
            "doc_id long, text string",
        )
        path = str(tmp_path_factory.mktemp("inv") / "idx")
        write_inverted_index(docs, path, n_buckets=16)
        return path

    def test_conjunctive_semantics(self, spark, idx_path):
        got = {
            r["doc_id"]: (r["total_tf"], r["dl"])
            for r in search_conjunctive(
                spark, idx_path, ["merge", "window"], n_buckets=16
            ).collect()
        }
        # only docs 2 and 3 contain BOTH terms; doc 3's separator run
        # collapses so dl == 3
        assert got == {2: (2, 2), 3: (2, 3)}

    def test_single_term_and_missing_term(self, spark, idx_path):
        got = sorted(
            r["doc_id"]
            for r in search_conjunctive(
                spark, idx_path, ["merge"], n_buckets=16
            ).collect()
        )
        assert got == [1, 2, 3]
        assert (
            search_conjunctive(
                spark, idx_path, ["merge", "nosuchterm"], n_buckets=16
            ).count()
            == 0
        )

    def test_scan_prunes_to_query_buckets(self, spark, idx_path):
        """The bucket IN (...) predicate is a partition filter: the scan
        must list only the probed shard directories (metric numFiles),
        same assert style as the LSH index test."""
        terms = ["merge"]
        df = search_conjunctive(spark, idx_path, terms, n_buckets=16)
        df.collect()
        n_dirs = len(
            [d for d in os.listdir(idx_path) if d.startswith("bucket=")]
        )
        want = {term_bucket(t, 16) for t in terms}
        assert len(want) < n_dirs  # the fixture really has prunable shards
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan
        counts = _num_files_metrics(df)
        # one file per shard dir → a pruned scan lists ≤ |probed buckets|
        assert counts and all(c <= len(want) for c in counts) and len(
            want
        ) < n_dirs, (counts, want, n_dirs)

    def test_validation(self, spark, idx_path):
        with pytest.raises(ValueError, match="non-empty"):
            search_conjunctive(spark, idx_path, [])


def _num_files_metrics(df):
    """Every scan's numFiles metric from the EXECUTED plan, unwrapping the
    AQE wrapper and materialized query stages (collectLeaves stops at
    them, hiding the FileScan the stage contains)."""
    out = []

    def walk(node):
        name = node.nodeName()
        try:
            m = node.metrics()
            if m.contains("numFiles"):
                out.append(m.apply("numFiles").value())
        except Exception:
            pass
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


class TestGroupedTopk:
    def test_hand_values_and_ties(self, spark):
        rows = [
            ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 30.0), ("a", 4, 5.0),
            ("b", 5, 1.0), ("b", 6, None),
        ]
        df = spark.createDataFrame(rows, "g string, id long, v double")
        got = sorted(
            (r["g"], r["rnk"], r["id"], r["v"])
            for r in grouped_topk(df, "g", "v", 2, "id").collect()
        )
        # ties broken by id ASC; NULL order values never rank
        assert got == [("a", 1, 2, 30.0), ("a", 2, 3, 30.0), ("b", 1, 5, 1.0)]

    def test_matches_window_semantics_on_skewed_groups(self, spark):
        df = spark.range(5000).select(
            F.when(F.col("id") % 100 < 97, F.lit("hot"))
            .otherwise(F.lit("cold"))
            .alias("g"),
            F.col("id"),
            (F.col("id") * 2777 % 997).cast("double").alias("v"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
        want = sorted(
            (r["g"], r["rn"], r["id"], r["v"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 7)
            .collect()
        )
        got = sorted(
            (r["g"], r["rnk"], r["id"], r["v"])
            for r in grouped_topk(df, "g", "v", 7, "id").collect()
        )
        assert got == want

    def test_no_window_exec_in_plan(self, spark):
        df = spark.range(100).select(
            (F.col("id") % 5).alias("g"), F.col("id"), F.col("id").alias("v")
        )
        plan = (
            grouped_topk(df, "g", "v", 3, "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan

    def test_validation(self, spark):
        df = spark.range(5).select(
            F.lit("g").alias("g"), F.col("id"), F.col("id").alias("v")
        )
        with pytest.raises(ValueError, match="k must"):
            grouped_topk(df, "g", "v", 0, "id")
        with pytest.raises(ValueError, match="salt_buckets"):
            grouped_topk(df, "g", "v", 1, "id", salt_buckets=0)


class TestSequenceNgrams:
    def test_hand_trigrams(self, spark):
        rows = [
            (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
            (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, event_type string"
        ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
        got = sorted(
            (r["g0"], r["g1"], r["g2"], r["cnt"])
            for r in sequence_ngrams(df, n=3, top_k=10).collect()
        )
        # (a,b,c) appears in both users; (b,c,a) only in user 1;
        # no gram crosses the user boundary
        assert got == [("a", "b", "c", 2), ("b", "c", "a", 1)]

    def test_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 1, "a")], "user_id long, event_id long, event_type string"
        ).withColumn("ts", F.timestamp_seconds(F.col("event_id")))
        with pytest.raises(ValueError, match="n must"):
            sequence_ngrams(df, n=1)
        with pytest.raises(ValueError, match="top_k"):
            sequence_ngrams(df, top_k=0)


class TestTriangleCount:
    def _tc(self, spark, edges):
        from logpipe_spark.operators.graph import triangle_count

        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0]

    def test_k4_has_four_triangles(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        r = self._tc(spark, k4)
        assert (r["n_nodes"], r["n_edges"]) == (4, 6)
        assert r["n_triangles"] == 4

    def test_normalisation_direction_dups_loops(self, spark):
        # triangle 1-2-3 expressed with reversed edges, duplicates and a
        # self-loop: still exactly one triangle
        r = self._tc(spark, [(1, 2), (2, 1), (3, 2), (1, 3), (1, 3), (2, 2)])
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)

    def test_star_and_path_have_no_triangles(self, spark):
        star = [(0, i) for i in range(1, 8)]
        r = self._tc(spark, star)
        # orientation sends hub->leaf only when the hub ranks lower,
        # which it never does (deg 7 vs 1) → zero wedges at the hub
        assert (r["n_wedges"], r["n_triangles"]) == (0, 0)
        path = [(i, i + 1) for i in range(6)]
        r = self._tc(spark, path)
        assert r["n_triangles"] == 0

    def test_two_overlapping_triangles(self, spark):
        # triangles 1-2-3 and 2-3-4 share edge 2-3
        r = self._tc(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
        assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 5, 2)

    def test_empty_graph(self, spark):
        r = self._tc(spark, [(5, 5)])  # only a self-loop → empty
        assert (r["n_nodes"], r["n_edges"], r["n_wedges"],
                r["n_triangles"]) == (0, 0, 0, 0)

    def test_matches_brute_force_on_random_graph(self, spark):
        import itertools

        # deterministic pseudo-random graph on 12 nodes
        edges = [((i * 7 + 3) % 12, (i * 5 + 1) % 12) for i in range(40)]
        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        brute = sum(
            1 for a, b, c in itertools.combinations(sorted({n for e in und for n in e}), 3)
            if (a, b) in und and (a, c) in und and (b, c) in und
        )
        r = self._tc(spark, edges)
        assert r["n_triangles"] == brute
