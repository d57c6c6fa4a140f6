"""HTML → text extraction (operators/html.py): rule chain semantics,
entity order, plan shape, and DuckDB mirror parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from logpipe_spark.operators.html import extract_text, html_rules_sql

DOCS = [
    (0, "<html><head><style>p {color:red}</style>"
        "<script type='text/js'>var x = '<p>not text</p>';</script>"
        "</head><body><h1>Title</h1><p>First para.</p>\n"
        "<div>Block <b>bold</b> text</div><ul><li>item one</li>"
        "<li>item two</li></ul></body></html>"),
    (1, "a &amp;lt; b, 1 &lt; 2, &quot;q&quot;, it&#39;s, x&nbsp;y, "
        "AT&amp;T"),
    (2, "<!-- hidden <p>comment</p> -->visible<br>next line"),
    (3, "plain text, no markup"),
    (4, ""),
]


def _extracted(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, html string")
    return {r["doc_id"]: r for r in extract_text(df).collect()}


class TestStripHtml:
    def test_blocks_structure_and_tags(self, spark):
        rows = _extracted(spark)
        t = rows[0]["text"]
        assert "color:red" not in t and "not text" not in t
        assert "Title" in t and "First para." in t
        assert "Block bold text" in t
        # block closers became line breaks
        assert "item one\nitem two" in t

    def test_entities_decode_amp_last(self, spark):
        rows = _extracted(spark)
        t = rows[1]["text"]
        assert "a &lt; b" in t          # &amp;lt; → &lt; (NOT '<')
        assert "1 < 2" in t
        assert '"q"' in t and "it's" in t and "x y" in t
        assert "AT&T" in t

    def test_comments_and_plain(self, spark):
        rows = _extracted(spark)
        assert "comment" not in rows[2]["text"]
        assert "visible\nnext line" == rows[2]["text"]
        assert rows[3]["text"] == "plain text, no markup"
        assert rows[4]["text"] == "" and rows[4]["text_chars"] == 0

    def test_plan_is_map_only(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, html string")
        plan = (
            extract_text(df)._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_duckdb_mirror_parity(self, spark):
        got = {
            k: (r["text"], r["text_chars"]) for k, r in _extracted(spark).items()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE d(doc_id BIGINT, html VARCHAR)"
        )
        con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
        sql = html_rules_sql("html")
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                f"SELECT doc_id, {sql} AS t, length({sql}) FROM d"
            ).fetchall()
        }
        assert got == want


def test_fuzz_parity_spark_vs_duckdb(spark):
    """Seeded random HTML-ish soup through BOTH engines' rule chains —
    the divergence class that matters here is Java-regex vs RE2
    semantics ((?is) scoping, lazy quantifiers across newlines, class
    escapes), and a few hundred adversarial strings cover it far better
    than hand cases."""
    import random

    rng = random.Random(0xC0FFEE)
    atoms = [
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "<br>", "</p>", "</div>", "</li>", "<p>", "<div class='x'>",
        "<", ">", "&", "&amp;", "&lt;", "&gt;", "&quot;", "&#39;",
        "&nbsp;", "&amp;lt;", "word", "Zz9", " ", "  ", "\n", "\t",
        "\r", "a<b", "x>y", "</h3>", "<h1>", "<sCrIpT>", "</ScRiPt>",
        "<not a tag", "-->stray", "<!--unclosed",
    ]
    docs = [
        (i, "".join(rng.choice(atoms) for _ in range(rng.randint(0, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, html string")
    got = {
        r["doc_id"]: r["text"]
        for r in extract_text(df).select("doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    want = dict(
        con.execute(
            f"SELECT doc_id, {html_rules_sql('html')} FROM d"
        ).fetchall()
    )
    mismatches = {k for k in got if got[k] != want[k]}
    assert not mismatches, {k: (got[k], want[k]) for k in list(mismatches)[:3]}
