"""Conversation assembly + loss-mask spans (operators/transcripts.py)."""

from pyspark.sql import functions as F

from logpipe_spark.operators.transcripts import assemble_documents, turn_spans

ROWS = [
    # (conv_id, turn_idx, role, text)
    (1, 0, "user", "hi"),
    (1, 1, "assistant", "hello there"),
    (1, 2, "user", ""),          # empty turn still owns a span
    (1, 3, "assistant", "bye"),
    (2, 7, "user", "solo"),      # non-contiguous order values are fine
]
SCHEMA = "conv_id long, turn_idx long, role string, text string"


def test_assemble_order_and_counts(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {r["conv_id"]: (r["doc"], r["n_turns"])
           for r in assemble_documents(df).collect()}
    assert got[1] == ("hi\nhello there\n\nbye", 4)
    assert got[2] == ("solo", 1)


def test_assemble_deterministic_under_repartition(spark):
    """collect_list alone is partition-arrival-ordered; the array_sort
    contract must make assembly independent of physical layout."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = assemble_documents(df.repartition(7)).collect()
    b = assemble_documents(df.coalesce(1)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_turn_spans_slice_invariant(spark):
    """doc[start:end] == turn text, for every turn — the property a
    loss mask depends on."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    docs = {r["conv_id"]: r["doc"] for r in assemble_documents(df).collect()}
    spans = turn_spans(df).collect()
    texts = {(c, t): x for c, t, _, x in ROWS}
    assert len(spans) == len(ROWS)
    for r in spans:
        doc = docs[r["conv_id"]]
        assert doc[r["start"]:r["end"]] == texts[(r["conv_id"], r["turn_idx"])]
    # assistant-mask view: spans are disjoint and in order per conv
    conv1 = sorted(
        [(r["start"], r["end"]) for r in spans if r["conv_id"] == 1]
    )
    assert all(a_end <= b_start for (_, a_end), (b_start, _) in zip(conv1, conv1[1:]))


def test_fuzz_assemble_and_spans_vs_python_oracle(spark):
    """Seeded random conversations (adversarial texts: unicode, empties,
    newlines INSIDE turns, non-contiguous turn indexes) — assembled doc
    and every span must match a pure-Python oracle, and the slice
    invariant must hold even when turn text contains the separator."""
    import random

    rng = random.Random(0x5EED)
    chars = list("ab 0.|$*?\t") + ["é", "模", "\n", ""]
    rows = []
    for conv in range(40):
        idxs = rng.sample(range(100), rng.randint(1, 12))
        for t in idxs:
            rows.append(
                (conv, t, rng.choice(["user", "assistant"]),
                 "".join(rng.choice(chars) for _ in range(rng.randint(0, 12))))
            )
    df = spark.createDataFrame(rows, SCHEMA)

    # python oracle
    convs = {}
    for c, t, r, x in rows:
        convs.setdefault(c, []).append((t, x))
    want_docs = {c: "\n".join(x for _, x in sorted(ts)) for c, ts in convs.items()}
    want_spans = {}
    for c, ts in convs.items():
        off = 0
        for t, x in sorted(ts):
            want_spans[(c, t)] = (off, off + len(x))
            off += len(x) + 1

    got_docs = {r["conv_id"]: r["doc"] for r in assemble_documents(df).collect()}
    assert got_docs == want_docs
    got = {(r["conv_id"], r["turn_idx"]): (r["start"], r["end"])
           for r in turn_spans(df).collect()}
    assert got == want_spans
    # slice invariant (doc may contain '\n' inside turns — spans still exact)
    texts = {(c, t): x for c, t, _, x in rows}
    for (c, t), (s, e) in got.items():
        assert got_docs[c][s:e] == texts[(c, t)]


def test_assemble_plan_single_exchange_no_window(spark):
    """One hash shuffle on the conversation key, no Window operator —
    assembly must never sort whole partitions to order turns."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = assemble_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_turn_spans_token_unit(spark):
    """unit='tokens': doc.split()[start:end] equals the turn's own
    tokens — the form a token budget masks by. Empty turns own empty
    spans; a non-whitespace sep is rejected."""
    import pytest as _pytest

    df = spark.createDataFrame(ROWS, SCHEMA)
    docs = {r["conv_id"]: r["doc"] for r in assemble_documents(df).collect()}
    spans = turn_spans(df, unit="tokens").collect()
    texts = {(c, t): x for c, t, _, x in ROWS}
    for r in spans:
        doc_toks = docs[r["conv_id"]].split()
        own_toks = texts[(r["conv_id"], r["turn_idx"])].split()
        assert doc_toks[r["start"]:r["end"]] == own_toks
    empty = [r for r in spans if (r["conv_id"], r["turn_idx"]) == (1, 2)][0]
    assert empty["start"] == empty["end"]

    with _pytest.raises(ValueError, match="whitespace sep"):
        turn_spans(df, sep="|", unit="tokens").collect()
    with _pytest.raises(ValueError, match="chars.*tokens"):
        turn_spans(df, unit="bytes").collect()
