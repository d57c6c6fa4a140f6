"""logpipe.conf compatibility: the reference's OWN shipped config files
(conf/*.conf — fasterjson dialect with // comments and bare unit scalars)
must parse, translate to runnable specs / sink options, and execute."""

import os

import pytest
from pyspark.sql import functions as F

from logpipe_spark.ledger import write_snapshots
from logpipe_spark.pipeline import read_sinks
from logpipe_spark.plans.conf_compat import (
    parse_logpipe_conf,
    translate_logpipe_conf,
)

CONF_DIR = "/root/reference/conf"

# the reference checkout is study material, not a build dependency — these
# tests exercise compatibility against its SHIPPED conf files when present
pytestmark = pytest.mark.skipif(
    not os.path.isdir(CONF_DIR), reason="reference conf dir not present"
)


def _conf(name: str) -> str:
    with open(os.path.join(CONF_DIR, name)) as f:
        return f.read()


def test_every_shipped_conf_parses_and_translates():
    """Every shipped conf goes through without an exception — nothing the
    reference ships is outside the dialect or the plugin map."""
    names = sorted(n for n in os.listdir(CONF_DIR) if n.endswith(".conf"))
    assert len(names) >= 10
    for name in names:
        t = translate_logpipe_conf(_conf(name))
        # no conf may fall through the plugin map unrecognized
        assert not [w for w in t.warnings if "unknown" in w], (name, t.warnings)


def test_case0_file_to_file_runs_end_to_end(spark, transcripts_pdf, rules,
                                            tmp_path):
    """case0: input-file (exclude_files glob) → output-file. Translated
    spec runs the real pipeline on fixture snapshots; every row lands in
    the single catch-all sink named after the output path."""
    src = str(tmp_path / "src")
    write_snapshots(transcripts_pdf, src, n_snapshots=2)
    t = translate_logpipe_conf(
        _conf("logpipe_case0_input_file_and_output_file.conf"),
        source_dir=src,
        out_dir=str(tmp_path / "out"),
    )
    assert t.spec is not None
    assert t.spec.exclude_files == ["*.log.*"]  # carried from the conf
    assert t.spec.rules[0]["sink"] == "log3"  # basename of the C-side path
    res = t.spec.run(spark)
    assert res["processed"] == [0, 1]
    got = read_sinks(spark, t.spec.out_dir)
    assert got.filter(F.col("sink") == "log3").count() == len(transcripts_pdf)


def test_case7_bare_unit_scalars_and_ingeek():
    """case7 uses fasterjson's bare unit tokens (10ms) — strict JSON
    rejects the file; the dialect parser must not."""
    text = _conf("logpipe_case7_input_file_and_output_ingeek.conf")
    with pytest.raises(Exception):
        import json

        json.loads(text)
    cfg = parse_logpipe_conf(text)
    assert cfg["inputs"][0]["min_usleep_interval"] == "10ms"
    t = translate_logpipe_conf(text)
    assert t.ingeek == {"ip": "158.1.0.48", "port": 5142, "key": "press3"}
    assert any("min_usleep_interval" in w for w in t.warnings)


def test_case4_es_options_carry_into_render(spark):
    """case4: output-ek's grep/translate/template/bulk options become
    render_es_bulk kwargs, and the rendered payload honors them."""
    from logpipe_spark.operators.writers import render_es_bulk

    t = translate_logpipe_conf(_conf("logpipe_case4_input_file_and_output_es.conf"))
    assert t.es_render["translate"] == "[]"
    assert "$11" in t.es_render["doc_template"]
    assert t.es_target["port"] == 9200 and t.es_target["index"] == "ecif_platform"
    # iconv options must be surfaced, not dropped
    assert any("iconv" in w for w in t.warnings)

    df = spark.createDataFrame(
        [(i, " ".join(f"f{i}_{j}" for j in range(24))) for i in range(4)],
        "k long, text string",
    )
    kwargs = {k: v for k, v in t.es_render.items() if v is not None}
    payloads = render_es_bulk(df, key_col=F.col("k"), order_col="k",
                              **kwargs).collect()
    assert payloads and all('{"index":{}}' in r["payload"] for r in payloads)
    assert any("f0_11" in r["payload"] for r in payloads)  # $11 substituted


def test_case2_tcp_output_and_case9_kafka_input():
    t = translate_logpipe_conf(_conf("logpipe_case2_input_file_and_output_tcp.conf"))
    assert t.tcp_peers == [("127.0.0.1", 10101)]
    assert t.spec is None  # tcp has no batch landing dir without out_dir

    t9 = translate_logpipe_conf(
        _conf("logpipe_case9_input_kafka_and_output_stdout.conf")
    )
    assert [s[0] for s in t9.live_sources] == ["kafka_source"]
    assert t9.console


def test_dialect_parser_is_json_superset():
    """parse_logpipe_conf must agree with json.loads on every strict-JSON
    document (the dialect only ADDS comment lines and bare unit scalars) —
    property-tested over recursive JSON values."""
    import json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = (st.none() | st.booleans()
               | st.integers(min_value=-10**9, max_value=10**9)
               | st.floats(allow_nan=False, allow_infinity=False)
               | st.text(max_size=20))
    values = st.recursive(
        scalars,
        lambda kids: st.lists(kids, max_size=4)
        | st.dictionaries(st.text(max_size=8), kids, max_size=4),
        max_leaves=12,
    )

    @settings(max_examples=150, deadline=None)
    @given(values)
    def check(v):
        text = json.dumps(v, indent=1)
        assert parse_logpipe_conf(text) == v

    check()


def test_bare_unit_requote_leaves_string_literals_alone():
    """The JSON-superset property must hold even when a string VALUE
    contains text shaped like a bare unit scalar (the r4 parser re-quoted
    inside string literals and broke on this)."""
    doc = {"cmd": "sleep: 10ms, then go", "note": 'quoted "x: 5s," inside'}
    import json as _json

    assert parse_logpipe_conf(_json.dumps(doc)) == doc
    # ...while a genuinely bare scalar next to such a string still re-quotes
    mixed = '{ "cmd":"wait: 3ms, ok" , "read_full_file_time":10s }'
    assert parse_logpipe_conf(mixed) == {
        "cmd": "wait: 3ms, ok", "read_full_file_time": "10s",
    }


def test_es_bulk_enabled_unless_false_or_no():
    """logpipe-output-es.c:202-204: bulk is on whenever the key is present
    and not "false"/"no" — bulk:"yes" must NOT warn; absence and explicit
    negatives must."""
    base = ('{{ "outputs":[ {{ "plugin":"so/logpipe-output-es.so",'
            '"ip":"h","port":9200,"index":"i","type":"t"{bulk} }} ] }}')

    def warns(bulk_frag):
        t = translate_logpipe_conf(base.format(bulk=bulk_frag))
        return any("bulk" in w for w in t.warnings)

    assert not warns(',"bulk":"true"')
    assert not warns(',"bulk":"yes"')   # r4 spuriously warned on this
    assert not warns(',"bulk":"1"')
    assert warns("")                    # absent -> disabled
    assert warns(',"bulk":"false"')
    assert warns(',"bulk":"no"')


def test_tcp_peer_collection_matches_reference():
    """logpipe-output-tcp.c:57-99: collection stops at the first missing
    ipN, and a present ipN with a missing portN is a hard error (never a
    silent fallback to the base port)."""
    import pytest

    def tr(peer_frag):
        return translate_logpipe_conf(
            '{ "outputs":[ { "plugin":"so/logpipe-output-tcp.so",'
            + peer_frag + " } ] }"
        )

    # gap at ip2: ip3 is ignored, not collected past the gap
    t = tr('"ip":"a","port":1,"ip3":"c","port3":3')
    assert t.tcp_peers == [("a", 1)]
    # ip2 present without port2: reference errors out
    with pytest.raises(ValueError, match="port2"):
        tr('"ip":"a","port":1,"ip2":"b"')
