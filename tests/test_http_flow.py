"""Live HTTP ingest endpoint: reference status mapping, spool atomicity,
handler-vs-engine verdict parity, and the streaming tail."""

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from hydra_spark import http_flow

SCHEMA = "k STRING, v INT"


def _post(addr, body, topic="clips", corr=None):
    req = urllib.request.Request(
        f"{addr}/v2/topics/{topic}/records",
        data=body.encode("utf-8"),
        headers={"hydra-correlation-id": corr} if corr else {},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture()
def server(tmp_path):
    s = http_flow.IngestHttpServer(
        str(tmp_path / "spool"), key_path="$.k", max_bytes=64
    )
    yield s
    s.close()


def test_status_mapping_and_spool(spark, server):
    cases = [
        ('{"k": "a", "v": 1}', 200),          # valid
        ('{"k": "b", "v": 2}   trailing', 200),  # from_json-lenient
        ("{nope", 400),                        # malformed
        ("42", 400),                           # scalar, not an object
        ('{"v": 3}', 400),                     # missing key
        ('{"k": "big", "pad": "%s"}' % ("x" * 80), 413),  # oversize
    ]
    for i, (body, want) in enumerate(cases):
        got, rep = _post(server.address, body, corr=f"r{i}")
        assert got == want, body
        assert rep["correlationId"] == f"r{i}"
    # wrong path: 404, never spooled
    st, _ = _post(server.address + "", '{"k":"x"}', topic="../evil")
    assert st == 404 or st == 400  # path regex rejects; stdlib may normalize

    server.flush()
    spooled = http_flow.requests_batch(spark, server.spool_dir)
    rows = {r["correlation_id"]: r for r in spooled.collect()}
    assert set(rows) == {f"r{i}" for i in range(len(cases))}
    assert all(rows[f"r{i}"]["http_status"] == want for i, (_, want) in enumerate(cases))
    assert all(rows[f"r{i}"]["topic"] == "clips" for i in range(len(cases)))


def test_handler_engine_parity(spark, server):
    bodies = [
        '{"k": "a", "v": 1}',
        '{"k": "b"}',
        "{malformed",
        "[1, 2, 3]",
        '{"v": 9}',
        '{"k": null, "v": 1}',  # null key: both sides must say 400
        '{"k": "pad", "pad": "%s"}' % ("y" * 80),
        '{"k": "c", "v": 2}  #garbage',
        "",        # empty body: MissingPayload on both sides
        "   \t ",  # whitespace-only: from_json NULL-struct, raw_decode error
        "null",    # literal null: whole-NULL parse must be 400, not 200
    ]
    for i, b in enumerate(bodies):
        _post(server.address, b, corr=f"p{i}")
    server.flush()
    spooled = http_flow.requests_batch(spark, server.spool_dir)
    par = http_flow.status_parity(spooled, SCHEMA, key_path="$.k", max_bytes=64)
    got = par.agg(F.count("*").alias("n"), F.sum("agree").alias("ok")).first()
    assert got["n"] == len(bodies)
    if got["ok"] != got["n"]:
        bad = par.where(F.col("agree") == 0).collect()
        raise AssertionError(f"handler/engine verdicts diverge: {bad}")


def test_streaming_tail(spark, server, tmp_path):
    for i in range(5):
        _post(server.address, json.dumps({"k": f"s{i}", "v": i}), corr=f"s{i}")
    server.flush()
    out = str(tmp_path / "out")

    def run_pass():
        q = (
            http_flow.requests_stream(spark, server.spool_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    assert run_pass().count() == 5
    # new traffic lands in the NEXT availableNow pass — file-source tail
    # resumes from the checkpoint and replays only the delta
    for i in range(3):
        _post(server.address, json.dumps({"k": f"t{i}", "v": i}), corr=f"t{i}")
    server.flush()
    got = run_pass()
    assert got.count() == 8
    assert got.select("correlation_id").distinct().count() == 8


def test_wire_cap_refused_before_read(tmp_path):
    """A forged multi-GB Content-Length is answered 413 WITHOUT reading
    (the tiny actual body would block a full read forever), and a
    malformed length header gets 400 — neither request is spooled."""
    import glob
    import http.client

    s = http_flow.IngestHttpServer(str(tmp_path / "sp"), auto_flush_every=1)
    try:
        for hdr, want in [(str(http_flow.MAX_WIRE_BYTES + 1), 413), ("nope", 400)]:
            c = http.client.HTTPConnection(
                s.address.removeprefix("http://"), timeout=10
            )
            c.putrequest("POST", "/v2/topics/clips/records")
            c.putheader("Content-Length", hdr)
            c.endheaders()
            c.send(b"{}")  # far short of the claimed length
            assert c.getresponse().status == want
            c.close()
        s.flush()
        assert not glob.glob(str(tmp_path / "sp" / "*.json"))
        # the server is still healthy for normal traffic afterwards
        st, _ = _post(s.address, '{"a": 1}')
        assert st == 200
    finally:
        s.close()


def test_auto_flush(tmp_path):
    s = http_flow.IngestHttpServer(str(tmp_path / "sp"), auto_flush_every=2)
    try:
        _post(s.address, '{"a": 1}')
        import glob
        assert not glob.glob(str(tmp_path / "sp" / "*.json"))
        _post(s.address, '{"a": 2}')  # second request trips the flush
        assert len(glob.glob(str(tmp_path / "sp" / "*.json"))) == 1
    finally:
        s.close()


def test_exotic_key_path_refused_at_construction(tmp_path):
    """The synchronous handler can only mirror plain dotted JsonPaths;
    anything else must fail loudly at server construction instead of
    silently diverging from the engine verdict."""
    for bad in ("$.items[0].id", "k", "$['k']", "$.", "$.a-b"):
        with pytest.raises(ValueError, match="key_path"):
            http_flow.IngestHttpServer(str(tmp_path / "sp"), key_path=bad)
    # plain dotted paths still construct
    http_flow.IngestHttpServer(str(tmp_path / "ok"), key_path="$.a.b_2").close()
