"""Avro binary wire format: golden bytes from the spec, round-trip
properties, corrupt-payload quarantine, Confluent framing."""

import json
import struct

import pytest
from pyspark.sql import functions as F

from hydra_spark.functions import avro_wire as W

SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "Order",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "status", "type": "string"},
            {"name": "price", "type": "double"},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
)
DESC = W.parse_schema(SCHEMA)


# ------------------------------------------------------- golden bytes

def test_golden_zigzag_varints():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
             2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    d = W._norm("long")
    for v, want in cases.items():
        out = bytearray()
        W._encode_value(out, d, v)
        assert bytes(out) == want, v
        assert W._decode_value(W._Reader(want), d) == v


def test_golden_record():
    # k=1 -> 02 ; status="AB" -> 04 41 42 ; price=1.0 -> 8 LE bytes ;
    # note=null -> union branch 0 -> 00
    b = W.encode_record(DESC, {"k": 1, "status": "AB", "price": 1.0, "note": None})
    assert b == b"\x02\x04AB" + struct.pack("<d", 1.0) + b"\x00"
    # note="x" -> branch 1 (02) + string "x" (02 78)
    b2 = W.encode_record(DESC, {"k": 1, "status": "", "price": 0.0, "note": "x"})
    assert b2 == b"\x02\x00" + struct.pack("<d", 0.0) + b"\x02\x02x"


def test_golden_array_and_bool():
    d = W._norm({"type": "array", "items": "int"})
    out = bytearray()
    W._encode_value(out, d, [3, -3])
    # block count 2 -> 04 ; 3 -> 06 ; -3 -> 05 ; end 00
    assert bytes(out) == b"\x04\x06\x05\x00"
    assert W._decode_value(W._Reader(bytes(out)), d) == [3, -3]
    # negative block count with byte size (writer variant) decodes too
    alt = b"\x03\x04\x06\x05\x00"  # count=-2, size=2, items, end
    assert W._decode_value(W._Reader(alt), d) == [3, -3]
    db = W._norm("boolean")
    ob = bytearray()
    W._encode_value(ob, db, True)
    assert bytes(ob) == b"\x01"


def test_roundtrip_unicode_bytes_nested():
    schema = json.dumps(
        {
            "type": "record",
            "name": "N",
            "fields": [
                {"name": "s", "type": "string"},
                {"name": "b", "type": "bytes"},
                {"name": "xs", "type": {"type": "array", "items": "double"}},
                {
                    "name": "inner",
                    "type": {
                        "type": "record",
                        "name": "I",
                        "fields": [{"name": "v", "type": ["null", "long"]}],
                    },
                },
            ],
        }
    )
    desc = W.parse_schema(schema)
    row = {"s": "héllo ✓", "b": b"\x00\xff\x10", "xs": [1.5, -2.25, 0.0],
           "inner": {"v": -7}}
    assert W.decode_record(desc, W.encode_record(desc, row)) == row
    row2 = {"s": "", "b": b"", "xs": [], "inner": {"v": None}}
    assert W.decode_record(desc, W.encode_record(desc, row2)) == row2


def test_corrupt_payloads_raise_value_error():
    good = W.encode_record(DESC, {"k": 5, "status": "ok", "price": 2.5, "note": None})
    for bad in (good[:-1], good[:3], b"", good + b"\x00", b"\xff" * 12):
        with pytest.raises(ValueError):
            W.decode_record(DESC, bad)


def test_confluent_framing():
    row = {"k": 9, "status": "s", "price": 1.0, "note": None}
    framed = W.encode_record(DESC, row, confluent_id=42)
    assert framed[:5] == b"\x00\x00\x00\x00\x2a"
    assert W.decode_record(DESC, framed, confluent_id=42) == row
    with pytest.raises(ValueError, match="schema id mismatch"):
        W.decode_record(DESC, framed, confluent_id=43)
    with pytest.raises(ValueError, match="magic"):
        W.decode_record(DESC, b"\x01" + framed[1:], confluent_id=42)


def test_logical_types_ride_base():
    schema = json.dumps(
        {
            "type": "record",
            "name": "L",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "u", "type": {"type": "string", "logicalType": "uuid"}},
            ],
        }
    )
    desc = W.parse_schema(schema)
    row = {"ts": 1735689600000000, "u": "de305d54-75b4-431b-adb2-eb6b9e546014"}
    assert W.decode_record(desc, W.encode_record(desc, row)) == row


# --------------------------------------------------- distributed stages

def test_spark_roundtrip_and_quarantine(spark):
    src = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("status"),
        (F.col("id") * 1.25).alias("price"),
        F.when(F.col("id") % 3 == 0, F.concat(F.lit("n"), F.col("id").cast("string"))).alias("note"),
    )
    enc = W.encode_records(src, SCHEMA, ["k", "status", "price", "note"], confluent_id=7)
    # corrupt every 10th payload by truncating it
    wire = enc.select(
        "k",
        F.when(F.col("k") % 10 == 0, F.expr("substring(avro, 1, 4)"))
        .otherwise(F.col("avro"))
        .alias("avro"),
    )
    dec = W.decode_records(
        wire.withColumnRenamed("k", "orig_k"),
        SCHEMA,
        keep_cols=["orig_k"],
        confluent_id=7,
    )
    rows = {r["orig_k"]: r for r in dec.collect()}
    assert len(rows) == 200
    for k, r in rows.items():
        if k % 10 == 0:
            assert r["decode_error"] is not None and r["k"] is None
        else:
            assert r["decode_error"] is None
            assert r["k"] == k and r["status"] == f"s{k % 7}"
            assert r["price"] == k * 1.25
            assert r["note"] == (f"n{k}" if k % 3 == 0 else None)


# ------------------------------------------------------ property tests

from hypothesis import given, settings, strategies as st  # noqa: E402

_ROWS = st.fixed_dictionaries(
    {
        "k": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "status": st.text(max_size=40),
        "price": st.floats(allow_nan=False, allow_infinity=True, width=64),
        "note": st.none() | st.text(max_size=40),
    }
)


@settings(max_examples=200, deadline=None)
@given(_ROWS)
def test_prop_roundtrip_identity(row):
    assert W.decode_record(DESC, W.encode_record(DESC, row)) == row


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_prop_garbage_never_escapes_value_error(payload):
    # decode of arbitrary bytes must either produce a record or raise
    # ValueError (the quarantine contract) — never IndexError/OverflowError/
    # UnicodeDecodeError or an infinite loop
    try:
        W.decode_record(DESC, payload)
    except ValueError:
        pass


_ARR_DESC = W.parse_schema(json.dumps(
    {"type": "record", "name": "A",
     "fields": [{"name": "xs", "type": {"type": "array", "items": "int"}}]}
))


def test_forged_array_count_rejected_fast():
    # count zigzag-encoded 2^50 followed by nothing: must be ValueError,
    # not a 2^50-iteration loop or allocation
    forged = bytearray()
    W._w_varint(forged, W._zigzag(1 << 50))
    with pytest.raises(ValueError, match="block count"):
        W.decode_record(_ARR_DESC, bytes(forged))


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_prop_array_garbage_never_escapes(payload):
    try:
        W.decode_record(_ARR_DESC, payload)
    except ValueError:
        pass


# --------------------------------------------- adversarial / edge wire

def test_varint_overflow_rejected():
    # 10-byte varint accumulating past 64 bits is forged, never legal
    forged = b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x7f"
    with pytest.raises(ValueError, match="64 bits"):
        W._Reader(forged).varint()
    # the full uint64 zigzag range still decodes
    top = bytearray()
    W._w_varint(top, 2**64 - 1)
    assert W._Reader(bytes(top)).varint() == W._unzigzag(2**64 - 1)


def test_int_field_range_enforced():
    import json as _json
    sch = _json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "i", "type": "int"}]}
    )
    desc = W.parse_schema(sch)
    # encode: a python long past int32 must refuse, not silently widen
    with pytest.raises(ValueError, match="out of range"):
        W.encode_record(desc, {"i": 2**31})
    assert W.decode_record(desc, W.encode_record(desc, {"i": -(2**31)})) == {
        "i": -(2**31)
    }
    # decode: a wire varint past int32 under an int reader must refuse
    wire = bytearray()
    W._w_varint(wire, W._zigzag(2**40))
    with pytest.raises(ValueError, match="int32"):
        W.decode_record(desc, bytes(wire))
    # long fields keep the full 64-bit range
    with pytest.raises(ValueError, match="out of range"):
        W.encode_record(DESC, {"k": 2**63, "status": "", "price": 0.0, "note": None})


def test_nan_is_null_branch_in_nullable_union(spark):
    """pandas collapses SQL NULL in nullable numeric columns to NaN;
    the encoder must emit the null branch, so NULL survives an Arrow
    round-trip instead of becoming NaN."""
    import json as _json
    sch = _json.dumps(
        {
            "type": "record",
            "name": "N",
            "fields": [
                {"name": "k", "type": "long"},
                {"name": "d", "type": ["null", "double"]},
                {"name": "n", "type": ["null", "long"]},
            ],
        }
    )
    src = spark.range(6).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 1.5).alias("d"),
        F.when(F.col("id") % 3 == 0, F.col("id") * 10).alias("n"),
    )
    enc = W.encode_records(src, sch, ["k", "d", "n"])
    assert enc.where(F.col("encode_error").isNotNull()).count() == 0
    dec = W.decode_records(enc.select("avro"), sch)
    rows = {r["k"]: r for r in dec.collect()}
    assert len(rows) == 6 and all(r["decode_error"] is None for r in rows.values())
    for k, r in rows.items():
        assert r["d"] == (k * 1.5 if k % 2 == 0 else None)
        assert r["n"] == (k * 10 if k % 3 == 0 else None)


def test_encode_quarantine_not_job_kill(spark):
    """A row the schema cannot represent becomes an encode_error row;
    the batch and the job survive."""
    import json as _json
    sch = _json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "i", "type": "int"}]}
    )
    src = spark.range(10).select(
        F.when(F.col("id") == 7, F.lit(2**40)).otherwise(F.col("id")).alias("i")
    )
    enc = W.encode_records(src, sch, ["i"])
    rows = {r["i"]: r for r in enc.collect()}
    assert rows[2**40]["avro"] is None and "out of range" in rows[2**40]["encode_error"]
    ok = [r for r in rows.values() if r["i"] != 2**40]
    assert len(ok) == 9 and all(r["encode_error"] is None and r["avro"] for r in ok)


def test_keep_cols_collision_refused(spark):
    src = spark.range(3).select(
        F.col("id").alias("k"),
        F.lit("s").alias("status"),
        F.lit(1.0).alias("price"),
        F.lit(None).cast("string").alias("note"),
    )
    enc = W.encode_records(src, SCHEMA, ["k", "status", "price", "note"])
    with pytest.raises(ValueError, match="collide"):
        W.decode_records(enc, SCHEMA, keep_cols=["k"])
    with pytest.raises(ValueError, match="collide"):
        W.decode_records(enc.withColumnRenamed("encode_error", "decode_error"),
                         SCHEMA, keep_cols=["decode_error"])
