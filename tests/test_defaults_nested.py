"""T4 recursive defaults fill (SimpleStringToGenericRecord.scala:23-70):
absent -> default at every depth; explicit null stays null; arrays and
map values recurse; defaults used verbatim."""

import pytest
from pyspark.sql import functions as F

from hydra_spark.functions.defaults import fill_defaults_json

SPEC = [
    {"name": "k", "type": "bigint", "default": 7},
    {"name": "nk", "type": "string"},  # no default: absent -> null
    {"name": "rec", "type": {"struct": [
        {"name": "a", "type": "bigint", "default": 1},
        {"name": "inner", "type": {"struct": [{"name": "z", "type": "bigint", "default": 2}]}},
    ]}},
    {"name": "cfg", "type": {"struct": [{"name": "v", "type": "bigint", "default": 3}]},
     "default": {"v": 42}},
    {"name": "arr", "type": {"array": {"struct": [{"name": "a", "type": "bigint", "default": 5}]}},
     "default": []},
    {"name": "m", "type": {"map": {"struct": [{"name": "a", "type": "bigint", "default": 9}]}}},
]


def _fill(spark, payload: str):
    df = spark.createDataFrame([(payload,)], "payload string")
    return df.select(fill_defaults_json("payload", SPEC).alias("r")).collect()[0].r


def test_absent_scalar_takes_default_explicit_null_stays(spark):
    r = _fill(spark, '{"nk": null}')
    assert r.k == 7 and r.nk is None
    r2 = _fill(spark, '{"k": null}')
    assert r2.k is None  # explicit null never overwritten by default


def test_recursion_through_present_records(spark):
    r = _fill(spark, '{"rec": {"inner": {}}}')
    assert r.rec.a == 1 and r.rec.inner.z == 2  # two depths filled
    r2 = _fill(spark, '{"rec": {"a": 10, "inner": null}}')
    assert r2.rec.a == 10 and r2.rec.inner is None


def test_record_default_vs_explicit_null(spark):
    assert _fill(spark, "{}").cfg.v == 42       # absent -> default verbatim
    assert _fill(spark, '{"cfg": {}}').cfg.v == 3  # present empty -> subfield default
    assert _fill(spark, '{"cfg": null}').cfg is None  # explicit null
    assert _fill(spark, "{}").rec is None       # absent, no default -> null


def test_array_and_map_values_recurse(spark):
    r = _fill(spark, '{"arr": [{"a": 1}, {}], "m": {"x": {}, "y": {"a": 4}}}')
    assert [e.a for e in r.arr] == [1, 5]
    assert dict(r.m)["x"].a == 9 and dict(r.m)["y"].a == 4
    assert list(_fill(spark, "{}").arr) == []   # array default verbatim
    assert _fill(spark, "{}").m is None         # no map default -> null
