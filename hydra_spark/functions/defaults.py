"""Recursive schema-defaults fill for JSON payloads (T4).

Hydra fills absent fields from Avro schema defaults RECURSIVELY through
records, unions, arrays and maps while converting JSON payloads to typed
records (reference: avro/src/main/scala/hydra/avro/convert/
SimpleStringToGenericRecord.scala:23-70 handleRecord/handleUnion/
handleArray/handleMap + defaultToJson:99-135). The load-bearing
semantics, reproduced here:

  * a field ABSENT from the payload takes its declared default; with no
    default it becomes NULL (the nullable-union branch);
  * a field PRESENT with an explicit ``null`` stays NULL — explicit
    null is never overwritten by a default (handleUnion: JsNull passes
    through before any default logic);
  * recursion descends into PRESENT records (their own absent subfields
    fill), into every array element, and into every map value;
  * a defaulted record/array/map default value is used verbatim
    (defaultToJson converts field.defaultVal() as-is — no re-fill).

Spark-first shape: the payload parses ONCE via ``from_json`` with the
full derived schema (JVM-side); presence of each field is a
``json_object_keys``/``array_contains`` predicate on the raw JSON
subtree (also JVM-side); the output struct is rebuilt with plan-time
recursion over the STATIC field spec — zero Python at runtime, the
whole fill is one whole-stage-codegen projection.

One documented deviation: inside ARRAY elements and MAP values the
typed view cannot distinguish explicit-null from absent (both parse to
NULL), so a defaulted subfield fills in both cases there. At record
depth — any nesting of structs — the distinction is exact, because
presence tests run against the JSON text.

Field spec format (the Avro-schema analog):
    {"name": str,
     "type": ddl-string | {"struct": [field...]}
                        | {"array": type} | {"map": type},
     "default": any JSON-encodable value (optional)}
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F, types as T


def spark_type(t) -> T.DataType:
    """Field-spec type -> Spark DataType (maps are string-keyed, like
    Avro maps)."""
    if isinstance(t, dict):
        if "struct" in t:
            return T.StructType(
                [T.StructField(f["name"], spark_type(f["type"])) for f in t["struct"]]
            )
        if "array" in t:
            return T.ArrayType(spark_type(t["array"]))
        if "map" in t:
            return T.MapType(T.StringType(), spark_type(t["map"]))
        raise ValueError(f"bad type spec: {t}")
    # public-API ddl parse for scalar type strings
    return T.StructType.fromDDL(f"x {t}")[0].dataType


def _default_lit(f: dict) -> Column:
    """Declared default -> typed Column (used verbatim, like
    defaultToJson). No default -> typed NULL (nullable-union branch)."""
    dt = spark_type(f["type"])
    if "default" not in f:
        return F.lit(None).cast(dt)
    d = f["default"]
    if isinstance(d, (dict, list)):
        # complex defaults round-trip through JSON — one literal parse,
        # constant-folded by Catalyst
        return F.from_json(F.lit(json.dumps(d)), dt)
    return F.lit(d).cast(dt)


def _fill_typed(col: Column, t) -> Column:
    """Default fill on an already-typed value (array elements / map
    values — no JSON presence information at this depth, see module
    docstring)."""
    if isinstance(t, dict) and "struct" in t:
        rebuilt = F.struct(
            *[
                # recurse FIRST (handleRecord descends into present
                # values even when the field carries a default), then
                # let the default cover the absent/null case
                (
                    F.coalesce(_fill_typed(col.getField(f["name"]), f["type"]), _default_lit(f))
                    if "default" in f
                    else _fill_typed(col.getField(f["name"]), f["type"])
                ).alias(f["name"])
                for f in t["struct"]
            ]
        )
        return F.when(col.isNotNull(), rebuilt)  # null element stays null
    if isinstance(t, dict) and "array" in t:
        return F.transform(col, lambda x: _fill_typed(x, t["array"]))
    if isinstance(t, dict) and "map" in t:
        return F.transform_values(col, lambda _k, v: _fill_typed(v, t["map"]))
    return col


def _fill_struct(typed: Column, json_str: Column, fields: list[dict]) -> Column:
    """Presence-aware recursive fill at record depth (handleRecord)."""
    keys = F.coalesce(F.json_object_keys(json_str), F.array().cast("array<string>"))
    out = []
    for f in fields:
        name, t = f["name"], f["type"]
        present = F.array_contains(keys, name)
        tf = typed.getField(name)
        if isinstance(t, dict) and "struct" in t:
            child_json = F.get_json_object(json_str, f"$.{name}")
            filled = F.when(~present, _default_lit(f)).otherwise(
                # present: explicit null stays null; an object recurses
                F.when(tf.isNotNull(), _fill_struct(tf, child_json, t["struct"]))
            )
        elif isinstance(t, dict) and ("array" in t or "map" in t):
            filled = F.when(~present, _default_lit(f)).otherwise(
                F.when(tf.isNotNull(), _fill_typed(tf, t))
            )
        else:
            filled = F.when(present, tf).otherwise(_default_lit(f))
        out.append(filled.alias(name))
    return F.struct(*out)


def fill_defaults_json(payload, fields: list[dict]) -> Column:
    """JSON payload column -> typed struct with schema defaults filled
    recursively (the SimpleStringToGenericRecord conversion as one
    Catalyst projection). ``payload``: column or name."""
    p = F.col(payload) if isinstance(payload, str) else payload
    schema = T.StructType([T.StructField(f["name"], spark_type(f["type"])) for f in fields])
    return _fill_struct(F.from_json(p, schema), p, fields)
