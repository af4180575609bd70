"""JSON shredding: inference, type fidelity, ragged records, arrays."""

from __future__ import annotations

import pyspark.sql.functions as F

from iceberg_geo_poc_spark.operators import semistructured as SS


def _docs(spark, payloads):
    return spark.createDataFrame(
        list(enumerate(payloads)), "doc_id LONG, payload STRING"
    )


def test_infer_discovers_types_and_widens(spark):
    df = _docs(
        spark,
        [
            '{"n": 1, "x": 1.5, "s": "a", "b": true, "meta": {"lang": "en"}}',
            '{"n": 2.5, "s": "b", "extra": null}',
        ],
    )
    fields = dict(SS.infer_json_fields(df, "payload"))
    assert fields["n"] == "DOUBLE", "int + float widens to DOUBLE"
    assert fields["x"] == "DOUBLE"
    assert fields["s"] == "STRING"
    assert fields["b"] == "BOOLEAN"
    assert fields["meta.lang"] == "STRING", "nested paths walk"
    assert "extra" not in fields, "null-only keys are not scalar leaves"


def test_shred_typed_columns_and_ragged_nulls(spark):
    df = _docs(
        spark,
        [
            '{"id": 7, "score": 0.5, "lang": "en", "meta": {"ok": true}}',
            '{"id": 8, "lang": "de"}',
            '{"id": "not-an-int", "lang": "fr"}',
        ],
    )
    out = SS.shred_json(
        df,
        "payload",
        fields=[
            ("id", "BIGINT"),
            ("score", "DOUBLE"),
            ("lang", "STRING"),
            ("meta.ok", "BOOLEAN"),
        ],
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].id == 7 and rows[0].score == 0.5 and rows[0].meta_ok is True
    assert rows[1].score is None and rows[1].meta_ok is None, "missing -> NULL"
    assert rows[2].id is None, "type mismatch -> NULL, never an error"
    assert [f.dataType.simpleString() for f in out.schema if f.name == "id"] == [
        "bigint"
    ]
    assert "payload" in out.columns, "residual survives by default"
    assert "payload" not in SS.shred_json(
        df, "payload", fields=[("id", "BIGINT")], keep_residual=False
    ).columns


def test_shred_inferred_roundtrips_values(spark):
    base = spark.createDataFrame(
        [(i, f"l{i % 3}", i * 10) for i in range(50)],
        "doc_id LONG, lang STRING, n LONG",
    )
    js = base.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "lang", "n")).alias("payload"),
    )
    out = SS.shred_json(js, "payload")
    got = {r.doc_id: (r.lang, r.n) for r in out.collect()}
    want = {r.doc_id: (r.lang, r.n) for r in base.collect()}
    assert got == want


def test_shred_json_array_positions(spark):
    df = _docs(
        spark,
        ['{"tags": ["a", "b", "c"]}', '{"tags": []}', '{"notags": 1}'],
    )
    out = SS.shred_json_array(df, "payload", "tags").collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.pos, r.value))
    assert by_doc[0] == [(0, "a"), (1, "b"), (2, "c")]
    # outer explode keeps empty/missing docs as a single null row
    assert by_doc[1] == [(None, None)]
    assert by_doc[2] == [(None, None)]


def test_variant_typed_extraction(spark):
    df = _docs(
        spark,
        [
            '{"a": {"b": 3.5, "flag": true}, "t": "x"}',
            '{"a": {"b": 7}, "t": "y"}',
            '{"t": "z"}',  # missing path -> NULL, no error
            "not json at all",  # unparseable -> NULL row
        ],
    )
    # try_parse_json posture: raw garbage must not fail the batch
    v = df.withColumn("variant", F.try_parse_json(F.col("payload")))
    out = SS.shred_variant(
        v, "variant", [("a.b", "double"), ("a.flag", "boolean"), ("t", "string")]
    )
    got = {r.doc_id: (r.a_b, r.a_flag, r.t) for r in out.collect()}
    assert got[0] == (3.5, True, "x")
    assert got[1] == (7.0, None, "y")
    assert got[2] == (None, None, "z")
    assert got[3] == (None, None, None)


def test_variant_matches_string_shredding(spark):
    payloads = [f'{{"k": {i}, "s": "v{i % 4}"}}' for i in range(40)]
    df = _docs(spark, payloads)
    via_variant = SS.shred_variant(
        SS.parse_variant(df, "payload"), "variant", [("k", "bigint"), ("s", "string")]
    ).select("doc_id", "k", "s")
    via_string = SS.shred_json(
        df, "payload", fields=[("k", "BIGINT"), ("s", "STRING")]
    ).select("doc_id", "k", "s")
    assert sorted(map(tuple, via_variant.collect())) == sorted(
        map(tuple, via_string.collect())
    )
