"""Semi-structured (JSON) columns: variant-style shredding, Spark-first.

Web-scale training corpora carry metadata as JSON strings (crawl
records, annotation payloads, side-channel labels).  Engines answer
queries over them efficiently by SHREDDING: promoting stable scalar
paths to typed physical columns (which then get parquet stats, column
pruning, and predicate pushdown) while keeping the raw string as the
residual for everything else — the Iceberg v3 / Parquet "variant
shredding" design, re-expressed with Spark built-ins.

Everything here is pure codegen: ``get_json_object`` + ``CAST`` for
scalar paths, ``from_json`` for typed arrays.  No Python touches the
hot path; schema INFERENCE is the only driver step and is bounded by
``sample`` rows by construction.

Scale shape: shredding is a zero-shuffle projection — at 100 TB it
rides whole-stage codegen in the same scan that reads the raw column;
the win compounds when shredded output is WRITTEN to a managed table,
where the typed columns earn min/max stats and file skipping that an
opaque JSON string can never have.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# JSON scalar -> promoted Spark type (widest-wins when samples disagree)
_TYPE_RANK = {"BOOLEAN": 0, "BIGINT": 1, "DOUBLE": 2, "STRING": 3}


def _scalar_type(v) -> str | None:
    if isinstance(v, bool):
        return "BOOLEAN"
    if isinstance(v, int):
        return "BIGINT"
    if isinstance(v, float):
        return "DOUBLE"
    if isinstance(v, str):
        return "STRING"
    return None  # null / nested / array: not a scalar leaf


def infer_json_fields(
    df: DataFrame, json_col: str, sample: int = 200, max_depth: int = 3
) -> list[tuple[str, str]]:
    """Discover stable scalar paths from a bounded sample of raw JSON.

    Walks up to ``max_depth`` levels of nested objects; a path observed
    with conflicting scalar types widens (BOOLEAN < BIGINT < DOUBLE <
    STRING).  Deterministic: paths sorted.  The collect is ``sample``
    rows BY CONSTRUCTION — inference never scans the corpus (the same
    posture as SentencePiece/BPE training caps in this repo).
    """
    rows = (
        df.select(F.col(json_col).alias("j"))
        .filter(F.col("j").isNotNull())
        .limit(int(sample))
        .collect()
    )
    found: dict[str, str] = {}

    def walk(obj: dict, prefix: str, depth: int) -> None:
        for k, v in obj.items():
            path = f"{prefix}.{k}" if prefix else k
            t = _scalar_type(v)
            if t is not None:
                prev = found.get(path)
                if prev is None or _TYPE_RANK[t] > _TYPE_RANK[prev]:
                    found[path] = t
            elif isinstance(v, dict) and depth < max_depth:
                walk(v, path, depth + 1)

    for r in rows:
        try:
            obj = json.loads(r["j"])
        except (TypeError, ValueError):
            continue
        if isinstance(obj, dict):
            walk(obj, "", 1)
    return sorted(found.items())


def shred_json(
    df: DataFrame,
    json_col: str,
    fields: list[tuple[str, str]] | None = None,
    keep_residual: bool = True,
    sample: int = 200,
) -> DataFrame:
    """Promote scalar JSON paths to typed top-level columns.

    ``fields`` is ``[(dotted.path, SPARK_TYPE)]``; None infers via
    :func:`infer_json_fields`.  Column names replace dots with ``_``.
    Missing keys / type mismatches become NULL (CAST semantics — the
    shredded form never errors on ragged records).  The raw column
    survives as the residual unless ``keep_residual=False``.
    """
    if fields is None:
        fields = infer_json_fields(df, json_col, sample=sample)
    out = df
    for path, typ in fields:
        cname = path.replace(".", "_")
        out = out.withColumn(
            cname,
            F.get_json_object(F.col(json_col), f"$.{path}").cast(typ),
        )
    if not keep_residual:
        out = out.drop(json_col)
    return out


def parse_variant(df: DataFrame, json_col: str, out_col: str = "variant") -> DataFrame:
    """Parse a raw JSON string column into a Spark VariantType column
    (Spark 4 ``parse_json`` — the engine-native binary variant encoding
    the Iceberg v3 / Parquet variant spec standardizes).  Unlike the
    string form, a variant column parses ONCE and every later path
    access reads the binary encoding directly, all in codegen."""
    return df.withColumn(out_col, F.parse_json(F.col(json_col)))


def variant_field(col, path: str, typ: str):
    """Typed path extraction from a VariantType column
    (``variant_get``): returns a Column of ``typ``; missing paths and
    incompatible casts yield NULL via ``try_variant_get`` — same
    NULL-on-ragged posture as :func:`shred_json`."""
    return F.try_variant_get(F.col(col) if isinstance(col, str) else col, f"$.{path}", typ)


def shred_variant(
    df: DataFrame, variant_col: str, fields: list[tuple[str, str]]
) -> DataFrame:
    """Promote variant paths to typed top-level columns (the shredding
    half of the variant design, fed by the binary encoding instead of
    re-parsing JSON text per path)."""
    out = df
    for path, typ in fields:
        out = out.withColumn(
            path.replace(".", "_"), variant_field(variant_col, path, typ)
        )
    return out


def shred_json_array(
    df: DataFrame,
    json_col: str,
    path: str,
    element_type: str = "STRING",
    pos_col: str = "pos",
    value_col: str = "value",
) -> DataFrame:
    """Explode a JSON array path into one row per element with its
    position — the flattening half of shredding (typed via
    ``from_json``; stays codegen + one generator, no Python)."""
    arr = F.from_json(
        F.get_json_object(F.col(json_col), f"$.{path}"),
        f"array<{element_type.lower()}>",
    )
    return df.select(
        "*", F.posexplode_outer(arr).alias(pos_col, value_col)
    )
