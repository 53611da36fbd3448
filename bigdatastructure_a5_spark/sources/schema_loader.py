"""JSON-Schema -> Spark StructType loader (reference S1/S2 parity).

The reference declares every collection as a JSON-Schema document, with
``$ref``/``allOf`` composition resolved across files at load time
(`/root/reference/main.py:12-15`, `chapter5/loader.py:17-29`;
`schemas/db2.json` composes `product.json` via allOf+$ref).  This loader
accepts the same dialect and yields Spark types per the SURVEY §1.2 mapping:
integer->LongType, number->DoubleType, string->StringType,
string(format=date)->DateType, boolean->BooleanType, object->StructType,
array->ArrayType.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    LongType,
    NullType,
    StringType,
    StructField,
    StructType,
)


def _resolve_ref(ref: str, base_dir: Path) -> tuple[dict, Path]:
    """Resolve a file-based ``$ref``: 'product.json' or
    'product.json#/definitions/X'.  Returns the node AND the referenced
    file's own directory — a nested $ref inside that file is relative to
    the file that contains it, not to the original root (a chain
    db.json -> sub/product.json -> detail.json must read sub/detail.json)."""
    if "#" in ref:
        file_part, pointer = ref.split("#", 1)
    else:
        file_part, pointer = ref, ""
    file_path = base_dir / file_part
    node = json.loads(file_path.read_text())
    for step in [s for s in pointer.split("/") if s]:
        node = node[step]
    return node, file_path.parent


def _merge_all_of(parts: list[dict], base_dir: Path) -> dict:
    """allOf composition: shallow-merge resolved property maps (the
    reference's dialect only composes object schemas)."""
    merged: dict = {"type": "object", "properties": {}}
    for part in parts:
        resolved = _resolve_node(part, base_dir)
        merged["properties"].update(resolved.get("properties", {}))
    return merged


def _resolve_node(node: dict, base_dir: Path) -> dict:
    if "$ref" in node:
        resolved, ref_dir = _resolve_ref(node["$ref"], base_dir)
        return _resolve_node(resolved, ref_dir)
    if "allOf" in node:
        return _merge_all_of(node["allOf"], base_dir)
    return node


def json_schema_to_spark(node: dict, base_dir: Path | str = ".") -> DataType:
    """Convert one (possibly $ref/allOf) JSON-Schema node to a Spark type."""
    base_dir = Path(base_dir)
    node = _resolve_node(node, base_dir)
    t = node.get("type", "object")
    if t == "object":
        fields = [
            StructField(name, json_schema_to_spark(sub, base_dir), True)
            for name, sub in node.get("properties", {}).items()
        ]
        return StructType(fields)
    if t == "array":
        return ArrayType(
            json_schema_to_spark(node.get("items", {"type": "string"}), base_dir)
        )
    if t == "integer":
        return LongType()
    if t == "number":
        return DoubleType()
    if t == "string":
        return DateType() if node.get("format") == "date" else StringType()
    if t == "boolean":
        return BooleanType()
    if t == "null":
        return NullType()
    return StringType()


def load_collection_schemas(path: str | Path) -> dict[str, StructType]:
    """Load a reference-style schema file: top-level map of collection name
    -> object schema (e.g. db1.json / DB1.json)."""
    path = Path(path)
    data = json.loads(path.read_text())
    out: dict[str, StructType] = {}
    for name, node in data.items():
        st = json_schema_to_spark(node, path.parent)
        if isinstance(st, StructType):
            out[name] = st
    return out
