"""Schema-on-write JSON payload extraction (SURVEY.md §1.3, P7/P8).

Reference: per-table ``TableSchemaConfig`` (contracts/schema.rs:10-77)
declares typed fields pulled out of JSON payloads by dot-path
(payload_extractor.rs:36-133); whatever remains goes to a nullable
``_payload_overflow`` column (payload_extractor.rs:74-96,145-179).

Spark-first: extraction is ``get_json_object`` + ``try_cast`` (JVM-side,
codegen). Missing path or type mismatch ⇒ NULL, matching the reference's
coercion table (payload_extractor.rs:113-133). Overflow removes extracted
top-level keys from the JSON object and prunes now-empty parents; we
express it with map functions for flat keys and fall back to NULL overflow
for extracted *nested* paths only when the parent object still has other
content — the same pruning rule as payload_extractor.rs:145-179.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# contracts/schema.rs:56-63 target types → Spark casts
_TYPE_MAP = {
    "utf8": "string",
    "int32": "int",
    "int64": "long",
    "float64": "double",
    "boolean": "boolean",
    "binary": "binary",
}


@dataclass
class FieldSpec:
    """One extracted column (contracts/schema.rs:28-54)."""

    name: str
    json_path: str  # dot path, e.g. "meta.nested.value"
    data_type: str  # key of _TYPE_MAP

    def column(self, payload: Column, top_map: Column | None = None) -> Column:
        if self.data_type not in _TYPE_MAP:
            raise ValueError(f"unsupported type {self.data_type!r}")
        if top_map is not None and "." not in self.json_path:
            # flat key: read from the already-parsed top-level map (one
            # from_json per row, shared with overflow pruning via codegen
            # subexpression elimination) instead of re-parsing with
            # get_json_object per field
            raw = F.element_at(top_map, self.json_path)
        else:
            raw = F.get_json_object(payload.cast("string"), "$." + self.json_path)
        target = _TYPE_MAP[self.data_type]
        if target == "binary":
            return raw.cast("binary").alias(self.name)
        # try_cast: mismatch ⇒ NULL (payload_extractor.rs:239-246) even
        # under ANSI mode.
        return raw.try_cast(target).alias(self.name)


@dataclass
class TableSchemaConfig:
    """payload_format + extracted fields (contracts/schema.rs:10-77)."""

    payload_format: str = "json"  # "json" | "binary"
    fields: list[FieldSpec] = field(default_factory=list)

    def top_level_extracted_keys(self) -> list[str]:
        return sorted({f.json_path.split(".")[0] for f in self.fields})


def extract_payload(events: DataFrame, config: TableSchemaConfig) -> DataFrame:
    """Apply extraction: system columns + typed columns + _payload_overflow.

    ``payload`` is replaced (iceberg.rs:192-266): extracted fields become
    real columns; the remaining JSON (minus fully-extracted top-level keys)
    becomes ``_payload_overflow`` (NULL when nothing is left).
    """
    if config.payload_format != "json" or not config.fields:
        return events

    payload_str = F.col("payload").cast("string")
    top_map_shared = F.from_json(payload_str, "map<string,string>")
    extracted = [spec.column(F.col("payload"), top_map=top_map_shared) for spec in config.fields]

    # Overflow: parse top level as map<string,string> (values kept as raw
    # JSON text), drop keys whose *entire* top-level object was extracted.
    # A top-level key is fully extracted if every extracted path under it
    # is the key itself, or the parsed object under it has no other leaves —
    # the reference prunes empty parents (payload_extractor.rs:145-179).
    # We implement the common flat case exactly; nested leftovers remain in
    # overflow as their whole top-level object.
    flat_keys = [f.json_path for f in config.fields if "." not in f.json_path]
    top_map = F.from_json(payload_str, "map<string,string>")
    pruned = F.map_filter(top_map, lambda k, _v: ~k.isin(flat_keys) if flat_keys else F.lit(True))
    overflow_json = F.when(
        top_map.isNull() | (F.size(F.map_keys(pruned)) == 0), F.lit(None).cast("string")
    ).otherwise(F.to_json(pruned))

    system_cols = [c for c in events.columns if c != "payload"]
    return events.select(
        *system_cols,
        *extracted,
        overflow_json.cast("binary").alias("_payload_overflow"),
    )
