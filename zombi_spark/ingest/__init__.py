from zombi_spark.ingest.batch import (
    EVENT_SCHEMA,
    RAW_EVENT_SCHEMA,
    assign_sequences,
    dedup_idempotency,
    prepare_events,
    validate_table_name,
)

__all__ = [
    "EVENT_SCHEMA",
    "RAW_EVENT_SCHEMA",
    "assign_sequences",
    "dedup_idempotency",
    "prepare_events",
    "validate_table_name",
]
