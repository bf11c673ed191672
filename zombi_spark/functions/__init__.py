from zombi_spark.functions.events import (
    derive_partition_columns,
    format_partition_date,
    hex_sequence,
    server_time_ms,
    to_event_time,
    utf8_payload,
)
from zombi_spark.functions.hashing import md5_long, stable_token_hash

__all__ = [
    "derive_partition_columns",
    "format_partition_date",
    "hex_sequence",
    "md5_long",
    "server_time_ms",
    "stable_token_hash",
    "to_event_time",
    "utf8_payload",
]
