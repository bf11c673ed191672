from zombi_spark.streaming.ingest import StreamingIngest

__all__ = ["StreamingIngest"]
