from zombi_spark.streaming.http_edge import HttpIngestEdge
from zombi_spark.streaming.ingest import AdmissionRejected, StreamingIngest

__all__ = ["AdmissionRejected", "HttpIngestEdge", "StreamingIngest"]
