from zombi_spark.table.event_table import EventTable

__all__ = ["EventTable"]
