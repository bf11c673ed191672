from zombi_spark.sources.datasource import (
    ZombiDataSource,
    register_zombi_datasource,
)
from zombi_spark.sources.tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "ZombiDataSource",
    "load_table",
    "register_views",
    "register_zombi_datasource",
]
