"""The reference user's complete flow on this engine, one test: HTTP
ingest edge → landing zone → checkpointed streaming ingest → committed
snapshots → `spark.readStream.format("zombi")` follower → downstream
aggregate — with the second wave delivered incrementally (version
offsets), exactly once, and the follower's running totals matching a
direct query over the committed table.

Reference shape: POST /tables/{t} (handlers.rs:467) → RocksDB hot buffer
→ flusher → Iceberg snapshot → external engine tails the table via
consumer offsets (rocksdb.rs:396-398) / incremental scan.
"""

import json
import urllib.request

import pyspark.sql.functions as F

from zombi_spark.sources.datasource import register_zombi_datasource
from zombi_spark.streaming.http_edge import HttpIngestEdge
from zombi_spark.streaming.ingest import StreamingIngest
from zombi_spark.table.event_table import EventTable

T0 = 1704067200000


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.status, json.loads(resp.read() or b"{}")


def test_http_to_datasource_follower_end_to_end(spark, tmp_path):
    ingests = {}

    def resolver(name, create):
        if name not in ingests:
            if not create:
                raise KeyError(name)
            table = EventTable(spark, str(tmp_path), name)
            ingests[name] = StreamingIngest(
                spark,
                str(tmp_path / f"landing-{name}"),
                table,
                str(tmp_path / f"ckpt-{name}"),
            )
        return ingests[name]

    register_zombi_datasource(spark)
    totals = []  # (batch_id, n_rows, sum of payload values)

    def follow(df, bid):
        vals = df.select(
            F.get_json_object(F.col("payload").cast("string"), "$.v")
            .cast("long")
            .alias("v")
        ).agg(F.count("*"), F.sum("v"))
        n, s = vals.first()
        totals.append((bid, n, s or 0))

    def run_follower(table_path, ckpt):
        q = (
            spark.readStream.format("zombi")
            .load(table_path)
            .writeStream.foreachBatch(follow)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(240)

    with HttpIngestEdge(resolver) as srv:
        base = srv.base_url
        # wave 1: 8 single writes + one bulk of 4
        for i in range(8):
            status, _ = _post(
                f"{base}/tables/events",
                {"payload": json.dumps({"v": i}), "partition": i % 2,
                 "timestamp_ms": T0 + i * 60000},
            )
            assert status == 202
        status, _ = _post(
            f"{base}/tables/events/bulk",
            {"records": [
                {"payload": json.dumps({"v": 100 + i}), "partition": 0,
                 "timestamp_ms": T0 + (8 + i) * 60000}
                for i in range(4)
            ]},
        )
        assert status == 202
        status, body = _post(f"{base}/tables/events/flush", "")
        assert status == 200

        table = ingests["events"].table
        ckpt = str(tmp_path / "follower-ckpt")
        run_follower(table.path, ckpt)
        assert sum(n for _, n, _ in totals) == 12
        assert sum(s for _, _, s in totals) == sum(range(8)) + sum(
            100 + i for i in range(4)
        )

        # wave 2: only the delta flows to the follower
        for i in range(5):
            status, _ = _post(
                f"{base}/tables/events",
                {"payload": json.dumps({"v": 1000 + i}), "partition": 1,
                 "timestamp_ms": T0 + (20 + i) * 60000},
            )
            assert status == 202
        status, _ = _post(f"{base}/tables/events/flush", "")
        assert status == 200

        before = len(totals)
        run_follower(table.path, ckpt)
        new = totals[before:]
        assert sum(n for _, n, _ in new) == 5
        assert sum(s for _, _, s in new) == sum(1000 + i for i in range(5))

        # the follower's running totals match a direct committed-table query
        direct = table.read().select(
            F.get_json_object(F.col("payload").cast("string"), "$.v")
            .cast("long")
            .alias("v")
        ).agg(F.count("*"), F.sum("v")).first()
        assert (direct[0], direct[1]) == (
            sum(n for _, n, _ in totals),
            sum(s for _, _, s in totals),
        )
