"""HTTP-edge load scenarios — the reference's L5 ``zombi-load`` CLI
analogue (tools/zombi_load.py scenarios single-write / bulk-write), run
against :class:`~zombi_spark.streaming.http_edge.HttpIngestEdge`.

Usage:
    python tools/edge_load.py [--single N] [--bulk N --per P] [--conc C]
                              [--workers W] [--clients P]

Prints one JSON line per scenario:
    {"scenario": "single_write", "req_s": ..., "events_s": ..., ...}

``--workers`` scales the server's write plane across extra OS processes
(SO_REUSEPORT); ``--clients`` forks the LOAD GENERATOR the same way —
one Python client process saturates near ~1.5k req/s, so measuring a
multi-process server demands a multi-process client.

Measured on this container (local[8] session alive, 32 CPUs):
  single-write ~1.6k req/s at workers=0 (one GIL-bound stdlib
  http.server process), ~6.5k at workers=4, ~10.5k at workers=8,
  ~12.7-14.6k at workers=14 (idle best 14.6k) — near-linear per
  process, at/past the reference's compiled axum edge (13.6k req/s)
  from pure Python; bulk-write ~45k events/s
  at 100/batch, ~115-140k events/s at 1000-5000/batch — past the
  reference's PERF-2 gate (>100k bulk ev/s,
  AB_PERFORMANCE_TESTING.md:646-647). The write combiner (S4) keeps
  landing-file count at one per few ms regardless of request rate.
"""

from __future__ import annotations

import argparse
import http.client
import json
import multiprocessing
import sys
import tempfile
import threading
import time
from concurrent.futures import ThreadPoolExecutor


def _client_single_writes(host: str, port: int, n: int, conc: int, table: str) -> int:
    """One load-generator process: ``n`` single-event POSTs over ``conc``
    keep-alive connections. Module-level so a spawn context can pickle it."""
    local = threading.local()
    body = json.dumps({"payload": '{"k":1,"v":"load"}', "partition": 0}).encode()

    def post(_i) -> int:
        conn = getattr(local, "conn", None)
        if conn is None:
            conn = local.conn = http.client.HTTPConnection(host, port)
        conn.request("POST", f"/tables/{table}", body)
        r = conn.getresponse()
        r.read()
        return r.status

    with ThreadPoolExecutor(conc) as ex:
        codes = list(ex.map(post, range(n)))
    return sum(1 for s in codes if s == 202)


def run_scenarios(
    single: int, bulk: int, per: int, conc: int, workers: int = 0, clients: int = 1
) -> list[dict]:
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from pyspark.sql import SparkSession

    from zombi_spark.streaming.http_edge import HttpIngestEdge
    from zombi_spark.streaming.ingest import StreamingIngest
    from zombi_spark.table.event_table import EventTable

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tmp = tempfile.mkdtemp(prefix="edge-load-")
    ingests: dict[str, StreamingIngest] = {}

    def resolver(name: str, create: bool = True) -> StreamingIngest:
        if name not in ingests:
            if not create:
                raise KeyError(name)
            ingests[name] = StreamingIngest(
                spark, f"{tmp}/landing-{name}", EventTable(spark, tmp, name), f"{tmp}/ckpt-{name}"
            )
        return ingests[name]

    local = threading.local()
    results = []
    warm_events = 0
    with HttpIngestEdge(resolver, workers=workers) as srv:
        host, port = srv._httpd.server_address[:2]

        def post(path: str, body: bytes) -> int:
            conn = getattr(local, "conn", None)
            if conn is None:
                conn = local.conn = http.client.HTTPConnection(host, port)
            conn.request("POST", path, body)
            r = conn.getresponse()
            r.read()
            return r.status

        if single:
            body = json.dumps({"payload": '{"k":1,"v":"load"}', "partition": 0}).encode()
            n_warm = min(100, single)
            for _ in range(n_warm):  # warm
                post("/tables/single", body)
            warm_events += n_warm
            if clients > 1:
                # multi-process load generation — required to measure a
                # multi-process server (one client process tops out ~1.5k)
                per_client = single // clients
                ctx = multiprocessing.get_context("spawn")
                t0 = time.perf_counter()
                with ctx.Pool(clients) as pool:
                    acks = pool.starmap(
                        _client_single_writes,
                        [(host, port, per_client, conc, "single")] * clients,
                    )
                dt = time.perf_counter() - t0
                sent, acked = per_client * clients, sum(acks)
            else:
                t0 = time.perf_counter()
                with ThreadPoolExecutor(conc) as ex:
                    codes = list(
                        ex.map(lambda _i: post("/tables/single", body), range(single))
                    )
                dt = time.perf_counter() - t0
                sent, acked = single, sum(1 for s in codes if s == 202)
            results.append(
                {
                    "scenario": "single_write",
                    "requests": sent,
                    "workers": workers,
                    "clients": clients,
                    "concurrency": conc,
                    "req_s": round(sent / dt, 1),
                    "events_s": round(sent / dt, 1),
                    "acked": acked,
                }
            )
        if bulk:
            body = json.dumps(
                {
                    "records": [
                        {
                            "payload": json.dumps({"k": i}),
                            "partition": i % 8,
                            "timestamp_ms": 1704067200000 + i,
                        }
                        for i in range(per)
                    ]
                }
            ).encode()
            post("/tables/bulked/bulk", body)  # warm
            warm_events += per
            t0 = time.perf_counter()
            with ThreadPoolExecutor(conc) as ex:
                codes = list(
                    ex.map(lambda _i: post("/tables/bulked/bulk", body), range(bulk))
                )
            dt = time.perf_counter() - t0
            results.append(
                {
                    "scenario": "bulk_write",
                    "requests": bulk,
                    "events_per_request": per,
                    "concurrency": conc,
                    "req_s": round(bulk / dt, 1),
                    "events_s": round(bulk * per / dt, 1),
                    "acked": sum(1 for s in codes if s == 202),
                }
            )

        # consistency scenario (the reference's L5 `consistency` re-check
        # of INV-2/INV-3: everything acked is durable, exactly once, in
        # per-partition sequence order) — flush over HTTP, read back
        acked = warm_events + sum(
            r.get("acked", 0) * r.get("events_per_request", 1) for r in results
        )
        if acked:
            t0 = time.perf_counter()
            for tbl in ("single",) * bool(single) + ("bulked",) * bool(bulk):
                post(f"/tables/{tbl}/flush", b"")
            flush_s = time.perf_counter() - t0
            committed = sum(
                ingests[tbl].table.read().count()
                for tbl in set(("single",) * bool(single) + ("bulked",) * bool(bulk))
            )
            gapless = True
            for tbl in set(("single",) * bool(single) + ("bulked",) * bool(bulk)):
                from pyspark.sql import functions as F

                df = ingests[tbl].table.read().groupBy("partition").agg(
                    F.count("*").alias("n"), F.max("sequence").alias("hwm"),
                    F.countDistinct("sequence").alias("d"),
                )
                for row in df.collect():
                    if not (row.n == row.d == row.hwm):
                        gapless = False
            results.append(
                {
                    "scenario": "consistency",
                    "acked_events": acked,
                    "committed_rows": committed,
                    "all_acked_durable": committed == acked,
                    "sequences_gapless": gapless,
                    "flush_s": round(flush_s, 2),
                }
            )
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--single", type=int, default=4000)
    ap.add_argument("--bulk", type=int, default=200)
    ap.add_argument("--per", type=int, default=1000)
    ap.add_argument("--conc", type=int, default=16)
    ap.add_argument("--workers", type=int, default=0, help="extra write-plane processes")
    ap.add_argument("--clients", type=int, default=1, help="load-generator processes")
    args = ap.parse_args()
    for row in run_scenarios(
        args.single, args.bulk, args.per, args.conc, args.workers, args.clients
    ):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
