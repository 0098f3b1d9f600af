"""CLI: serve / read / write / mirror (reference: icerunner.py:1158-1239)
plus sql (remote SQL over the served sql ticket), maintain
(policy-driven table maintenance, table.py run_maintenance), and
export-iceberg (cross-engine Iceberg v2 metadata export,
iceberg_export.py — re-running against the same output dir is an
O(delta) incremental mirror) and validate-iceberg (spec-conformance
audit of an exported tree, tools/iceberg_validate.py — includes the
Apache Avro Java cross-decode by default since r10).

Same verbs and flags; ``--batch-size`` counts ROWS (the reference documents
rows but implements batches — bug at icerunner.py:1118)."""

from __future__ import annotations

import argparse
import logging
import sys
import time


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    p = argparse.ArgumentParser(prog="icerunner-spark")
    sub = p.add_subparsers(dest="mode", required=True)

    s = sub.add_parser("serve", help="run the Flight server over a warehouse")
    s.add_argument("-w", "--warehouse", default="warehouse")
    s.add_argument("-n", "--table-name", default="icerunner")
    s.add_argument("-p", "--port", type=int, default=8816)

    r = sub.add_parser("read", help="poll-read a table")
    r.add_argument("-n", "--table-name", default="icerunner")
    r.add_argument("-p", "--port", type=int, default=8816)
    r.add_argument("-i", "--interval", type=float, default=1.0)

    w = sub.add_parser("write", help="poll-write demo rows")
    w.add_argument("-n", "--table-name", default="icerunner")
    w.add_argument("-p", "--port", type=int, default=8816)
    w.add_argument("-i", "--interval", type=float, default=1.0)

    m = sub.add_parser("mirror", help="replicate a remote Flight table")
    m.add_argument("-s", "--source", required=True, help="grpc://host:port/table")
    m.add_argument("-t", "--target-table", default=None)
    m.add_argument("-w", "--warehouse", default="warehouse")
    m.add_argument("-i", "--interval", type=float, default=60.0)
    m.add_argument("-b", "--batch-size", type=int, default=100_000, help="rows per append")
    m.add_argument("--one-time", action="store_true")
    m.add_argument(
        "--streaming",
        action="store_true",
        help="replicate via a Structured Streaming CDC query (checkpoint = cursor)",
    )

    q = sub.add_parser("sql", help="run SQL on a Flight server (remote sql ticket)")
    q.add_argument("-q", "--query", required=True)
    q.add_argument("-p", "--port", type=int, default=8816)
    q.add_argument("--host", default="localhost")
    q.add_argument("--max-rows", type=int, default=50, help="rows to print")

    mt = sub.add_parser(
        "maintain", help="policy-driven maintenance pass over warehouse tables"
    )
    mt.add_argument("-w", "--warehouse", default="warehouse")
    mt.add_argument(
        "-n", "--table-name", default=None,
        help="one table (default: every table in the warehouse)",
    )

    ex = sub.add_parser(
        "export-iceberg",
        help="export a warehouse table as an Apache Iceberg v2 tree "
        "(re-export to the same -o is an O(delta) incremental mirror)",
    )
    ex.add_argument("-w", "--warehouse", default="warehouse")
    ex.add_argument("-n", "--table-name", required=True)
    ex.add_argument("-o", "--output", required=True, help="Iceberg table dir")
    ex.add_argument(
        "--avro-codec", default="null", choices=["null", "deflate"],
        help="Avro block codec for manifests (deflate = Java Iceberg's "
        "default gzip wire form)",
    )

    vi = sub.add_parser(
        "validate-iceberg",
        help="spec-conformance audit of an exported Iceberg tree "
        "(metadata/manifest/file consistency + Java Avro cross-decode; "
        "--no-java-avro skips the JVM)",
    )
    vi.add_argument("-p", "--path", required=True, help="Iceberg table dir")
    vi.add_argument("--json", action="store_true", help="machine output")
    vi.add_argument(
        "--java-avro",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="cross-decode every Avro file through the Apache Avro Java "
        "reference decoder (starts a local JVM; on by default — "
        "--no-java-avro for a JVM-less quick pass)",
    )

    args = p.parse_args(argv)

    if args.mode == "serve":
        from icerunner_spark.flight.server import serve

        server = serve(args.warehouse, port=args.port, bootstrap_demo=args.table_name)
        logging.info("Flight server on port %d (warehouse=%s)", server.port, args.warehouse)
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            server.shutdown()
        return 0
    if args.mode == "read":
        from icerunner_spark.flight.client import run_reader

        run_reader(args.table_name, port=args.port, interval=args.interval)
        return 0
    if args.mode == "write":
        from icerunner_spark.flight.client import run_writer

        run_writer(args.table_name, port=args.port, interval=args.interval)
        return 0
    if args.mode == "sql":
        import pyarrow.flight as flight
        import json as _json

        client = flight.connect(f"grpc://{args.host}:{args.port}")
        got = client.do_get(
            flight.Ticket(_json.dumps({"sql": args.query}).encode())
        ).read_all()
        logging.info("%d rows x %d cols", got.num_rows, got.num_columns)
        print(got.slice(0, args.max_rows).to_pandas().to_string(index=False))
        return 0
    if args.mode == "maintain":
        from icerunner_spark.connector import Connector
        from icerunner_spark.session import get_spark

        c = Connector(get_spark(app_name="icerunner_maintain"), args.warehouse)
        names = [args.table_name] if args.table_name else c.tables
        for name in names:
            report = c.table(name).run_maintenance()
            logging.info("%s: %s", name, report or "healthy, nothing to do")
        return 0
    if args.mode == "export-iceberg":
        from icerunner_spark.connector import Connector
        from icerunner_spark.session import get_spark

        c = Connector(get_spark(app_name="icerunner_export"), args.warehouse)
        meta_path = c.table(args.table_name).export_iceberg(
            args.output, avro_codec=args.avro_codec
        )
        logging.info("exported %s -> %s", args.table_name, meta_path)
        return 0
    if args.mode == "validate-iceberg":
        import importlib.util as _ilu
        import json as _json
        import os as _os

        tool = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools",
            "iceberg_validate.py",
        )
        spec = _ilu.spec_from_file_location("iceberg_validate", tool)
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        report = mod.validate(args.path)
        if args.java_avro:
            mod.java_avro_crosscheck(args.path, report)
        rep = report.as_dict()
        if args.json:
            print(_json.dumps(rep, indent=1))
        else:
            for e in rep["errors"]:
                logging.error("%s", e)
            for w in rep["warnings"]:
                logging.warning("%s", w)
            logging.info(
                "%s — checked %s",
                "OK" if rep["ok"] else "INVALID",
                ", ".join(f"{v} {k}" for k, v in rep["checked"].items()),
            )
        return 0 if rep["ok"] else 1
    if args.mode == "mirror":
        from icerunner_spark.flight.mirror import run_mirror, run_mirror_streaming

        if args.streaming:
            run_mirror_streaming(
                args.source,
                target_table=args.target_table,
                warehouse_path=args.warehouse,
                interval=args.interval,
                continuous=not args.one_time,
            )
            return 0
        run_mirror(
            args.source,
            target_table=args.target_table,
            warehouse_path=args.warehouse,
            interval=args.interval,
            batch_rows=args.batch_size,
            continuous=not args.one_time,
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
