"""spark-submit entry point: the full resumable production job.

    spark-submit --py-files logspark.zip logspark/job.py \
        --input /data/corpus --output /data/sinks --checkpoint /data/ctrl \
        --partitions 4096 --run-id run-2026-08-16

Stages (mirrors the reference control loop, SURVEY.md §3 E1/E2/E3):
  1. read tokenized corpus (Iceberg table or parquet dir)
  2. assign explicit hash partitions on doc_id (north_rule)
  3. RESUME: anti-join vs committed control partitions (J4)
  4. detokenize -> detect -> parse -> enrich -> route (one narrow pass,
     observe() counters riding along)
  5. fan-out write, physically partitioned by (sink, part_id),
     'partitioned' distribution by default (one part_id shuffle so each
     directory is written by exactly one task — Iceberg
     write.distribution-mode=hash analog; see sinks.write_fanout for the
     direct/salted alternatives and their measured trade-offs)
  6. commit per-partition control rows + lineage metrics + date-status
     rollup (guarded upsert)

Crash-replay commit protocol (parquet fallback for Iceberg's snapshot
commit; reference analog: per-file status rows, /root/reference/libs/
lib_database.py:101-117):

  * data is written with dynamic partition OVERWRITE keyed on
    (sink, part_id) — never append. A kill between the data write and the
    control append leaves partitions pending; the resume replays them and
    the overwrite REPLACES their files, so no duplicate rows can survive.
  * control rows are appended strictly AFTER the data write. Invariant:
    a committed control row implies its partition's data is durable; a
    missing control row implies the partition will be rewritten
    idempotently. (Iceberg gets the same via atomic overwritePartitions +
    a control MERGE in one transaction.)

Iceberg: pass --iceberg to read/write through a configured catalog (configs
shipped here; the sandbox has no catalog so parquet is the tested fallback —
the control/resume semantics are identical).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F

from logspark import control, metrics, pipeline, sinks, status
from logspark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--metrics-dir",
        default=None,
        help="append per-partition lineage rows here (keyed by logical "
        "part_id; the partition_key column records that). NOTE: emitted "
        "only when this run had pending partitions — a fully-resumed run "
        "writes no data and therefore no lineage rows",
    )
    p.add_argument("--partitions", type=int, default=256)
    p.add_argument("--run-id", default="run-0")
    p.add_argument(
        "--distribution",
        choices=["direct", "salted", "partitioned"],
        default="partitioned",
        help="fan-out write distribution (see sinks.write_fanout); "
        "'partitioned' co-locates each part_id in one task so the "
        "(sink, part_id) layout writes ~1 file per directory",
    )
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--iceberg", action="store_true")
    p.add_argument(
        "--anonymize-ip",
        type=int,
        default=0,
        choices=[0, 1, 2, 3, 4],
        metavar="N",
        help="privacy scrub before anything lands in a sink: zero the "
        "trailing N IPv4 octets of the parsed client IP (Matomo "
        "privacy.ipAddressMaskLength analog; 0 = off). Scrubs BOTH the "
        "parsed ip column AND the token array (the tokens are the raw "
        "line's code points, so masking ip alone would leave the address "
        "recoverable from every sink row) in the same narrow pass — the "
        "raw address never lands in any sink column",
    )
    args = p.parse_args(argv)

    extra = {}
    if args.iceberg:
        extra = {
            "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.lake.type": "hadoop",
            "spark.sql.catalog.lake.warehouse": args.output,
        }
    spark = get_spark(cores=args.cores, app="logspark-job", extra=extra)

    t0 = time.time()
    corpus = spark.read.parquet(args.input)
    corpus = control.with_partition_id(corpus, args.partitions)

    store = control.CheckpointStore(spark, args.checkpoint)
    todo = control.pending_partitions(corpus, store)

    # the pending part-id set is bounded by --partitions (metadata-sized):
    # collected once, reused for the write and for partition-pruned stats
    pending_ids = [r[0] for r in todo.select("part_id").distinct().collect()]

    obs = metrics.route_observation()
    routed = pipeline.routed_hits(spark, todo, observation=obs)
    if args.anonymize_ip:
        from logspark import enrich
        from logspark import tokens as tokmod

        masked = enrich.anonymize_ip("ip", keep_octets=4 - args.anonymize_ip)
        # PII closure: tokens ARE the raw line (per-character code points),
        # so the raw address must be scrubbed there too — detokenize,
        # literal-replace every occurrence of the raw ip with the masked
        # form, retokenize. All codegen'd column math in the same narrow
        # pass; rows with no parsed IP keep their tokens verbatim (the
        # per-row token-equality invariant holds for every non-PII row).
        scrubbed_line = F.replace(
            tokmod.detokenize_expr("tokens"), F.col("ip"), masked
        )
        routed = (
            routed.withColumn(
                "tokens",
                F.when(
                    F.col("ip").isNull(), F.col("tokens")
                ).otherwise(tokmod.tokenize(scrubbed_line)),
            )
            .withColumn("n_tok", F.size("tokens"))
            .withColumn("ip", masked)
        )
    sinks.write_fanout(
        routed,
        args.output,
        mode="overwrite",
        distribution=args.distribution,
        partition_cols=["sink", "part_id"],
    )

    try:
        observed = obs.get
    except Exception:  # noqa: BLE001 — zero pending rows => no observed row
        observed = {"rows_total": 0}
    if observed.get("rows_total", 0) and not metrics.conservation_ok(observed):
        print(f"CONSERVATION VIOLATION: {observed}", file=sys.stderr)
        return 2

    # control/lineage stats re-read ONLY this run's output: part_id is a
    # physical partition directory, so the isin() literal filter prunes at
    # file-listing time — cost is proportional to THIS run's rows (and only
    # the route column is read), never to accumulated history. Reading back
    # what was actually written (vs aggregating `routed` pre-write) makes
    # the control row attest to durable rows. In Iceberg mode this comes
    # free from the committed snapshot's manifest metadata instead.
    if pending_ids:
        this_run = (
            spark.read.parquet(args.output)
            .filter(F.col("part_id").isin(pending_ids))
            .select("part_id", "route")
        )
        stats = control.partition_stats(this_run, args.run_id)
        store.append(stats)

        if args.metrics_dir:
            # lineage from the SAME pruned two-column readback — never from
            # the live `routed` plan, which would re-run the entire parse
            # pass a second time just for metrics (at 50M rows that
            # duplicate pass GC-thrashed a 32g single-JVM driver to death)
            metrics.lineage_counts(
                this_run, args.run_id, "route", key="part_id"
            ).write.mode("append").parquet(args.metrics_dir)

    rows = observed.get("rows_total", 0)
    dt = time.time() - t0
    print(
        f"run_id={args.run_id} rows={rows} secs={dt:.1f} "
        f"throughput={rows / dt if dt else 0:.0f} rows/s counters={observed}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
