"""End-to-end surfaces: fan-out writes, the spark-submit job (with resume),
multimodal plumbing, streaming/batch parity."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from logspark import control, multimodal, pipeline, sinks, synth


def test_fanout_write_and_readback(spark, small_corpus, tmp_path):
    out = str(tmp_path / "sinks")
    routed = pipeline.routed_hits(spark, small_corpus)
    expected = {r["sink"]: r["cnt"] for r in
                routed.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    sinks.write_fanout(routed, out)
    back = spark.read.parquet(out)
    got = {r["sink"]: r["cnt"] for r in
           back.groupBy("sink").agg(F.count("*").alias("cnt")).collect()}
    assert got == expected
    # errors sink readable standalone
    errs = sinks.read_sink(spark, out, "errors")
    assert errs.count() == expected.get("errors", 0)


def test_job_end_to_end_with_resume(spark, tmp_path):
    from logspark import job

    corpus_path = str(tmp_path / "corpus")
    synth.write_corpus(spark, 1000, corpus_path)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = job.main(
        [
            "--input", corpus_path, "--output", out, "--checkpoint", ckpt,
            "--partitions", "8", "--run-id", "r1", "--cores", "8",
        ]
    )
    assert rc == 0
    n1 = spark.read.parquet(out).count()
    assert n1 == 1000
    # second run: everything committed -> nothing new written
    rc2 = job.main(
        [
            "--input", corpus_path, "--output", out, "--checkpoint", ckpt,
            "--partitions", "8", "--run-id", "r2", "--cores", "8",
        ]
    )
    assert rc2 == 0
    assert spark.read.parquet(out).count() == n1  # idempotent resume

    # kill-and-resume: wipe checkpoint rows for half the partitions
    store = control.CheckpointStore(spark, ckpt)
    committed = store.committed_ids().count()
    assert committed == 8


def test_job_kill_between_data_and_control_no_duplicates(
    spark, tmp_path, monkeypatch
):
    """Crash-atomicity of the parquet commit protocol: a kill AFTER the
    sink write but BEFORE the control append must not duplicate rows on
    resume. The (sink, part_id) dynamic-overwrite layout makes the replay
    REPLACE the orphaned files (reference analog: per-file status rows,
    lib_database.py:101-117)."""
    from logspark import job

    corpus_path = str(tmp_path / "kcorpus")
    synth.write_corpus(spark, 1000, corpus_path)
    out = str(tmp_path / "kout")
    ckpt = str(tmp_path / "kckpt")
    argv = [
        "--input", corpus_path, "--output", out, "--checkpoint", ckpt,
        "--partitions", "8", "--run-id", "crash", "--cores", "8",
    ]

    # run 1: simulate the kill — data lands, control append never happens
    monkeypatch.setattr(
        control.CheckpointStore, "append", lambda self, rows: None
    )
    assert job.main(argv) == 0
    monkeypatch.undo()
    assert spark.read.parquet(out).count() == 1000
    store = control.CheckpointStore(spark, ckpt)
    assert store.committed_ids().count() == 0  # nothing committed

    # run 2: full replay of all (still-pending) partitions -> exact counts
    assert job.main(argv[:-4] + ["--run-id", "resume", "--cores", "8"]) == 0
    back = spark.read.parquet(out)
    assert back.count() == 1000  # no duplicates survived the replay
    assert back.select("doc_id").distinct().count() == 1000
    assert store.committed_ids().count() == 8

    # run 3: PARTIAL control loss (control rows for half the partitions
    # gone — e.g. a kill mid-append): only those partitions replay, counts
    # still exact
    keep = store.read().filter(F.col("part_id") < 4)
    keep_pd = keep.toPandas()
    import shutil

    shutil.rmtree(ckpt)
    spark.createDataFrame(keep_pd, schema=control.CONTROL_SCHEMA).write.mode(
        "overwrite"
    ).parquet(ckpt)
    assert job.main(argv[:-4] + ["--run-id", "resume2", "--cores", "8"]) == 0
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.select("doc_id").distinct().count() == 1000
    assert store.committed_ids().count() == 8


def test_multimodal_stub_and_stats(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = multimodal.synth_media(docs)
    stats = {r["kind"]: r["cnt"] for r in multimodal.media_stats(media).collect()}
    assert sum(stats.values()) == docs.count()
    feats = multimodal.decode_and_featurize(media, fake=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r["feat_mean"] <= 255.0 for r in rows)
    # non-fake decode must raise the documented stub error at execution
    with pytest.raises(Exception, match="NotImplementedError|codecs unavailable"):
        multimodal.decode_and_featurize(media, fake=False).count()


def test_ppm_decode_real_roundtrip(spark):
    # hand-built 2x1 P6: pixels (1,2,3) and (250,251,252)
    payload = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    r = multimodal.decode_ppm_images(media).collect()[0]
    assert (r["width"], r["height"]) == (2, 1)
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (125.5, 126.5, 127.5)
    # 4x4 nearest-neighbor over a 2x1 image: cols 0,0,1,1 x 4 rows of row 0
    assert r["resized_r_checksum"] == 4 * (1 + 1 + 250 + 250)

    # hostile payloads fail loudly, not silently
    bad = spark.createDataFrame(
        [(1, bytearray(b"P5\n1 1\n255\n\x00"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a P6|ValueError"):
        multimodal.decode_ppm_images(bad).collect()


def test_wav_decode_real_roundtrip(spark):
    import struct

    # hand-built PCM mono 16-bit WAV with an ancillary LIST chunk BEFORE
    # data (the chunk walker must skip it), samples [-3, 0, 7, 100]
    samples = struct.pack("<4h", -3, 0, 7, 100)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 12 + 8 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    media = spark.createDataFrame(
        [(9, bytearray(payload))], "doc_id long, payload binary"
    )
    r = multimodal.decode_wav_audio(media).collect()[0]
    assert (r["sample_rate"], r["n_samples"], r["duration_ms"]) == (8000, 4, 0)
    assert r["mean_amp"] == 26.0 and r["max_amp"] == 100

    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxxAIFF"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a RIFF|ValueError"):
        multimodal.decode_wav_audio(bad).collect()


def test_y4m_decode_real_roundtrip(spark):
    import numpy as np

    # hand-built 2x2 C444 clip, 2 frames with known luma planes
    y0, y1 = bytes([10, 20, 30, 40]), bytes([1, 2, 3, 4])
    uv = bytes([128] * 4)
    payload = (
        b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C444\n"
        + b"FRAME\n" + y0 + uv + uv
        + b"FRAME\n" + y1 + uv + uv
    )
    media = spark.createDataFrame(
        [(5, bytearray(payload))], "doc_id long, payload binary"
    )
    r = multimodal.decode_y4m_video(media, max_frames=4).collect()[0]
    assert (r["width"], r["height"], r["n_frames"], r["n_sampled"]) == (2, 2, 2, 2)
    assert r["sampled_luma_sum"] == sum(y0) + sum(y1)

    bad = spark.createDataFrame(
        [(1, bytearray(b"MPEG4 nope\n"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a y4m|ValueError"):
        multimodal.decode_y4m_video(bad).collect()


def test_streaming_batch_parity(spark, tmp_path):
    from logspark import route, streaming

    corpus_path = str(tmp_path / "scorpus")
    synth.write_corpus(spark, 1500, corpus_path)
    batch_counts = {
        r["route"]: r["cnt"]
        for r in route.route_counts(
            pipeline.routed_hits(spark, spark.read.parquet(corpus_path))
        ).collect()
    }
    stream_counts = {
        r["route"]: r["cnt"]
        for r in streaming.run_available_now_counts(
            spark, corpus_path, str(tmp_path / "sckpt")
        ).collect()
    }
    assert stream_counts == batch_counts


def test_streaming_windowed_counts(spark, tmp_path):
    from logspark import streaming

    corpus_path = str(tmp_path / "wcorpus")
    synth.write_corpus(spark, 800, corpus_path)
    stream = streaming.read_corpus_stream(spark, corpus_path)
    routed = streaming.routed_stream(spark, stream)
    win = streaming.windowed_route_counts(routed, "6 hours")
    q = (
        win.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("win_counts")
    total = out.agg(F.sum("cnt")).collect()[0][0]
    # append mode only emits windows past the watermark; with bounded input
    # at least the early windows must have been finalized
    assert total is not None and total > 0
    assert out.filter(F.col("win_start").isNull()).count() == 0


def test_streaming_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Kill a stream mid-drain, restart it on the SAME checkpoint: the
    final fan-out counts must be exactly-once (no replayed duplicates, no
    gaps) — the streaming analog of the job's partition-resume guarantee."""
    from logspark import streaming

    corpus_path = str(tmp_path / "rcorpus")
    synth.write_corpus(spark, 1200, corpus_path, partitions=12)
    out = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rckpt")

    # first attempt: process a couple of micro-batches, then "crash"
    q = streaming.start_fanout_stream(spark, corpus_path, out, ckpt)
    import time

    deadline = time.time() + 60
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.5)
    q.stop()  # kill mid-drain (some batches committed, some not)
    q.awaitTermination()

    # restart on the same checkpoint: drains ONLY the remainder
    q2 = streaming.start_fanout_stream(spark, corpus_path, out, ckpt)
    q2.awaitTermination()

    back = spark.read.parquet(out)
    assert back.count() == 1200
    assert back.select("doc_id").distinct().count() == 1200


def test_fanout_salting_spreads_hot_sink(spark, small_corpus, tmp_path):
    """north_rule skew handling: the hot sink's rows carry >=2 distinct salt
    buckets so its write is shared by multiple tasks, and the physical
    layout lands multiple files for the dominant sink."""
    from logspark import pipeline, sinks

    routed = pipeline.routed_hits(spark, small_corpus)
    out = str(tmp_path / "fan")
    # at this toy size AQE rightly coalesces everything into one partition;
    # disable coalescing so the salted physical layout is observable
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(key, "false")
    try:
        sinks.write_fanout(routed, out, write_buckets=4, distribution="salted")
    finally:
        spark.conf.set(key, "true")
    import glob

    hot = max(
        glob.glob(out + "/sink=*"),
        key=lambda d: len(glob.glob(d + "/*.parquet")),
    )
    assert len(glob.glob(hot + "/*.parquet")) >= 2
    back = spark.read.parquet(out)
    buckets = (
        back.groupBy("sink").agg(F.countDistinct("bucket").alias("nb")).collect()
    )
    assert max(r["nb"] for r in buckets) >= 2


def test_stream_click_attribution_matches_batch(spark):
    """Stream-stream interval join == batch semantics, with both boundary
    cases: click exactly at view+horizon (inclusive) and click before the
    view (excluded)."""
    import datetime as dt

    from logspark import streaming

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, base, 1, "view", 1.0, "{}"),
        (2, base + 10 * m, 1, "click", 1.0, "{}"),   # +10min: match
        (3, base + 40 * m, 1, "click", 1.0, "{}"),   # +40min: outside
        (4, base + 5 * m, 2, "click", 1.0, "{}"),    # before view: no
        (5, base + 6 * m, 2, "view", 1.0, "{}"),
        (6, base + 36 * m, 2, "click", 1.0, "{}"),   # exactly +30: inclusive
        (7, base, 3, "view", 1.0, "{}"),             # other user: no cross
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = sorted(
        (r["view_id"], r["click_id"], r["user_id"])
        for r in streaming.click_attribution_stream(spark, df).collect()
    )
    assert out == [(1, 2, 1), (5, 6, 2)]


def test_streaming_session_windows_matches_batch(spark):
    """Append-mode session_window drain == batch session_window + the
    watermark-cutoff predicate (only sessions whose end the final
    watermark passed are emitted, each exactly once).

    The cutoff is applied in PYTHON on the collected batch rows, not as a
    DataFrame .filter() on session_end: Catalyst pushes a predicate on the
    grouping key below the aggregation, but session_window is a MERGING
    key — pushing `end < cutoff` below the merge drops events whose
    pre-merge single-event window [ts, ts+gap) already ends past the
    cutoff BEFORE they can extend an earlier session, fabricating a
    shorter session that wrongly passes the filter (observed on this very
    dataset: user 12's 6-event session ending 23:51 lost its last event
    and re-emerged as a phantom 5-event session ending 19:56)."""
    from logspark import streaming

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in streaming.session_windows_stream(spark, ev).collect()
    )
    mx = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as dt

    cutoff = mx - dt.timedelta(hours=1)
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    expect = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
        if r["session_end"] < cutoff
    )
    assert got == expect and len(got) > 0


def test_streaming_session_windows_merge_across_batches(spark, tmp_path):
    """A session whose events straddle a micro-batch boundary must MERGE in
    state (one emitted row covering both waves), and an open session (end
    not passed by the final watermark) must NOT be emitted."""
    import datetime as dt
    import os
    import uuid

    from logspark import streaming

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    # wave 1: user 1 events at t0 and t0+4h (within the 6h gap)
    w1 = spark.createDataFrame(
        [(1, t0, 1, "view", 1.0, "{}"), (2, t0 + 4 * h, 1, "view", 1.0, "{}")],
        schema,
    )
    # wave 2: t0+8h extends the SAME session across the batch boundary
    # (within 6h of t0+4h); t0+30h opens a second session; user 99's event
    # far in the future pushes the final watermark past every real session
    # but leaves its own session open (must not be emitted)
    w2 = spark.createDataFrame(
        [
            (3, t0 + 8 * h, 1, "view", 1.0, "{}"),
            (4, t0 + 30 * h, 1, "view", 1.0, "{}"),
            (5, t0 + 1000 * h, 99, "view", 1.0, "{}"),
        ],
        schema,
    )
    inp = str(tmp_path / "ev")
    w1.coalesce(1).write.mode("overwrite").parquet(f"{inp}/w=1")
    w2.coalesce(1).write.mode("append").parquet(f"{inp}/w=2")
    files = sorted(
        f"{d}/{f}"
        for d, _, fs in os.walk(inp)
        for f in fs
        if f.endswith(".parquet")
    )
    assert len(files) == 2
    # FileStreamSource batches by modification time: force wave order
    os.utime(files[0], (1_000_000, 1_000_000))
    os.utime(files[1], (2_000_000, 2_000_000))
    name = f"sess_merge_{uuid.uuid4().hex[:8]}"
    with streaming._drain_conf(spark):
        stream = (
            spark.readStream.schema(streaming.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(inp)
        )
        q = (
            streaming.session_windows_plan(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table(name).collect()
    )
    assert got == [
        (1, t0, t0 + 14 * h, 3),        # merged across the boundary
        (1, t0 + 30 * h, t0 + 36 * h, 1),
    ]


def test_job_anonymize_ip_scrubs_sinks(spark, tmp_path):
    """--anonymize-ip 1: every parsed IP landing in ANY sink column ends
    in .0 — including the token array, which carries the raw line's code
    points and would otherwise let every sink row reconstruct the address
    (ADVICE r2 high). Off by default."""
    from pyspark.sql import functions as F

    from logspark import job, synth, tokens

    corpus_path = str(tmp_path / "corpus")
    synth.write_corpus(spark, 500, corpus_path)
    out = str(tmp_path / "out")

    # reference run WITHOUT the flag: the raw addresses that must not
    # survive anywhere in the anonymized sinks
    raw_out = str(tmp_path / "raw_out")
    assert job.main(
        [
            "--input", corpus_path, "--output", raw_out,
            "--checkpoint", str(tmp_path / "raw_ckpt"),
            "--partitions", "4", "--run-id", "r0", "--cores", "8",
        ]
    ) == 0
    raw_ips = {
        r["ip"]
        for r in spark.read.parquet(raw_out).select("ip").distinct().collect()
        if r["ip"] is not None and not r["ip"].endswith(".0")
    }
    assert raw_ips, "expected raw IPs with a nonzero last octet"

    rc = job.main(
        [
            "--input", corpus_path, "--output", out,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--partitions", "4", "--run-id", "r1", "--cores", "8",
            "--anonymize-ip", "1",
        ]
    )
    assert rc == 0
    sinks_df = spark.read.parquet(out)
    ips = [
        r["ip"]
        for r in sinks_df.select("ip").collect()
        if r["ip"] is not None
    ]
    assert ips, "expected parsed IPs in sinks"
    assert all(ip.endswith(".0") for ip in ips)
    # the three kept octets must still be real (k-anonymity, not erasure)
    assert any(ip.rsplit(".", 1)[0].count(".") == 2 for ip in ips)

    # NO sink column can reconstruct a raw address: detokenize the stored
    # token arrays and scan every string-typed column for any raw IP
    detok = sinks_df.withColumn(
        "_line", tokens.detokenize_expr("tokens")
    )
    str_cols = [
        f.name
        for f in detok.schema.fields
        if f.dataType.simpleString() == "string"
    ]
    hits = detok.filter(
        F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in str_cols])
        .rlike("|".join(ip.replace(".", "\\.") for ip in raw_ips))
    ).count()
    assert hits == 0, "raw IP recoverable from an anonymized sink column"
    # and n_tok still matches the scrubbed array (invariant maintained)
    assert detok.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_anonymize_ip_flag_validation():
    """N outside [0,4] is rejected up front (argparse choices) and
    keep_octets outside [0,4] raises in enrich.anonymize_ip."""
    import pytest

    from logspark import enrich, job

    with pytest.raises(SystemExit):
        job.main(["--input", "x", "--output", "y", "--checkpoint", "z",
                  "--anonymize-ip", "5"])
    with pytest.raises(SystemExit):
        job.main(["--input", "x", "--output", "y", "--checkpoint", "z",
                  "--anonymize-ip", "-1"])
    with pytest.raises(ValueError):
        enrich.anonymize_ip("ip", keep_octets=-1)
    with pytest.raises(ValueError):
        enrich.anonymize_ip("ip", keep_octets=5)


def test_streaming_slo_alerts_matches_batch_ledger(spark, small_corpus):
    """The streamed (source, day, hour) SLO table equals the batch
    computation over the same routed corpus, breach flags included."""
    from logspark import pipeline, streaming

    got = {
        (r["source"], r["day"], r["hour"]): (
            r["n_req"],
            r["n_5xx"],
            r["breached"],
        )
        for r in streaming.slo_alerts_via_stream(spark, small_corpus).collect()
    }
    routed = pipeline.routed_hits(spark, small_corpus).filter(
        F.col("parsed_ok")
    )
    want = {
        (r["source"], r["day"], r["hour"]): (
            r["n_req"],
            r["n_5xx"],
            r["breached"],
        )
        for r in routed.groupBy(
            "source",
            F.dayofmonth("ts").alias("day"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count("*").alias("n_req"),
            F.sum(F.when(F.col("status") >= 500, 1).otherwise(0)).alias(
                "n_5xx"
            ),
        )
        .withColumn("breached", F.expr("n_5xx * 1000000 > n_req * 1000"))
        .collect()
    }
    assert got == want and len(got) > 0
