"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct, per
the round brief. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested. Codec status: COMPRESSED codecs
(JPEG/audio/video) are stubbed (no PIL/librosa/ffmpeg in this container —
``decode_and_featurize`` raises NotImplementedError unless ``fake=True``),
but the UNCOMPRESSED paths are REAL: ``synth_ppm_images`` /
``decode_ppm_images`` emit and parse genuine binary P6 PPM files (numpy
header parse + buffer reshape, channel stats, an executed nearest-neighbor
resize) and ``synth_wav_audio`` / ``decode_wav_audio`` emit and parse
genuine PCM mono 16-bit RIFF/WAVE files (chunk-list walker that skips
ancillary chunks, little-endian int16 samples, exact amplitude stats),
and ``synth_y4m_video`` / ``decode_y4m_video`` emit and parse genuine
YUV4MPEG2 clips (header tags, FRAME-marker walk, uniform frame sampling
executed over decoded luma planes). All three are verified bit-exact
against closed-form DuckDB oracles (the pixel/sample formulas are
analytic, so a stride/header/alignment bug cannot hide).

Scale design: payloads never pass through Python row-at-a-time — decode /
feature-extract run in ``mapInPandas`` over Arrow batches, metadata-only
queries never touch the payload column (columnar pruning), and heavy decode
stages repartition by a payload-size-balanced key to avoid long-tail tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("nbytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents corpus: payload =
    md5 digest bytes of the text (16-byte opaque blob), metadata derived
    from doc fields. Pure column expressions, no RNG."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.unhex(F.md5("text"))
    meta = F.struct(
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        F.length(payload).cast("long").alias("nbytes"),
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def decode_and_featurize(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads and emit fixed-size features via mapInPandas.

    Real codecs (PIL/librosa/ffmpeg) are NOT in this container: with
    fake=False this raises NotImplementedError at executor time, which is
    the documented stub behavior. fake=True uses the deterministic byte-mean
    fake so tests exercise schema/batching/partitioning for real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "pass fake=True for the deterministic stub decoder"
                )
            payloads = pdf["payload"]
            # vectorized byte-mean: ONE flat uint8 buffer + add.reduceat
            # over per-row offsets — no per-row Python arithmetic (the
            # same batch shape a real numpy/PIL decode would use)
            lens = np.asarray(
                [0 if b is None else len(b) for b in payloads], dtype=np.int64
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            if len(lens) > 1:
                np.cumsum(lens[:-1], out=starts[1:])
            flat = np.frombuffer(
                b"".join(b for b in payloads if b), dtype=np.uint8
            )
            sums = np.zeros(len(lens), dtype=np.float64)
            nz = lens > 0
            if flat.size:
                sums[nz] = np.add.reduceat(
                    flat.astype(np.int64), starts[nz]
                ).astype(np.float64)
            feat_mean = np.divide(
                sums, lens, out=np.zeros_like(sums), where=nz
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "feat_mean": feat_mean,
                    "feat_dim": 1,
                }
            )

    # balance decode tasks by payload size bucket (long-tail avoidance)
    balanced = media.repartition(
        F.pmod(F.xxhash64("doc_id") + F.coalesce(F.col("meta.nbytes"), F.lit(0)), F.lit(64))
    )
    return balanced.mapInPandas(fn, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image codec path: PPM (P6) — an uncompressed format decodable with
# numpy alone, so this container CAN run a genuine decode (not a stub).
# Pixel bytes follow a closed-form formula of (doc_id, flat index), so the
# DuckDB oracle recomputes the decoded statistics analytically: any header
# mis-parse, stride bug or resize off-by-one mismatches the oracle.
# ---------------------------------------------------------------------------

PPM_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("resized_r_checksum", T.LongType()),
    ]
)


def synth_ppm_images(docs: DataFrame) -> DataFrame:
    """One REAL binary P6 image per image-kind doc (doc_id % 3 == 0):
    header ``P6\\n{w} {h}\\n255\\n`` + raw RGB rows. Dimensions and every
    pixel byte are pure functions of doc_id (byte j = (7d + 31j) % 256),
    mirroring the ingest edge that hands the pipeline opaque bytes."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 13 + 4, d % 11 + 3
                flat = (7 * d + 31 * np.arange(3 * w * h, dtype=np.int64)) % 256
                payload = (
                    f"P6\n{w} {h}\n255\n".encode("ascii")
                    + flat.astype(np.uint8).tobytes()
                )
                rows.append((d, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    imgs = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    return imgs.mapInPandas(
        gen, "doc_id long, payload binary"
    )


def decode_ppm_images(media: DataFrame, resize_to: int = 4) -> DataFrame:
    """REAL decode + resize over Arrow batches (mapInPandas, numpy only):
    parse the P6 header (magic, dims, maxval), reinterpret the raw buffer
    as (h, w, 3) uint8, emit per-channel means, then execute a genuine
    nearest-neighbor resize to resize_to x resize_to and checksum its red
    channel. Exact integer sums with one final int/int IEEE division, so
    the DuckDB closed-form oracle matches bit-for-bit."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                # header: magic + 3 whitespace-separated ints, then one
                # whitespace byte, then the raw pixel block
                if not buf.startswith(b"P6"):
                    raise ValueError(f"not a P6 ppm for doc {d}")
                toks, i, tok = [], 2, b""
                while len(toks) < 3:
                    c = buf[i : i + 1]
                    i += 1
                    if c.isspace():
                        if tok:
                            toks.append(int(tok))
                            tok = b""
                    else:
                        tok += c
                w, h, maxval = toks
                if maxval != 255:
                    raise ValueError(f"unsupported maxval {maxval}")
                px = np.frombuffer(buf, dtype=np.uint8, count=3 * w * h, offset=i)
                img = px.reshape(h, w, 3).astype(np.int64)
                sums = img.sum(axis=(0, 1))
                n = w * h
                ys = (np.arange(resize_to) * h) // resize_to
                xs = (np.arange(resize_to) * w) // resize_to
                resized = img[np.ix_(ys, xs)]
                out.append(
                    (
                        int(d),
                        w,
                        h,
                        float(int(sums[0])) / n,
                        float(int(sums[1])) / n,
                        float(int(sums[2])) / n,
                        int(resized[:, :, 0].sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                    "resized_r_checksum",
                ],
            )

    return media.mapInPandas(decode, PPM_DECODE_SCHEMA)


WAV_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("max_amp", T.IntegerType()),
    ]
)


def synth_wav_audio(docs: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """One REAL RIFF/WAVE file (PCM mono 16-bit) per audio-kind doc
    (doc_id % 3 == 1): full header chunk structure + little-endian int16
    samples. Sample i of doc d = ((11d + 17i) % 4096) - 2048 — analytic,
    so the decode oracle is closed-form."""
    import struct

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = d % 800 + 100
                samples = (
                    (11 * d + 17 * np.arange(n, dtype=np.int64)) % 4096 - 2048
                ).astype("<i2")
                data = samples.tobytes()
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVE"
                    + b"fmt "
                    + struct.pack(
                        "<IHHIIHH",
                        16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
                    )
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                rows.append((d, hdr + data))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    auds = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    return auds.mapInPandas(gen, "doc_id long, payload binary")


def decode_wav_audio(media: DataFrame) -> DataFrame:
    """REAL WAV decode (numpy + struct only): walk the RIFF chunk list
    (fmt may be followed by ancillary chunks before data), validate PCM
    mono 16-bit, reinterpret the data chunk as little-endian int16, emit
    rate/duration and exact integer amplitude stats."""
    import struct

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
                    raise ValueError(f"not a RIFF/WAVE file for doc {d}")
                pos, fmt, data = 12, None, None
                while pos + 8 <= len(buf):
                    cid = buf[pos : pos + 4]
                    (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
                    body = buf[pos + 8 : pos + 8 + sz]
                    if cid == b"fmt ":
                        fmt = struct.unpack("<HHIIHH", body[:16])
                    elif cid == b"data":
                        data = body
                    pos += 8 + sz + (sz & 1)  # chunks are word-aligned
                if fmt is None or data is None:
                    raise ValueError(f"missing fmt/data chunk for doc {d}")
                audio_format, channels, rate, _, _, bits = fmt
                if (audio_format, channels, bits) != (1, 1, 16):
                    raise ValueError(f"unsupported wav encoding {fmt}")
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = len(samples)
                out.append(
                    (
                        int(d),
                        rate,
                        n,
                        n * 1000 // rate,
                        float(int(samples.sum())) / n,
                        int(samples.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "duration_ms",
                    "mean_amp",
                    "max_amp",
                ],
            )

    return media.mapInPandas(decode, WAV_DECODE_SCHEMA)


Y4M_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_luma_sum", T.LongType()),
    ]
)


def synth_y4m_video(docs: DataFrame) -> DataFrame:
    """One REAL YUV4MPEG2 (C444) clip per video-kind doc (doc_id % 3 == 2):
    plain-text stream header, then per frame a ``FRAME\\n`` marker + Y,U,V
    planes. Luma byte j of frame f for doc d = (13d + 7f + 5j) % 256 —
    analytic, so frame-sampled decode stats have a closed-form oracle."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 8 + 4, d % 6 + 3
                nf = d % 12 + 2
                parts = [
                    f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()
                ]
                npix = w * h
                for f in range(nf):
                    y = (13 * d + 7 * f + 5 * np.arange(npix, dtype=np.int64)) % 256
                    u = np.full(npix, 128, dtype=np.int64)
                    v = np.full(npix, 128, dtype=np.int64)
                    parts.append(
                        b"FRAME\n"
                        + y.astype(np.uint8).tobytes()
                        + u.astype(np.uint8).tobytes()
                        + v.astype(np.uint8).tobytes()
                    )
                rows.append((d, b"".join(parts)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    vids = docs.filter(F.col("doc_id") % 3 == 2).select("doc_id")
    return vids.mapInPandas(gen, "doc_id long, payload binary")


def decode_y4m_video(media: DataFrame, max_frames: int = 4) -> DataFrame:
    """REAL video decode + frame sampling (numpy only): parse the
    YUV4MPEG2 stream header tags (W/H/C), walk the FRAME markers, then
    EXECUTE the uniform frame-sample schedule (frame_sample_plan's
    formula: k-th sampled index = floor(k * n_frames / n_sampled)) and sum
    the luma plane of exactly the sampled frames."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                nl = buf.index(b"\n")
                hdr = buf[:nl].split(b" ")
                if hdr[0] != b"YUV4MPEG2":
                    raise ValueError(f"not a y4m stream for doc {d}")
                tags = {t[:1]: t[1:] for t in hdr[1:]}
                w, h = int(tags[b"W"]), int(tags[b"H"])
                if tags.get(b"C", b"444") != b"444":
                    raise ValueError("only C444 supported")
                npix = w * h
                frame_bytes = 3 * npix
                frames = []
                pos = nl + 1
                while pos < len(buf):
                    fnl = buf.index(b"\n", pos)
                    if buf[pos:fnl].split(b" ")[0] != b"FRAME":
                        raise ValueError(f"bad frame marker for doc {d}")
                    frames.append(
                        np.frombuffer(
                            buf, dtype=np.uint8, count=npix, offset=fnl + 1
                        ).astype(np.int64)
                    )
                    pos = fnl + 1 + frame_bytes
                nf = len(frames)
                ns = min(max_frames, nf)
                idx = [(k * nf) // ns for k in range(ns)]
                luma = sum(int(frames[i].sum()) for i in idx)
                out.append((int(d), w, h, nf, ns, luma))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_frames",
                    "n_sampled",
                    "sampled_luma_sum",
                ],
            )

    return media.mapInPandas(decode, Y4M_DECODE_SCHEMA)


def frame_sample_plan(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Uniform frame-sampling SCHEDULE for video rows: one row per sampled
    frame with its timestamp. ~1 frame/sec capped at max_frames, uniformly
    spaced over the clip. Pure column math + one explode (no shuffle, no
    Python) — the schedule is DuckDB-oracle-checkable; fetching/DECODING the
    frame at each timestamp is the stubbed codec boundary
    (decode_and_featurize). Returns (doc_id, duration_ms, n_frames,
    frame_idx, frame_time_ms)."""
    v = media.filter(F.col("kind") == "video").select(
        "doc_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    n = F.expr(
        f"CAST(least({max_frames}, greatest(1, floor(duration_ms / 1000))) AS INT)"
    )
    return (
        v.withColumn("n_frames", n)
        .select(
            "doc_id",
            "duration_ms",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1)
            ).alias("frame_idx"),
        )
        .withColumn(
            "frame_time_ms",
            F.expr("CAST(floor(frame_idx * duration_ms / n_frames) AS INT)"),
        )
    )


def resize_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize plan for image rows: fit within
    target x target, never upscale. Integer math only (floor of exact
    ratios), so the plan is engine-portable and oracle-checkable; executing
    the resample over payload bytes is the stubbed codec boundary."""
    m = media.filter(F.col("kind") == "image").select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    mx = F.greatest("width", "height")
    out_w = F.expr(
        f"CAST(floor(width * {target} / greatest(width, height)) AS INT)"
    )
    out_h = F.expr(
        f"CAST(floor(height * {target} / greatest(width, height)) AS INT)"
    )
    return m.select(
        "doc_id",
        "width",
        "height",
        F.when(mx <= target, F.col("width")).otherwise(out_w).alias("out_w"),
        F.when(mx <= target, F.col("height")).otherwise(out_h).alias("out_h"),
        (mx > target).alias("downscaled"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must never read the payload column
    (check .explain ReadSchema when backed by parquet)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("cnt"),
        F.sum("meta.nbytes").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
    )
