"""Training-data text operators over the documents corpus.

The operations a 100TB training-data pipeline needs beyond the reference's
own surface (per-round brief): deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard), language ID, quality scoring, token counting, document
fingerprinting. All are pure DataFrame ops (explode -> hash -> groupBy) with
DuckDB-oracle-portable hashing (logspark/portable_hash.py).

Scale notes (the point of each design):
  * explode(words) is a narrow op; the only shuffle is the groupBy(doc_id)
    hash-agg with map-side partial aggregation.
  * MinHash LSH: banding turns O(n^2) pair comparison into an equi-join on
    (band_id, band_hash) — shuffle keyed by band values; skewed bands (stop
    phrases) handled by AQE skew-join + the candidate-pair cap.
  * SimHash: 32 conditional sums in ONE aggregation pass (no per-bit scans).
  * exact dedup: hash-groupBy on a normalized key — at 10^12 rows this is
    the cheapest near-free pass; done FIRST to shrink the LSH input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logspark import portable_hash as ph

# ---------------------------------------------------------------------------
# word explosion (shared)
# ---------------------------------------------------------------------------


def words_df(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, word — whitespace tokenization, order-free ops downstream."""
    return docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, prefix_len: int = 60) -> DataFrame:
    """Hash-groupBy exact dedup on a normalized key (first prefix_len chars).

    Returns one row per duplicate group: key hash, representative (min
    doc_id), group size. At scale: single shuffle on the md5 key."""
    key = F.md5(F.substring(F.lower(F.col("text")), 1, prefix_len))
    return (
        docs.select(F.col("doc_id"), key.alias("dup_key"))
        .groupBy("dup_key")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("group_size"))
        .filter(F.col("group_size") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, num_perms: int = 4) -> DataFrame:
    """doc_id -> MinHash signature over the word set (portable hashing).

    The shared 32-bit word hash is hoisted into its own column so the md5
    digest is computed ONCE per word, not once per permutation (the perms
    are affine maps over the same hash; inlining ph.minhash_term_sql would
    re-derive the digest 8 hex-digit extractions x num_perms times)."""
    w = words_df(docs).withColumn("h32", F.expr(ph.hex32_sql("word")))
    aggs = [
        F.min(
            F.expr(
                f"({ph.MINHASH_PERMS[k][0]} * h32 + {ph.MINHASH_PERMS[k][1]})"
                f" % {ph.MERSENNE31}"
            )
        ).alias(f"mh{k}")
        for k in range(num_perms)
    ]
    return w.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 2) -> DataFrame:
    """Band the signature (2 hashes per band with 4 perms), self-join on
    equal band values -> candidate pairs (a < b).

    One pass: bands come from a single explode (not a per-band union that
    recomputes the signature aggregation per branch), and the self-join
    aliases the SAME banded plan so Spark's ReuseExchange materializes the
    band shuffle once and reads it from both sides."""
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            F.col(f"mh{2 * b}").cast("string"),
                            F.col(f"mh{2 * b + 1}").cast("string"),
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: one explode + ONE aggregation with 32
    conditional sums, then a recombine projection."""
    w = words_df(docs)
    sums = [
        F.sum(F.expr(ph.simhash_bit_sql("word", j))).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*sums)
    fp = F.expr(ph.simhash_fingerprint_sql([f"b{j}" for j in range(bits)]))
    return agg.select("doc_id", fp.alias("simhash"))


# ---------------------------------------------------------------------------
# n-gram Jaccard (banded to avoid O(n^2))
# ---------------------------------------------------------------------------


def jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Word-set Jaccard for candidate pairs sharing a cheap band (first
    word) — returns integer intersection/union sizes + the exact ratio."""
    first_word = F.substring_index(F.col("text"), " ", 1)
    d = docs.select("doc_id", first_word.alias("band"), "text")
    w = (
        d.select(
            "doc_id", "band", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .distinct()
    )
    sizes = w.groupBy("doc_id").agg(F.count("*").alias("nw"))
    a = w.select(
        F.col("band"), F.col("doc_id").alias("doc_a"), F.col("word")
    )
    b = w.select(
        F.col("band"), F.col("doc_id").alias("doc_b"), F.col("word")
    )
    inter = (
        a.join(b, ["band", "word"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nw").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nw").alias("nb"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    return j.select(
        "doc_a",
        "doc_b",
        "inter",
        (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
        (
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter"))
        ).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# language ID (marker n-gram heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " de "],
    "fr": [" le ", " et ", " un "],
}


def _occurrences(text, marker: str):
    return (F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))) / len(
        marker
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-occurrence scoring; deterministic tie-break by score order."""
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scores = {
        lang: sum(
            (_occurrences(padded, m) for m in ms), F.lit(0.0)
        ).alias(f"score_{lang}")
        for lang, ms in LANG_MARKERS.items()
    }
    d = docs.select("doc_id", *scores.values())
    pred = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr")),
            "en",
        )
        .when(F.col("score_es") >= F.col("score_fr"), "es")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("score_en").cast("long").alias("score_en"),
        F.col("score_es").cast("long").alias("score_es"),
        F.col("score_fr").cast("long").alias("score_fr"),
        pred.alias("lang_pred"),
    )


# ---------------------------------------------------------------------------
# quality scoring / token counting / fingerprint
# ---------------------------------------------------------------------------


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / word / stopword-ratio heuristics (integer-derived doubles so
    the oracle hashes identically)."""
    text = F.col("text")
    n_chars = F.length(text)
    n_words = F.size(F.split(text, " "))
    n_spaces = n_chars - F.length(F.replace(text, F.lit(" "), F.lit("")))
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    stop_hits = sum(
        (_occurrences(padded, m) for ms in LANG_MARKERS.values() for m in ms),
        F.lit(0.0),
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_words.alias("n_words"),
        (n_chars.cast("double") / n_words).alias("avg_word_len"),
        (stop_hits.cast("double") / n_words).alias("stopword_ratio"),
        (n_spaces.cast("double") / n_chars).alias("space_ratio"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + regex (BPE-ish word/number/punct) token count."""
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).alias("alpha_tokens"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-insensitive bag fingerprint: sum + count of portable word
    hashes (rolling-hash analog that parallelizes without positions)."""
    w = words_df(docs)
    h = F.expr(ph.hex32_sql("word"))
    return w.groupBy("doc_id").agg(
        F.sum(h).alias("fp_sum"),
        F.count("*").alias("fp_n"),
        F.min(h).alias("fp_min"),
    )
