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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logspark import portable_hash as ph

# ---------------------------------------------------------------------------
# word explosion (shared)
# ---------------------------------------------------------------------------


def words_df(
    docs: DataFrame, text_col: str = "text", carry: list[Column] | None = None
) -> DataFrame:
    """doc_id, word [+ carry cols] — whitespace tokenization, order-free ops
    downstream. ``carry`` rides extra per-doc columns through the explode
    (narrow — no join needed to re-attach doc metadata) so every word-level
    operator shares this ONE tokenization rule."""
    return docs.select(
        "doc_id",
        *(carry or []),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    ).filter(F.col("word") != "")


def shingles_df(docs: DataFrame, k: int = 2, text_col: str = "text") -> DataFrame:
    """doc_id, shingle — overlapping k-word shingles.

    MinHash similarity runs over SHINGLES, not unigrams: with a small
    vocabulary (the test corpus has 31 distinct words) unigram word sets of
    unrelated documents overlap almost completely (measured J >= 0.7 for
    37% of all pairs), so no banding geometry can be selective. k-word
    shingles raise the effective vocabulary to |V|^k and make unrelated
    documents' sets nearly disjoint — only true near-duplicates collide.
    Narrow op: split once, one transform+explode, no shuffle."""
    sh = F.expr(
        f"transform(sequence(1, size(ws) - {k - 1}), "
        f"i -> concat_ws(' ', slice(ws, i, {k})))"
    )
    return (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("ws"))
        .filter(F.size("ws") >= k)
        .select("doc_id", F.explode(sh).alias("shingle"))
    )


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


# LSH geometry for real near-dup selectivity (round-1 lesson: 4 perms / 2
# bands of 2 matched 63% of all n^2 pairs — an effective all-pairs join at
# scale). 128 perms in 16 bands of 8 puts the s-curve threshold at
# (1/16)^(1/8) ~= 0.71 Jaccard: only near-duplicates band-collide.
NUM_PERMS = 128
LSH_ROWS_PER_BAND = 8


def minhash_signatures(
    docs: DataFrame, num_perms: int = 4, shingle_k: int = 2
) -> DataFrame:
    """doc_id -> MinHash signature over the word set (portable hashing).

    The md5 digest and the shared 32-bit word hash are hoisted into their
    own columns (separate stacked projections — CollapseProject keeps
    non-cheap expressions from being re-inlined), so the digest is computed
    ONCE per word, not once per hex digit x permutation. The perms are
    affine maps over the same hash: num_perms aggregates cost num_perms
    multiply-adds per token, ONE aggregation pass, one shuffle.

    Tokens are k-word shingles (see shingles_df for why unigrams cannot be
    selective on a small vocabulary)."""
    w = (
        shingles_df(docs, k=shingle_k)
        .withColumn("dg", F.md5("shingle"))
        .withColumn("h32", F.expr(ph.hex32_from_digest_sql("dg")))
    )
    aggs = [
        F.min(F.expr(ph.minhash_perm_sql("h32", k))).alias(f"mh{k}")
        for k in range(num_perms)
    ]
    return w.groupBy("doc_id").agg(*aggs)


def lsh_bands(signatures: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """Signature -> (doc_id, band, band_key) via a single explode (not a
    per-band union that recomputes the signature aggregation per branch)."""
    mh_cols = [c for c in signatures.columns if c.startswith("mh")]
    bands = len(mh_cols) // rows_per_band
    return signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{b * rows_per_band + r}").cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.band_key")


def lsh_candidate_pairs(
    signatures: DataFrame, rows_per_band: int = 2
) -> DataFrame:
    """Band the signature, self-join on equal band values -> candidate
    pairs (a < b). Geometry is inferred from the signature width: bands =
    n_perms / rows_per_band.

    The self-join aliases the SAME banded plan so Spark's ReuseExchange
    materializes the band shuffle once and reads it from both sides; the
    join key is (band, band_key) — a plain hash shuffle that stays balanced
    at any scale when the banding is selective (see NUM_PERMS note)."""
    banded = lsh_bands(signatures, rows_per_band)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def minhash_neardup_verified(
    docs: DataFrame,
    num_perms: int = NUM_PERMS,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    threshold: float = 0.7,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Full MinHash-LSH dedup path: shingle -> minhash -> tuned banding ->
    candidate pairs -> exact shingle-set Jaccard verify >= threshold.

    This is the 100TB-scale shape: the only joins are (band, band_key)
    equi-joins over selective keys and candidate-keyed shingle-intersection
    counts; no stage is O(n^2). Candidate selectivity at sf0.01 is ~0.02%
    of all pairs (vs 63% with the round-1 unigram geometry)."""
    cand = lsh_candidate_pairs(
        signatures if signatures is not None else minhash_signatures(docs, num_perms),
        rows_per_band,
    )
    w = shingles_df(docs).distinct()
    sizes = w.groupBy("doc_id").agg(F.count("*").alias("nw"))
    wa = w.select(F.col("doc_id").alias("doc_a"), "shingle")
    wb = w.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(wa, "doc_a")
        .join(wb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nw").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nw").alias("nb"))
    j = inter.join(sa, "doc_a").join(sb, "doc_b")
    uni = F.col("na") + F.col("nb") - F.col("inter")
    return (
        j.select(
            "doc_a",
            "doc_b",
            "inter",
            uni.alias("uni"),
            (F.col("inter").cast("double") / uni).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_estimate_eval(
    docs: DataFrame,
    num_perms: int = NUM_PERMS,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Grade the MinHash ESTIMATOR itself on every LSH candidate pair:
    the signature-agreement estimate (agreeing components / num_perms —
    the unbiased MinHash Jaccard estimator) next to the exact
    shingle-set Jaccard. Completes the eval-the-sketch series
    (ann_recall_eval, cms_heavy_hitters, bloom_membership): before
    trusting a sketch at 100 TB you measure its error on ground truth.

    Scale shape: candidate-pair-sized equi-joins against the signature
    table; the 128-component agreement is ONE zip_with/aggregate
    higher-order expression over two array columns — bounded codegen,
    not 128 unrolled comparisons (the round-1 Janino 64 KB lesson)."""
    # ONE signature pass shared by both consumers: the estimate side and
    # the candidate/verify side each need the full signature table, and as
    # separate lazy plans the shingle->md5->min aggregation would run twice
    # (lineage-truncating checkpoint = the stored signature table a
    # production index would read). A caller that already materialized the
    # signature table (the contract's shared _minhash_sigs pass) hands it
    # in via ``signatures`` and the pass is not rebuilt at all.
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, num_perms).localCheckpoint(eager=False)
    )
    exact = minhash_neardup_verified(
        docs, num_perms, rows_per_band, threshold=0.0, signatures=sigs
    )
    mh = [f"mh{k}" for k in range(num_perms)]
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), F.array(*mh).alias("sig_a")
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), F.array(*mh).alias("sig_b")
    )
    agree = F.expr(
        "aggregate(zip_with(sig_a, sig_b, "
        "(x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0, "
        "(acc, v) -> acc + v)"
    )
    return (
        exact.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            agree.alias("mh_agree"),
            (agree.cast("double") / num_perms).alias("mh_est"),
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: one explode + ONE aggregation with 32
    conditional sums, then a recombine projection. The md5 digest is
    hoisted to ONE column per word — inlining it into each bit expression
    recomputes 32 digests/word (measured 2x wall time in round 1)."""
    w = words_df(docs).withColumn("dg", F.md5("word"))
    sums = [
        F.sum(F.expr(ph.simhash_bit_from_digest_sql("dg", j))).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*sums)
    fp = F.expr(ph.simhash_fingerprint_sql([f"b{j}" for j in range(bits)]))
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_neardup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs via Hamming-ball LSH.

    The 32-bit fingerprint is split into 4 bands of 8 bits; by pigeonhole
    any pair within Hamming distance 3 agrees on at least one band, so the
    (band, band_value) equi-self-join has EXACT recall for the <=3-ball —
    no O(n^2) stage, same scale shape as the MinHash path. Candidates are
    verified with bit_count(xor) <= max_hamming (popcount is exact, so
    precision is exact too). max_hamming > 3 would need more bands
    (pigeonhole: bands > max_hamming).

    Scale note: 8-bit bands give only 256 buckets/band — at 10^9+ docs a
    bucket holds millions and the within-bucket join goes quadratic. The
    production geometry is a 64-bit fingerprint with 16-bit bands (65,536
    buckets; 4 bands still covers distance <= 3), optionally sub-banded a
    second time inside hot buckets. The 32-bit/8-bit choice here matches
    the DuckDB-portable fingerprint and the test-corpus size.

    Returns (doc_a, doc_b, hamming)."""
    assert max_hamming < 4, "4 bands guarantee recall only for distance <= 3"
    sh = simhash(docs)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"CAST(floor(simhash / {2 ** (8 * b)}) AS BIGINT) % 256"
                        ).alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.band_val")
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(b, ["band", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (banded to avoid O(n^2))
# ---------------------------------------------------------------------------


def jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Word-set Jaccard for candidate pairs sharing a cheap band — returns
    integer intersection/union sizes + the exact ratio.

    The band is the first 2-WORD shingle, not the first word: single-word
    bands are a skew magnet (documents opening with a stop word all land in
    one band, and within-band candidacy is quadratic). The bigram band has
    |V|^2 possible values, so band populations stay small and the
    within-band join stays near-linear. The tuned MinHash-LSH path
    (minhash_neardup_verified) remains the real scale path; this op is the
    exact-Jaccard demo over a cheap candidate rule."""
    # F.get (not element_at): out-of-bounds returns NULL under ANSI mode
    # too, so one-word documents band as "word " instead of aborting
    first_bigram = F.concat(
        F.substring_index(F.col("text"), " ", 1),
        F.lit(" "),
        F.coalesce(F.get(F.split(F.col("text"), " "), 1), F.lit("")),
    )
    d = docs.select("doc_id", first_bigram.alias("band"), "text")
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


def curate_corpus(
    docs: DataFrame,
    min_words: int = 12,
    max_avg_word_len: float = 6.0,
    langs: tuple = ("en", "es", "fr"),
    jaccard_threshold: float = 0.7,
    near_pairs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end training-data curation verdict per document — the
    composition a 100TB pretraining pipeline runs as one pass:

      1. quality gate   (too short / implausible word lengths)
      2. language gate  (no recognized language markers at all)
      3. exact-dup      (non-keeper of an exact duplicate group)
      4. near-dup       (larger doc_id of a verified MinHash-LSH pair)

    First matching reason wins (deterministic). Returns
    (doc_id, drop_reason, keep) for EVERY input document.

    Scale shape: the gates are pure column expressions; the dedup legs are
    the same bucketed designs as dedup_exact / minhash_neardup_verified
    (no O(n^2) stage anywhere); the final assembly is three left joins on
    doc_id against SMALL loser sets (losers are a fraction of the corpus;
    at extreme dup rates they are still < n and join on the primary key).

    ``near_pairs``: pass an already-computed minhash_neardup_verified
    result (>= jaccard_threshold) to reuse one materialization across the
    pipeline's consumers instead of re-running the full
    shingle -> minhash -> band -> verify pass here."""
    q = quality_scores(docs).select(
        "doc_id", "n_words", "avg_word_len"
    )
    lang = lang_id(docs).select(
        "doc_id",
        (F.col("score_en") + F.col("score_es") + F.col("score_fr")).alias(
            "lang_signal"
        ),
        "lang_pred",
    )
    # FULL-content hash (unlike exact_dedup_groups' prefix fingerprint):
    # curation must not mistake a prefix-sharing near-duplicate for an
    # exact one — those belong to the near_dup leg's Jaccard verdict
    key = F.md5(F.lower(F.col("text")))
    d = docs.select("doc_id", key.alias("dup_key"))
    keepers = d.groupBy("dup_key").agg(F.min("doc_id").alias("keeper"))
    exact_losers = (
        d.join(keepers, "dup_key")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id", F.lit(True).alias("is_exact_loser"))
    )
    if near_pairs is None:
        near_pairs = minhash_neardup_verified(docs, threshold=jaccard_threshold)
    near_losers = (
        near_pairs.select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("is_near_loser", F.lit(True))
    )
    j = (
        q.join(lang, "doc_id")
        .join(exact_losers, "doc_id", "left")
        .join(near_losers, "doc_id", "left")
    )
    reason = (
        F.when(
            (F.col("n_words") < min_words)
            | (F.col("avg_word_len") > max_avg_word_len),
            "quality",
        )
        .when(
            (F.col("lang_signal") <= 0) | ~F.col("lang_pred").isin(*langs),
            "language",
        )
        .when(F.col("is_exact_loser"), "exact_dup")
        .when(F.col("is_near_loser"), "near_dup")
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        "doc_id",
        reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


def tfidf_top_terms(docs: DataFrame, top_k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    Scale shape: tf is the one corpus-sized shuffle (groupBy doc_id, word
    with map-side partial agg); document frequency and the corpus size are
    VOCABULARY-sized / scalar aggregates broadcast back — the scoring join
    never shuffles the corpus again. The final top-k is a per-doc-id
    window over k<=|vocab| rows per doc.

    Cross-engine float parity: tfidf = tf * ln(n_docs / df) — one division,
    one ln, one multiply, identical association order in the DuckDB oracle;
    ties in the ranking are broken by word so the row_number is total."""
    from pyspark.sql.window import Window

    w = words_df(docs)
    tf = w.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = (
        w.select("doc_id", "word")
        .distinct()
        .groupBy("word")
        .agg(F.count("*").alias("df"))
    )
    ndocs = docs.select(F.count("*").alias("n_docs"))
    tfidf = F.col("tf") * F.log(
        F.col("n_docs").cast("double") / F.col("df")
    )
    ranked = (
        tf.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(ndocs))
        .select("doc_id", "word", "tf", "df", tfidf.alias("tfidf"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("tfidf"), F.asc("word")
                )
            ),
        )
    )
    return ranked.filter(F.col("rk") <= top_k)


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document mean unigram surprisal — a corpus-LM quality signal
    (high mean surprisal = rare-word soup / noise; low = templated text).

    Float-parity design: the per-word surprisal -ln(freq/total) is floored
    into MICRO-NATS (bigint) before summation, so the per-doc sum is an
    integer sum — order-free, unlike a double sum whose value depends on
    association order (Spark and DuckDB aggregate in different orders).
    The word-frequency table is vocabulary-sized and broadcast; the only
    corpus-sized shuffle is the per-doc aggregation."""
    w = words_df(docs)
    freq = w.groupBy("word").agg(F.count("*").alias("wfreq"))
    tot = w.select(F.count("*").alias("total_words"))
    unats = F.floor(
        -F.log(F.col("wfreq").cast("double") / F.col("total_words"))
        * F.lit(1000000.0)
    ).cast("long")
    per_word = (
        w.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", unats.alias("unats"))
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.sum("unats").alias("surprisal_sum"),
            F.count("*").alias("n_words"),
        )
        .select(
            "doc_id",
            "surprisal_sum",
            "n_words",
            (F.col("surprisal_sum").cast("double") / F.col("n_words")).alias(
                "mean_surprisal_unat"
            ),
        )
    )


def bigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document mean bigram CONDITIONAL surprisal -ln(c(w1 w2)/c(w1))
    — the 2-gram LM upgrade of unigram_surprisal (catches locally-fluent
    but rare-transition text that unigram stats miss). Same float-parity
    design: each term floored to integer micro-nats before the per-doc
    sum, so aggregation order cannot change the value.

    Scale shape: the bigram and unigram count tables are vocabulary-sized
    (|V| and up to |V|^2) and broadcast while they fit; at web scale flip
    the bigram join to a plain shuffle equi-join on the bigram key — the
    shape stays a counts-join + one per-doc aggregate either way."""
    w = words_df(docs)
    wfreq = w.groupBy("word").agg(F.count("*").alias("wfreq"))
    bg = shingles_df(docs, k=2).withColumn(
        "w1", F.split(F.col("shingle"), " ").getItem(0)
    )
    bfreq = bg.groupBy("shingle").agg(F.count("*").alias("bfreq"))
    unats = F.floor(
        -F.log(F.col("bfreq").cast("double") / F.col("wfreq"))
        * F.lit(1000000.0)
    ).cast("long")
    per_bg = (
        bg.join(F.broadcast(bfreq), "shingle")
        .join(F.broadcast(wfreq), F.col("w1") == F.col("word"))
        .select("doc_id", unats.alias("unats"))
    )
    return (
        per_bg.groupBy("doc_id")
        .agg(
            F.sum("unats").alias("surprisal_sum"),
            F.count("*").alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "surprisal_sum",
            "n_bigrams",
            (
                F.col("surprisal_sum").cast("double") / F.col("n_bigrams")
            ).alias("mean_surprisal_unat"),
        )
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality rules):
    distinct-word ratio and top-bigram share — templated/spammy text has a
    low distinct ratio and one bigram dominating.

    Scale shape: two corpus-sized shuffles, both keyed by doc_id content
    ((doc_id) and (doc_id, bigram) with map-side partial aggs), then a
    doc-sized join. Float parity: each ratio is ONE division of two exact
    integers — bit-identical cross-engine, no association-order exposure.
    Documents with fewer than 2 words have no bigram row and are dropped
    by the inner join (oracle matches)."""
    w = words_df(docs)
    wstats = w.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.countDistinct("word").alias("n_distinct"),
    )
    bg = (
        shingles_df(docs, k=2)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("c"))
    )
    bstats = bg.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams")
    )
    return wstats.join(bstats, "doc_id").select(
        "doc_id",
        "n_words",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_words")).alias(
            "distinct_ratio"
        ),
        "n_bigrams",
        "top_bigram_n",
        (F.col("top_bigram_n").cast("double") / F.col("n_bigrams")).alias(
            "top_bigram_share"
        ),
    )


def span_dedup_stats(docs: DataFrame, k: int = 5) -> DataFrame:
    """Exact duplicated-SPAN statistics per document: the fraction of a
    document's k-word windows that also occur verbatim in at least one
    OTHER document (the window-level exact-substring dedup signal of
    Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better" — scaled from their 50-token suffix-array spans to k-word
    windows). Complements MinHash (whole-doc near-dup) by catching
    boilerplate/quotation PARTIAL overlap that document-level Jaccard
    dilutes away.

    Returns (doc_id, n_win, n_shared, shared_frac): distinct windows in
    the doc, those whose window text appears in >= 2 distinct docs, and
    their ratio (ONE int/int division — bit-identical cross-engine).
    Docs with < k words have no window row (consistent cross-engine).

    Scale shape (3 shuffles, NO join): distinct (doc_id, window) pairs;
    a count(*) window partitioned by the window text (no orderBy ->
    no sort, just a per-key count); final groupBy doc_id. The per-window
    doc count never materializes a shingle->count table to join back.
    Skew: a corpus-hot boilerplate window lands on one partition — its
    row count is bounded by the number of docs containing it; at extreme
    scale swap the analytic count for a salted two-level agg + broadcast
    of the (tiny) >=2-doc window set."""
    from pyspark.sql.window import Window

    w = shingles_df(docs, k=k).distinct()
    n_docs_w = F.count("*").over(Window.partitionBy("shingle"))
    marked = w.select(
        "doc_id", (n_docs_w >= 2).cast("int").alias("is_shared")
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_win"),
            F.sum("is_shared").alias("n_shared"),
        )
        .withColumn(
            "shared_frac",
            F.col("n_shared").cast("double") / F.col("n_win"),
        )
    )


def with_split(docs: DataFrame) -> DataFrame:
    """Append the deterministic split bucket + label as a NARROW map (pure
    function of doc_id — never a join): any consumer that needs the split
    computes it in place, so at 100 TB no corpus-sized split table is ever
    joined or broadcast."""
    return docs.withColumn(
        "dg", F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    ).withColumn(
        "bucket", F.expr(ph.hex32_from_digest_sql("dg")) % 1000
    ).withColumn(
        "split",
        F.when(F.col("bucket") < 800, "train")
        .when(F.col("bucket") < 900, "val")
        .otherwise("test"),
    )


def train_split(docs: DataFrame) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment from the portable
    hash of doc_id — the reproducible-split primitive of a training-data
    pipeline (no rand(): re-runs, resumes and backfills all agree, and the
    DuckDB oracle computes the identical buckets).

    Scale shape: pure per-row map (narrow, no shuffle); the split column
    is also the natural partition key for a bucketed write."""
    return with_split(docs).select("doc_id", "bucket", "split")


def stratified_sample(docs: DataFrame, cap: int = 50) -> DataFrame:
    """Per-source capped deterministic sample: keep the ``cap`` docs with
    the smallest portable hash in each source stratum — balanced-corpus
    downsampling (head sources stop drowning tail sources) that is fully
    reproducible, unlike rand()-based sampling.

    Scale shape: one shuffle keyed by source, then a within-partition
    rank. Source-count strata are bounded, but a pathological stratum is a
    skew risk — at extreme scale flip to the two-pass variant: aggregate
    per-source counts (vocabulary-sized, broadcast back) and keep rows
    with hash < cap/count threshold (approximate cap, no sort). The exact
    rank version here is the oracle-checkable form; hash then doc_id makes
    the order total so ranks are deterministic."""
    from pyspark.sql.window import Window

    d = docs.withColumn(
        "dg", F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string")))
    ).withColumn("h", F.expr(ph.hex32_from_digest_sql("dg")))
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    )
    return (
        d.select("doc_id", "source", "h", rk.alias("rk"))
        .filter(F.col("rk") <= cap)
        .select("doc_id", "source", "rk")
    )


def weighted_sample(docs: DataFrame, k: int = 100) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-ES exponential keys): keep the ``k`` documents with
    the largest ln(u)/weight, where u is a deterministic uniform drawn
    from the portable hash of doc_id and weight = n_chars. Length-
    proportional document sampling approximates uniform-over-TOKENS
    sampling — LLM data recipes state mixture weights in tokens, not
    documents, so the sampler must too (reference analog: the importer's
    --skip/sampling knobs pick raw lines, import_logs.py config surface).

    Determinism + float parity: u = (h+1)/2^32 is an exactly-representable
    double (h is the 32-bit portable hash, so numerator and denominator
    are both exact); the key is ONE ln and ONE divide in fixed order,
    floored to integer pico-units BEFORE the top-k comparison, so both
    engines rank identical integers; remaining ties break on doc_id.

    Scale shape: per-row map + global top-k (TakeOrderedAndProject — each
    task keeps its local k, the driver merges P*k rows; no global sort, no
    corpus shuffle). At 10^12 rows with a k too large for the driver, flip
    to the threshold form: estimate the k-th key from a pilot sample, keep
    rows with key >= threshold, exact-rank only the survivors — same key
    arithmetic, two narrow passes."""
    d = docs.withColumn(
        "dg", F.md5(F.concat(F.lit("wsamp:"), F.col("doc_id").cast("string")))
    ).withColumn("h", F.expr(ph.hex32_from_digest_sql("dg")))
    key_punit = F.floor(
        F.log((F.col("h") + 1).cast("double") / F.lit(4294967296.0))
        / F.col("n_chars").cast("double")
        * F.lit(1000000000000.0)
    ).cast("long")
    return (
        d.select("doc_id", "source", "n_chars", key_punit.alias("akey_punit"))
        .orderBy(F.desc("akey_punit"), F.asc("doc_id"))
        .limit(k)
    )


def decontaminate(docs: DataFrame, k: int = 5) -> DataFrame:
    """Benchmark decontamination: train-split documents that share at
    least one k-word shingle with any test-split document (the classic
    n-gram-overlap contamination check run before every pretraining job;
    production pipelines use k of 8-13 — k=5 here because the synthetic
    corpus averages ~54 words/doc).

    Returns one row per contaminated train doc:
      doc_id, n_shingles_hit (distinct contaminating shingles),
      n_test_docs (distinct test docs it collides with).

    Scale shape: the held-out/benchmark side is tiny relative to a 100 TB
    train corpus, so its (test_doc, shingle) pairs are BROADCAST — the
    contamination check is a map-side hash join over the streamed train
    shingles (no shuffle of the big side); only the per-hit rows (rare)
    reach the final small groupBy. Reference analog: the validity rules
    that exclude known-bad sources before ingest (lib_validity checks) —
    here lifted to content-level overlap.

    The split label is computed IN PLACE on each scan branch (with_split,
    a pure doc_id map) — never joined: a corpus-sized doc_id->split join
    (the naive formulation) would broadcast or shuffle the whole corpus at
    scale for a value derivable per-row."""
    d = with_split(docs)
    test_sh = shingles_df(d.filter(F.col("split") == "test"), k=k).distinct(
    ).select(F.col("doc_id").alias("test_doc"), "shingle")
    train_sh = shingles_df(
        d.filter(F.col("split") == "train"), k=k
    ).distinct()
    hits = train_sh.join(F.broadcast(test_sh), "shingle")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_shingles_hit"),
        F.countDistinct("test_doc").alias("n_test_docs"),
    )


def incremental_dedup(
    docs: DataFrame,
    num_perms: int = NUM_PERMS,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    threshold: float = 0.7,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Continuous-crawl dedup: a NEW batch checked against a HISTORICAL
    corpus index (not self-join dedup — the index side is precomputed and
    stored in production; a new crawl snapshot only pays banding for its
    own rows plus an equi-join against the index). History/batch split is
    deterministic here (even/odd doc_id) so the oracle reproduces it.

    Returns verified (new_doc, hist_doc, jaccard >= threshold) matches —
    the drop-list join key for the ingest filter.

    Scale shape: ONE signature pass over the union (sf-test convenience;
    at scale the history banding is a stored table), then a (band,
    band_key) equi-join — batch-sized left against index-sized right,
    selective keys (128 perms / 16 bands, s-curve ~0.71) — and a
    candidate-keyed exact-Jaccard verify identical to
    minhash_neardup_verified. No O(n^2) stage; index growth only widens
    the hash join's build side, which shuffles on selective band keys."""
    sig = (
        signatures
        if signatures is not None
        else minhash_signatures(docs, num_perms)
    )
    banded = lsh_bands(sig, rows_per_band)
    nb = banded.filter(F.col("doc_id") % 2 == 1)
    hb = banded.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("hist_doc"), "band", "band_key"
    )
    cand = (
        nb.join(hb, ["band", "band_key"])
        .select(F.col("doc_id").alias("new_doc"), "hist_doc")
        .distinct()
    )
    w = shingles_df(docs).distinct()
    sizes = w.groupBy("doc_id").agg(F.count("*").alias("nw"))
    wa = w.select(F.col("doc_id").alias("new_doc"), "shingle")
    wb = w.select(F.col("doc_id").alias("hist_doc"), "shingle")
    inter = (
        cand.join(wa, "new_doc")
        .join(wb, ["hist_doc", "shingle"])
        .groupBy("new_doc", "hist_doc")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("new_doc"), F.col("nw").alias("na"))
    sb = sizes.select(
        F.col("doc_id").alias("hist_doc"), F.col("nw").alias("nb")
    )
    j = inter.join(sa, "new_doc").join(sb, "hist_doc")
    uni = F.col("na") + F.col("nb") - F.col("inter")
    return j.select(
        "new_doc",
        "hist_doc",
        (F.col("inter").cast("double") / uni).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def fingerprints(docs: DataFrame) -> DataFrame:
    """Order-insensitive bag fingerprint: sum + count of portable word
    hashes (rolling-hash analog that parallelizes without positions).
    Digest + h32 hoisted so md5 runs once per word, not once per agg."""
    w = (
        words_df(docs)
        .withColumn("dg", F.md5("word"))
        .withColumn("h32", F.expr(ph.hex32_from_digest_sql("dg")))
    )
    return w.groupBy("doc_id").agg(
        F.sum("h32").alias("fp_sum"),
        F.count("*").alias("fp_n"),
        F.min("h32").alias("fp_min"),
    )


def temperature_mix(
    df: DataFrame, id_col: str = "doc_id", stratum_col: str = "source"
) -> DataFrame:
    """Temperature-based stratum rebalancing (alpha = 0.5) — the source-
    mixing step of a pretraining pipeline (mT5/Pile style): head sources
    are downsampled and tail sources kept so the output mixture follows
    n_s^alpha instead of the raw (often 60%-one-source) skew.

    Per stratum s with n_s rows, weight w_s = floor(sqrt(n_s)); with a
    total budget of B = N/2 rows the keep threshold is
        thr_s = floor(B * w_s * 2^32 / (S * n_s)),   S = sum_s w_s,
    and a row is kept iff h32(id) < thr_s, where h32 is the portable
    md5-derived 32-bit hash. ALL arithmetic is BIGINT — no float sums, no
    pow(): sqrt is IEEE correctly-rounded (bit-identical in Spark and
    DuckDB) and its floor quantizes to an exact integer, so the oracle
    reproduces the exact selected set, not an approximation. Expected kept
    per stratum is B * w_s / S (capped at n_s when thr_s >= 2^32 —
    tail strata are naturally kept whole).

    Scale shape: stratum counts are a vocabulary-sized aggregate broadcast
    back; the keep decision is a narrow per-row map — one tiny shuffle, no
    corpus-sized join. Overflow headroom: B * w_s * 2^32 needs
    B * w_s < 2^31; at 10^12-row scale drop the 2^32 scale factor into
    the hash side (compare h32 * S * n_s DIV 2^32 against B * w_s) or use
    DECIMAL(38,0) — same floor semantics."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n"))
    counts = counts.withColumn(
        "w", F.expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)")
    )
    tot = counts.agg(F.sum("w").alias("s_w"), F.sum("n").alias("n_total"))
    thr = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "thr", F.expr("((n_total DIV 2) * w * 4294967296) DIV (s_w * n)")
        )
        .select(stratum_col, "thr")
    )
    d = (
        df.select(id_col, stratum_col)
        .withColumn(
            "dg", F.md5(F.concat(F.lit("mix:"), F.col(id_col).cast("string")))
        )
        .withColumn("h", F.expr(ph.hex32_from_digest_sql("dg")))
    )
    return (
        d.join(F.broadcast(thr), stratum_col)
        .filter(F.col("h") < F.col("thr"))
        .select(id_col, stratum_col)
    )


# (feature, weight) rows of the illustrative linear quality model scored by
# model_quality_score — in production this is the exported weight vector of
# a trained fastText/logreg quality classifier, shipped to executors the
# same way (a broadcast two-column table).
QUALITY_MODEL_WEIGHTS = [("n_chars", 1), ("n_words", -2), ("n_stop", 50)]


def model_quality_score(docs: DataFrame, keep_threshold: int = 400) -> DataFrame:
    """Model-based quality scoring: integer features unpivoted to long form
    and dot-producted against a BROADCAST (feature, weight) table — the
    distributed shape of linear-classifier scoring (fastText / logreg
    quality filters in pretraining pipelines): the model is data, not
    code, so retraining never touches the pipeline.

    Integer-exact score (sum of int*int products — order-free), plus a
    rational squash score/(1000+|score|) in place of the classic sigmoid:
    one IEEE correctly-rounded division instead of exp(), so the double is
    bit-identical cross-engine. keep_doc is the filter verdict.

    Scale shape: per-row feature map (narrow) -> 3x explode via stack ->
    broadcast-hash-join with the weight table -> one partial-aggregated
    shuffle keyed by doc_id."""
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(F.split("text", " ")).alias("n_words"),
        F.expr(
            "size(filter(split(text, ' '), w -> w = 'a' OR w = 'the'))"
        ).alias("n_stop"),
    )
    long = feats.selectExpr(
        "doc_id",
        "stack(3, 'n_chars', n_chars, 'n_words', n_words, 'n_stop', n_stop)"
        " AS (feat, weight_val)",
    ).withColumnRenamed("weight_val", "val")
    spark = docs.sparkSession
    weights = spark.createDataFrame(
        QUALITY_MODEL_WEIGHTS, "feat string, weight int"
    )
    s = (
        long.join(F.broadcast(weights), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("val").cast("bigint") * F.col("weight")).alias("score"))
    )
    return s.select(
        "doc_id",
        "score",
        (
            F.col("score").cast("double")
            / (F.lit(1000).cast("double") + F.abs(F.col("score").cast("double")))
        ).alias("squash"),
        (F.col("score") > keep_threshold).alias("keep_doc"),
    )


# Portable PII patterns — the RE2/Java-regex common subset (no lookaround,
# no backreferences), so Spark and the DuckDB oracle compile them identically.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_PHONE_RE = r"\d{3}-\d{4}"


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrub over free text: count and redact emails, IPv4 addresses
    and phone-shaped numbers (the privacy pass a corpus takes before
    training, next to the log-side ip_anonymize). Replacement order is
    email -> ip -> phone so the earlier, more specific redactions cannot
    leave fragments the later patterns mis-match.

    The synthetic corpus text contains no PII, so a deterministic
    augmentation (email/ip/phone snippets derived from doc_id, with
    per-class presence varying by doc_id residues) is applied first —
    harness-side input synthesis, same pattern as the multimodal decode
    oracles; the operator under test is the count+redact pipeline, which
    runs over the augmented column exactly as it would over real text.

    Scale shape: narrow per-row regex map, zero shuffles; regexp runs in
    the JVM (whole-stage codegen), no Python on the path."""
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            d % 3 > 0,
            F.concat(
                F.lit(" contact user"),
                d.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit(" from 10."),
                (d % 223).cast("string"),
                F.lit(".0."),
                (d % 241).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" tel 555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
    )
    t = docs.select("doc_id", aug.alias("aug"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IPV4_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<TEL>",
    )
    # patterns passed as literal Columns (never through a SQL string, where
    # backslashes would need a second level of escaping)
    return t.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("aug"), F.lit(PII_EMAIL_RE), F.lit(0))
        ).alias("n_email"),
        F.size(
            F.regexp_extract_all(F.col("aug"), F.lit(PII_IPV4_RE), F.lit(0))
        ).alias("n_ip"),
        F.size(
            F.regexp_extract_all(F.col("aug"), F.lit(PII_PHONE_RE), F.lit(0))
        ).alias("n_phone"),
        F.length(clean).alias("clean_len"),
    )


def corpus_shuffle(docs: DataFrame, n_shards: int = 16) -> DataFrame:
    """Deterministic seeded global shuffle for training order: every doc's
    permutation key is the portable hash of 'shuffle:'||doc_id; shard =
    key % n_shards; pos = the doc's rank within its shard ordered by
    (key, doc_id). The data-loader reads shards round-robin in pos order
    and sees a reproducible pseudo-random permutation of the corpus — the
    training-order shuffle every pretraining job runs after curation,
    with no rand(): re-runs, resumes and backfills emit the identical
    order, and the DuckDB oracle computes the identical permutation.
    Reference analog: the deterministic file-ordering contract of the
    importer queue (lib_database.py get_recent_files ordering), lifted to
    a content-addressed permutation.

    Scale shape: ONE hash shuffle keyed by shard + an independent
    within-shard sort — never a global total-order sort: the hash key is
    uniform, so the n_shards partitions are balanced by construction (no
    range-partition sampling pass, no skew), each shard sorts locally,
    and shard files are the natural unit a loader consumes in parallel.
    Sort parallelism IS n_shards (one reducer task per shard), so size it
    to the cluster — production loaders use hundreds to thousands of
    shards (n_shards ~ O(cores), each shard a memory-sized sort); the
    default 16 keeps the sf-scale oracle and tests readable."""
    from pyspark.sql.window import Window

    d = docs.withColumn(
        "dg", F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    ).withColumn("skey", F.expr(ph.hex32_from_digest_sql("dg")))
    pos = F.row_number().over(
        Window.partitionBy("shard").orderBy(F.asc("skey"), F.asc("doc_id"))
    )
    return (
        d.withColumn("shard", (F.col("skey") % n_shards).cast("int"))
        .select("doc_id", "shard", "skey", pos.alias("pos"))
    )


def importance_resampling(
    docs: DataFrame, n_buckets: int = 64, target_lang: str = "en"
) -> DataFrame:
    """DSIR-style importance resampling score (Xie et al. 2023): rank raw
    documents by how target-like their hashed n-gram feature counts are.
    Features are portable-hash buckets of word unigrams; the per-bucket
    importance weight is the add-one-smoothed log-likelihood ratio

        w_b = ln((t_b+1)/(T+B)) - ln((o_b+1)/(O+B))

    between the target distribution (``lang = target_lang`` docs — the
    curated subset a pipeline wants more of) and the REST of the corpus —
    the contrastive in-domain-vs-out form of the GPT-3/DSIR quality
    classifiers (target vs ALL would bias every weight by ln(O/T) when
    the two corpora differ in size, making the sign meaningless). Each
    doc's score is the sum of w over its word instances; ``keep`` marks
    docs at least as target-like as not (score >= 0).

    Float-parity design (same trick as unigram_surprisal): each w_b is
    floored to integer MICRO-NATS before any corpus-sized sum, so per-doc
    aggregation is an order-free integer sum; the ln/floor expression is
    written in one fixed association order on both engines.

    Scale shape: the feature table is B rows (64) — broadcast both ways;
    the target/raw count aggregations collapse map-side to <= B rows per
    task before their exchange; the only corpus-sized shuffle is the
    per-doc score aggregation. At 10^12 docs the weight model is still
    64 rows: the classifier is data, exactly like model_quality_score."""
    w = words_df(
        docs, carry=[(F.col("lang") == target_lang).alias("is_tgt")]
    ).withColumn("dg", F.md5(F.concat(F.lit("dsir:"), F.col("word"))))
    bl = w.select(
        "doc_id",
        "is_tgt",
        (F.expr(ph.hex32_from_digest_sql("dg")) % n_buckets)
        .cast("int")
        .alias("bucket"),
    )
    b = bl.select("doc_id", "bucket")
    spine = bl.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("tc"),
        F.sum(F.when(F.col("is_tgt"), 0).otherwise(1)).alias("oc"),
    )
    totals = spine.agg(
        F.sum("tc").alias("T"), F.sum("oc").alias("O")
    )
    # ((ln(tc+1) - ln(T+B)) - ln(oc+1)) + ln(O+B), left-assoc in both engines
    w_unat = F.floor(
        (
            F.log((F.col("tc") + 1).cast("double"))
            - F.log((F.col("T") + n_buckets).cast("double"))
            - F.log((F.col("oc") + 1).cast("double"))
            + F.log((F.col("O") + n_buckets).cast("double"))
        )
        * F.lit(1000000.0)
    ).cast("long")
    wt = spine.crossJoin(F.broadcast(totals)).select(
        "bucket", w_unat.alias("w_unat")
    )
    return (
        b.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("w_unat").alias("dsir_score_unat"),
        )
        .select(
            "doc_id",
            "n_words",
            "dsir_score_unat",
            (F.col("dsir_score_unat") >= 0).alias("keep"),
        )
    )


def setsim_prefix_join(docs: DataFrame, threshold_pct: int = 50) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (AllPairs /
    PPJoin — Bayardo et al. WWW'07, Xiao et al. WWW'08): every pair of
    documents whose 2-word-shingle SETS have Jaccard >= t, with ZERO
    false negatives by THEOREM, not by tuning — the exact counterpart of
    the probabilistic MinHash-LSH path, for the places recall < 1 is
    unacceptable (benchmark-contamination removal, catalog dedup).

    Three provably-lossless prune rules, all integer-exact cross-engine:

      * PREFIX filter: order the universe globally (ascending document
        frequency, rarest first, shingle as tiebreak — the order that
        makes prefixes maximally selective). If J(a,b) >= t then a and b
        share an element inside each one's first n - ceil(t*n) + 1
        elements of that order (if all common elements sat in a's last
        ceil(t*n) - 1 positions, there would be fewer than t*n of them,
        contradicting |a n b| >= t*|a|). ceil(t*n/100) is computed as
        (n*t + 99) DIV 100.
      * LENGTH filter: J >= t forces t*|a| <= 100*|b| (and symmetrically),
        applied inside the candidate join.
      * POSITIONAL filter (PPJoin): a shared prefix element at ranks
        (i, j) bounds the overlap by 1 + min(na - i, nb - j); J >= t
        needs overlap alpha with (100+t)*alpha >= t*(na+nb), so pairs
        whose bound falls short are pruned before they ever materialize.

    Verification joins the per-doc shingle ARRAYS (collect_set, one
    vocab-bounded array per doc) onto the surviving candidates and takes
    size(array_intersect(...)) — candidate-pair-sized, no re-explosion
    of the shingle table. The final predicate is 100*inter >= t*union,
    pure integers; the reported ``jac`` is one int/int division.

    Scale shape: document frequency and per-doc rank are analytic
    windows over the distinct (doc, shingle) pairs (no vocab table
    joined back); the candidate equi-join is keyed on PREFIX shingles
    only — by construction the rarest elements of each set, so per-key
    groups are small exactly where a naive shingle join explodes. Exact
    all-pairs semantics still costs what the true pair population costs:
    run it on the bounded side (the benchmark split, a catalog) and keep
    MinHash-LSH for open-corpus near-dup, as __spark_entry__ does."""
    from pyspark.sql.window import Window

    t = int(threshold_pct)
    sh = shingles_df(docs, k=2).distinct()
    base = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
    )
    prefix = base.filter(
        F.col("rn") <= F.col("n") - F.expr(f"(n * {t} + 99) DIV 100") + 1
    ).select("doc_id", "shingle", "n", "rn")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        F.col("n").alias("na"),
        F.col("rn").alias("ra"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("n").alias("nb"),
        F.col("rn").alias("rb"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: size ratio within t
            & (F.lit(t) * F.col("na") <= F.lit(100) * F.col("nb"))
            & (F.lit(t) * F.col("nb") <= F.lit(100) * F.col("na"))
            # positional filter: remaining-overlap upper bound must reach
            # the required alpha: (100+t)*(1+min(na-ra, nb-rb)) >= t*(na+nb)
            & (
                F.lit(100 + t)
                * (F.lit(1) + F.least(F.col("na") - F.col("ra"), F.col("nb") - F.col("rb")))
                >= F.lit(t) * (F.col("na") + F.col("nb"))
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    sets = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("shingle")).alias("sset"),
        F.count("*").alias("n"),
    )
    return (
        cand.join(
            sets.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sset").alias("set_a"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sset").alias("set_b"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn(
            "inter", F.size(F.array_intersect("set_a", "set_b")).cast("long")
        )
        .withColumn("union_sz", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(F.lit(100) * F.col("inter") >= F.lit(t) * F.col("union_sz"))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "union_sz",
            (F.col("inter").cast("double") / F.col("union_sz").cast("double")).alias("jac"),
        )
    )


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, top_k: int = 20
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    PMI(w1,w2) = ln(p(w1 w2) / (p(w1) p(w2))) over the corpus LM counts.
    The classic collocation-extraction pass (Church & Hanks 1990) a
    training-data pipeline runs to find multiword units worth protecting
    from tokenizer splits and to profile domain phraseology.

    Float parity (same discipline as unigram/bigram_surprisal): PMI is ONE
    ln of ONE division of two exact int64 products — no float sums, no
    association-order exposure — floored into micro-nats. Scale shape: the
    count tables are vocabulary-sized and broadcast; the totals are 1-row
    cross joins; the result is a TakeOrderedAndProject (never a global
    sort of the bigram table). At web scale the |V|^2 bigram-count join
    flips to a shuffle equi-join on the bigram key, exactly as
    bigram_surprisal documents."""
    w = words_df(docs)
    wfreq = w.groupBy("word").agg(F.count("*").alias("wf"))
    wtot = w.select(F.count("*").alias("w_total"))
    bg = shingles_df(docs, k=2)
    btot = bg.select(F.count("*").alias("b_total"))
    parts = F.split(F.col("shingle"), " ")
    bfreq = (
        bg.groupBy("shingle")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
    )
    f1 = wfreq.select(F.col("word").alias("w1"), F.col("wf").alias("wf1"))
    f2 = wfreq.select(F.col("word").alias("w2"), F.col("wf").alias("wf2"))
    num = F.col("cnt") * F.col("w_total") * F.col("w_total")
    den = F.col("b_total") * F.col("wf1") * F.col("wf2")
    pmi_unat = F.floor(
        F.log(num.cast("double") / den) * F.lit(1000000.0)
    ).cast("long")
    return (
        bfreq.join(F.broadcast(f1), "w1")
        .join(F.broadcast(f2), "w2")
        .crossJoin(F.broadcast(wtot))
        .crossJoin(F.broadcast(btot))
        .select("shingle", "cnt", pmi_unat.alias("pmi_unat"))
        .orderBy(F.col("pmi_unat").desc(), "shingle")
        .limit(top_k)
    )


def source_unigram_kl(docs: DataFrame) -> DataFrame:
    """Per-source KL divergence to the corpus unigram LM — THE mixture
    diagnostic for training-data curation: KL(P_source || P_corpus) says
    how far each source's word distribution sits from the blend the model
    will actually train on (high = domain-shifted source, candidate for
    temperature reweighting; ~0 = redundant with the mixture).

    KL(s) = sum_w (c_sw/T_s) * ln((c_sw/T_s) / (c_w/T)).

    Float-parity design (same doctrine as unigram_surprisal): the per-
    (source, word) log-ratio is floored into MICRO-NATS and the per-source
    sum is the INTEGER sum(c_sw * lr_micro) — order-free. The ln input is
    computed with a pinned association order `(c_sw/T_s) * (T/c_w)` (two
    double divisions then one multiply — never c_sw*T, which overflows
    BIGINT at corpus scale). Mirrored verbatim in the oracle.

    Scale shape: ONE corpus-sized shuffle (the (source, word) count);
    everything after runs on vocab-x-sources-sized tables — corpus totals
    re-aggregate from that small table rather than re-scanning the corpus,
    and the per-word corpus counts join back broadcast.
    """
    w = words_df(docs, carry=[F.col("source")])
    sw = w.groupBy("source", "word").agg(F.count("*").alias("c_sw"))
    s_tot = sw.groupBy("source").agg(F.sum("c_sw").alias("t_s"))
    c_w = sw.groupBy("word").agg(F.sum("c_sw").alias("c_w"))
    tot = s_tot.select(F.sum("t_s").alias("t_all"))
    ratio = (F.col("c_sw").cast("double") / F.col("t_s")) * (
        F.col("t_all").cast("double") / F.col("c_w")
    )
    lr_micro = F.floor(F.log(ratio) * F.lit(1000000.0)).cast("long")
    per = (
        sw.join(F.broadcast(s_tot), "source")
        .join(F.broadcast(c_w), "word")
        .crossJoin(F.broadcast(tot))
        .select("source", "c_sw", lr_micro.alias("lr_micro"))
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum(F.col("c_sw") * F.col("lr_micro")).alias("kl_sum_micro"),
            F.sum("c_sw").alias("n_words"),
        )
        .select(
            "source",
            "n_words",
            "kl_sum_micro",
            (
                F.col("kl_sum_micro").cast("double") / F.col("n_words")
            ).alias("kl_micro_nat_per_word"),
        )
    )


def mixture_epochs(docs: DataFrame) -> DataFrame:
    """Materialize a per-source EPOCH recipe (LLaMA/GPT-style data
    mixtures state "wiki x 3.4 epochs, web x 0.7"): every document is
    emitted floor(epochs) times plus one extra copy iff a deterministic
    per-doc coin lands below the fractional part — so a 2.4-epoch source
    yields each doc 2 times and a hash-chosen 40% of docs a 3rd time,
    and the emitted multiset is exactly reproducible (the property a
    rand()-based upsampler does not have; reference analog: the
    importer's --skip/line-sampling config surface, import_logs.py).

    The recipe here is DATA, not code — a (source, epochs_milli) table
    derived deterministically from the portable source hash (250..2999
    milli-epochs) standing in for the curated recipe a real run ships;
    swapping in a hand-written table changes nothing downstream.

    Integer-exact selection: the extra-copy rule is
    h32('epoch_frac:'+doc_id) * 1000 < frac_milli * 2^32 — all BIGINT,
    no float thresholds. Output is the per-source conservation readout:
    doc count in, rows emitted, docs upsampled, and an order-free
    integer checksum over the emitted (doc_id, copy_idx) multiset that
    pins the explode itself, not just its cardinality.

    Scale shape: the recipe is a broadcast source-cardinality table; the
    copy-count decision is a narrow per-row map; the explode multiplies
    rows by <=3 before a map-side-combinable source rollup — one tiny
    shuffle, no corpus-sized join. (Emitting the full upsampled corpus —
    drop the final rollup — is the same plan minus the agg.)"""
    recipe = (
        docs.select("source")
        .distinct()
        .withColumn(
            "_rdg",
            F.md5(F.concat(F.lit("epochs:"), F.col("source"))),
        )
        .withColumn(
            "epochs_milli",
            F.expr(f"250 + ({ph.hex32_from_digest_sql('_rdg')}) % 2750"),
        )
        .select("source", "epochs_milli")
    )
    d = (
        docs.select("doc_id", "source")
        .join(F.broadcast(recipe), "source")
        .withColumn(
            "_fdg",
            F.md5(F.concat(F.lit("epoch_frac:"), F.col("doc_id").cast("string"))),
        )
        .withColumn(
            "n_copies",
            F.expr(
                "(epochs_milli DIV 1000) + IF("
                f"({ph.hex32_from_digest_sql('_fdg')}) * 1000 < "
                "(epochs_milli % 1000) * 4294967296, 1, 0)"
            ),
        )
    )
    emitted = d.select(
        "source",
        "epochs_milli",
        "doc_id",
        "n_copies",
        F.explode(
            F.expr(
                "CASE WHEN n_copies < 1 THEN CAST(array() AS ARRAY<BIGINT>) "
                "ELSE sequence(CAST(1 AS BIGINT), n_copies) END"
            )
        ).alias("copy_idx"),
    )
    return (
        emitted.groupBy("source", "epochs_milli")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_emitted"),
            F.sum(
                F.when(F.col("copy_idx") > F.expr("epochs_milli DIV 1000"), 1).otherwise(0)
            ).alias("n_extra_copies"),
            F.sum(F.col("doc_id") * 1000 + F.col("copy_idx")).alias("emit_checksum"),
        )
    )


PARA_BLOCK_WORDS = 8  # words per dedup block (C4 uses 3-sentence spans)


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """C4-style span-REMOVAL dedup: split every document into consecutive
    8-word blocks, keep only each block's globally FIRST occurrence
    (smallest (doc_id, block_idx)), and reconstruct the cleaned text from
    the surviving blocks in document order — the operator that strips
    boilerplate/quotation the whole-doc and window-STATS passes
    (dedup_exact, span_dedup_stats) only measure. Output per doc: block
    counts in/kept, cleaned length, and the md5 of the cleaned text so
    the reconstruction (content AND order) is value-pinned cross-engine.

    Scale shape: block extraction is a narrow HOF (sequence+transform
    over the split words, zero joins); first-occurrence ownership is ONE
    map-side-combinable min-agg on the block digest joined back as an
    EQUI join on that digest (AQE skew-join splits hot boilerplate
    blocks — a window over block_text would instead pin every copy of a
    hot block into one task's state); reassembly rides a per-doc
    sort_array(collect_list) — deterministic without a pre-shuffle sort.
    2 shuffles + 1 equi-join total."""
    blocks = (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(0, CAST(ceil(size(split(text, ' ')) / "
                f"{PARA_BLOCK_WORDS}.0) AS INT) - 1), "
                f"i -> struct(CAST(i AS BIGINT) AS block_idx, "
                f"concat_ws(' ', slice(split(text, ' '), i * {PARA_BLOCK_WORDS} + 1, "
                f"{PARA_BLOCK_WORDS})) AS block_text))"
            ).alias("_bl"),
        )
        .select("doc_id", F.explode("_bl").alias("b"))
        .select("doc_id", "b.block_idx", F.md5("b.block_text").alias("bdg"), "b.block_text")
    )
    owner = blocks.groupBy("bdg").agg(
        F.min(F.struct("doc_id", "block_idx")).alias("own")
    )
    kept = blocks.join(owner, "bdg").withColumn(
        "keep",
        (F.col("doc_id") == F.col("own.doc_id"))
        & (F.col("block_idx") == F.col("own.block_idx")),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sort_array(collect_list(IF(keep, "
                    "struct(block_idx, block_text), NULL))), s -> s.block_text)"
                ),
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_kept",
            F.length("clean_text").alias("clean_len"),
            F.md5("clean_text").alias("clean_md5"),
        )
    )


BM25_QUERY_TERMS = ["spark", "table", "join"]


def bm25_topk(
    docs: DataFrame, terms: list[str] | None = None, k: int = 10
) -> DataFrame:
    """BM25 ranked retrieval over the corpus in EXACT INTEGER arithmetic —
    the retrieval scorer behind RAG corpus serving and dedup-against-query
    workflows, with Lucene's non-negative idf. With k1 = 6/5 and b = 3/4
    the classic per-term score

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    multiplies through by 20*T (T = corpus words, avgdl = T/N) into the
    ratio of two BIGINTs

        (idf_micro * 44*T*tf) DIV (20*T*tf + 6*T + 18*dl*N)

    so apart from ONE ln (idf, floored to micro-nats from exactly-
    representable +0.5 operands in a pinned association order) every step
    is integer — the per-doc score is an order-free integer sum both
    engines reproduce bit-for-bit, where a float BM25 would drift with
    aggregation order. Overflow headroom: idf_micro*44*T*tf needs
    T*tf < ~2^46; at web scale move the 44*T factor into DECIMAL(38,0)
    or pre-divide by gcd — same floor semantics.

    Scale shape: doc lengths are one map-side-combinable agg; (N, T) and
    the term-idf table (|terms| rows) broadcast; tf is corpus-sized only
    for docs CONTAINING query terms (the isin filter prunes before the
    groupBy); the dl re-attach is a doc-keyed equi join (broadcastable
    when the query-matched doc set is small); final top-k is
    TakeOrderedAndProject — no global sort."""
    terms = BM25_QUERY_TERMS if terms is None else terms
    w = words_df(docs)
    dl = w.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("t_total"), F.count("*").alias("n_docs")
    )
    tf = (
        w.filter(F.col("word").isin(terms))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    idf = (
        tf.groupBy("word")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "word",
            F.expr(
                "CAST(floor(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5) / "
                "(CAST(df AS DOUBLE) + 0.5)) * 1000000.0) AS BIGINT)"
            ).alias("idf_micro"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "(idf_micro * 44 * t_total * tf) DIV "
                "(20 * t_total * tf + 6 * t_total + 18 * dl * n_docs)"
            ).alias("term_score_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_score_micro").alias("score_micro"),
            F.count("*").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank every
    document within its SOURCE by corpus-LM mean surprisal and split each
    source into head / middle / tail thirds — the language-quality
    stratification CCNet applies per language before choosing which
    thirds enter the training mix. Output: per (source, bucket) doc count
    and the score range, i.e. the thresholds a curation run would ship.

    Integer-exact ranking: the per-doc score is the micro-nat integer
    surprisal sum (order-free, same doctrine as unigram_surprisal)
    floor-divided by the word count — both engines rank identical
    integers, ties broken by doc_id; bucket is rank*3 vs n_source, pure
    integer.

    Scale shape: the only corpus-sized shuffles are the per-doc sum and
    the per-source rank window. A per-source window is a per-source total
    order — fine up to ~10^8 docs/source; past that flip to the exact
    nearest-rank TWO-PASS form (value_percentiles pattern: compute the
    two tertile threshold scores per source, broadcast, bucket by
    comparison) — identical result except boundary ties land by score,
    not rank."""
    from pyspark.sql.window import Window

    w = words_df(docs, carry=[F.col("source")])
    freq = w.groupBy("word").agg(F.count("*").alias("wfreq"))
    tot = w.select(F.count("*").alias("total_words"))
    unats = F.floor(
        -F.log(F.col("wfreq").cast("double") / F.col("total_words"))
        * F.lit(1000000.0)
    ).cast("long")
    per_doc = (
        w.join(F.broadcast(freq), "word")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(
            F.sum(unats).alias("ssum"),
            F.count("*").alias("n_words"),
        )
        .select(
            "doc_id",
            "source",
            F.expr("ssum DIV n_words").alias("score_micro"),
        )
    )
    win = Window.partitionBy("source").orderBy(
        F.asc("score_micro"), F.asc("doc_id")
    )
    ranked = per_doc.select(
        "source",
        "score_micro",
        F.row_number().over(win).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("n_s"),
    )
    bucket = F.expr(
        "CASE WHEN rk * 3 <= n_s THEN 'head' "
        "WHEN rk * 3 <= 2 * n_s THEN 'middle' ELSE 'tail' END"
    )
    return (
        ranked.select("source", bucket.alias("bucket"), "score_micro")
        .groupBy("source", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("score_micro").alias("min_score"),
            F.max("score_micro").alias("max_score"),
        )
    )


def tokenizer_fertility(corpus: DataFrame) -> DataFrame:
    """Per-source tokenizer fertility: tokens per whitespace word.

    Standard tokenizer-health stat for a training corpus — a source whose
    fertility creeps up (many tokens per word) is being shredded by the
    tokenizer and costs sequence budget. Over the tokenized corpus
    (doc_id, line, n_tok, source): per source, sequence/token/word/char
    totals plus milli-scaled tokens-per-word and chars-per-token.

    Exactness: the ratios are floor-divisions of exact BIGINT sums —
    no float anywhere. Shape: the word count is a narrow size(filter(
    split())) per row (JVM higher-order functions, no explode — the
    per-row count never materializes the word array past the
    expression), then ONE map-side-combinable hash agg on the
    source-sized key space.
    """
    per = corpus.select(
        "source",
        F.col("n_tok").cast("long").alias("n_tok"),
        F.expr("CAST(size(filter(split(line, ' '), w -> w <> '')) AS LONG)").alias(
            "n_words"
        ),
        F.length("line").cast("long").alias("n_chars"),
    )
    g = per.groupBy("source").agg(
        F.count("*").alias("n_seqs"),
        F.sum("n_tok").alias("tok_total"),
        F.sum("n_words").alias("word_total"),
        F.sum("n_chars").alias("char_total"),
    )
    return g.select(
        "source",
        "n_seqs",
        "tok_total",
        "word_total",
        F.expr("tok_total * 1000 DIV NULLIF(word_total, 0)").alias(
            "fertility_milli"
        ),
        F.expr("char_total * 1000 DIV NULLIF(tok_total, 0)").alias(
            "chars_per_tok_milli"
        ),
    )


def source_overlap_matrix(docs: DataFrame, k: int = 3) -> DataFrame:
    """Cross-source contamination matrix: shared distinct k-word shingles
    per source pair, with an exact Jaccard in milli-units.

    Training mixtures budget per source; two sources sharing a large
    fraction of their shingle vocabulary are near-mirrors and double-
    count their epochs. For every source pair (a < b): |A∩B|, |A|, |B|,
    and 1000·|A∩B| // |A∪B|.

    Shape at scale: ONE distinct-aggregation shuffle on (source,
    shingle) — the corpus-sized stage, map-side partial — then a
    self-equi-join keyed on the shingle (bucketed hash join; a shingle
    shared by m sources emits m(m-1)/2 pair rows, and m is bounded by
    the source count, not the corpus). The per-source set sizes are a
    source-sized broadcast back onto the pair rows. Never all-pairs on
    documents.
    """
    sh = (
        docs.select(
            "source", F.split(F.col("text"), " ").alias("ws")
        )
        .filter(F.size("ws") >= k)
        .select(
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(ws) - {k - 1}), "
                    f"i -> concat_ws(' ', slice(ws, i, {k})))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    per = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    pa = F.broadcast(per.select(F.col("source").alias("source_a"), F.col("n_sh").alias("n_a")))
    pb = F.broadcast(per.select(F.col("source").alias("source_b"), F.col("n_sh").alias("n_b")))
    return (
        pairs.join(pa, "source_a")
        .join(pb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("n_shared * 1000 DIV (n_a + n_b - n_shared)").alias(
                "jaccard_milli"
            ),
        )
    )


def novelty_curve(docs: DataFrame, n_buckets: int = 10) -> DataFrame:
    """N-gram novelty curve over deterministic training order: how fast
    does the corpus stop teaching new shingle types?

    Diversity-saturation readout for dataset sizing: walk the corpus in
    the SAME content-addressed pseudo-random order corpus_shuffle emits,
    split it into ``n_buckets`` equal training phases, and count per
    phase the 2-word shingle types seen for the FIRST time vs total
    shingle occurrences. A flat tail (novelty_milli → 0) says more of
    the same data buys vocabulary nothing — the curve every scaling-law
    sizing run wants before committing epochs.

    Determinism: the phase is pure integer math on the portable-hash
    shuffle key (skey uniform in [0, 2^32), bucket = skey·n // 2^32) —
    NO global sort, no rank; first-occurrence ownership is one min-agg
    of the (skey, doc_id) struct per shingle, skew-safe where a window
    over hot boilerplate shingles would not be (paragraph_dedup's
    lesson). Shape: shingle explode → one agg keyed by shingle
    (map-side partial) + one occurrence rollup keyed by bucket, then
    bucket-sized joins.
    """
    d = docs.withColumn(
        "dg",
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))),
    ).withColumn("skey", F.expr(ph.hex32_from_digest_sql("dg")))
    d = d.withColumn(
        "bucket",
        F.expr(f"CAST(skey * {int(n_buckets)} DIV 4294967296 AS INT)"),
    )
    sh = (
        d.select(
            "doc_id",
            "skey",
            "bucket",
            F.split(F.col("text"), " ").alias("ws"),
        )
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            "skey",
            "bucket",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> concat_ws(' ', slice(ws, i, 2)))"
                )
            ).alias("shingle"),
        )
    )
    occ = sh.groupBy("bucket").agg(F.count("*").alias("n_occurrences"))
    firsts = (
        sh.groupBy("shingle")
        .agg(F.min(F.struct("skey", "doc_id", "bucket")).alias("f"))
        .groupBy(F.col("f.bucket").alias("bucket"))
        .agg(F.count("*").alias("novel_shingles"))
    )
    nd = d.groupBy("bucket").agg(F.count("*").alias("n_docs"))
    # LEFT from the occurrence rollup: a saturated late phase contributes
    # zero FIRST-seen types and must read novelty 0, not vanish
    return (
        occ.join(firsts, "bucket", "left")
        .join(nd, "bucket")
        .select(
            "bucket",
            "n_docs",
            "n_occurrences",
            F.coalesce("novel_shingles", F.lit(0)).alias("novel_shingles"),
            F.expr(
                "coalesce(novel_shingles, 0) * 1000 DIV n_occurrences"
            ).alias("novelty_milli"),
        )
    )
