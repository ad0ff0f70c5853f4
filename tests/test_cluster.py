"""Connected-component dedup clustering vs a Python union-find oracle,
including chains longer than the propagate round count (pointer jumping
must cover them) and TF-IDF / surprisal semantic sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from logspark import cluster, textops


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: every node -> component min
    comp = {}
    for n in parent:
        comp[n] = find(n)
    return comp


def test_components_match_union_find_on_long_chain(spark):
    # chain d00-...-d19 (diameter 19 >> PROPAGATE_ROUNDS=4: only the
    # interleaved pointer jumps can close it), plus a triangle and a pair
    chain = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(19)]
    tri = [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    pair = [("p8", "p9")]
    edges = chain + tri + pair
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster.connected_components(df).collect()
    }
    want = _union_find(edges)
    # union-find normalizes to min via path compression on min-rooted trees
    assert got == want
    assert got["d19"] == "d00" and got["t3"] == "t1" and got["p9"] == "p8"


def test_neardup_clusters_sizes_and_canonicals(spark):
    edges = [("a1", "a2"), ("a2", "a3"), ("b1", "b2")]
    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    rows = {r["doc_id"]: r for r in cluster.neardup_clusters(df).collect()}
    assert rows["a3"]["cluster_id"] == "a1"
    assert rows["a1"]["cluster_size"] == 3
    assert rows["a1"]["is_canonical"] and not rows["a2"]["is_canonical"]
    assert rows["b2"]["cluster_id"] == "b1" and rows["b2"]["cluster_size"] == 2


def test_tfidf_top_terms(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "common rare1 common common"),
            ("d2", "common common zebra"),
            ("d3", "common plain words here"),
        ],
        ["doc_id", "text"],
    )
    out = textops.tfidf_top_terms(docs, top_k=1).collect()
    top = {r["doc_id"]: r["word"] for r in out}
    # 'common' appears in every doc -> idf = ln(1) = 0; rare words win
    assert top["d1"] == "rare1" and top["d2"] == "zebra"
    assert all(r["rk"] == 1 for r in out)


def test_repetition_scores(spark):
    docs = spark.createDataFrame(
        [
            ("loop", "a b a b a b a b"),   # "a b" bigram dominates
            ("var", "w x y z"),            # all bigrams distinct
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textops.repetition_scores(docs).collect()}
    assert out["loop"]["n_words"] == 8 and out["loop"]["n_distinct"] == 2
    assert out["loop"]["distinct_ratio"] == 2 / 8
    # 7 bigrams: "a b" x4, "b a" x3
    assert out["loop"]["n_bigrams"] == 7 and out["loop"]["top_bigram_n"] == 4
    assert out["var"]["top_bigram_share"] == 1 / 3
    assert out["loop"]["top_bigram_share"] > out["var"]["top_bigram_share"]


def test_train_split_deterministic_and_partitioned(spark):
    docs = spark.createDataFrame(
        [(i, "t") for i in range(200)], ["doc_id", "text"]
    )
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in textops.train_split(docs).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"]) for r in textops.train_split(docs).collect()}
    assert a == b  # reproducible, no rand()
    splits = {v[1] for v in a.values()}
    assert splits == {"train", "val", "test"}
    for bucket, split in a.values():
        want = "train" if bucket < 800 else "val" if bucket < 900 else "test"
        assert split == want
    n_train = sum(1 for v in a.values() if v[1] == "train")
    assert 120 <= n_train <= 200  # ~80% of 200, loose band


def test_stratified_sample_caps_each_stratum(spark):
    rows = [(i, "t", "big") for i in range(100)] + [
        (1000 + i, "t", "small") for i in range(3)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = textops.stratified_sample(docs, cap=10).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["rk"])
    assert len(by_src["big"]) == 10 and sorted(by_src["big"]) == list(range(1, 11))
    assert len(by_src["small"]) == 3  # under cap: all kept
    # deterministic: same rows on re-run
    again = textops.stratified_sample(docs, cap=10).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_sample_matches_local_aes_recompute(spark):
    import hashlib
    import math

    rows = [(i, "t", "s", 10 + (i * 37) % 500) for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source", "n_chars"])
    out = textops.weighted_sample(docs, k=25).collect()
    assert len(out) == 25

    def key(doc_id, n_chars):
        h = int(hashlib.md5(f"wsamp:{doc_id}".encode()).hexdigest()[:8], 16)
        return math.floor(math.log((h + 1) / 4294967296.0) / n_chars * 1e12)

    expect = sorted(
        ((key(i, w), i) for (i, _, _, w) in rows),
        key=lambda t: (-t[0], t[1]),
    )[:25]
    got = [(r["akey_punit"], r["doc_id"]) for r in out]
    assert sorted(got, key=lambda t: (-t[0], t[1])) == expect
    # longer docs are overrepresented vs their 300-doc population share:
    # weight is length, so the sample should skew long
    med = sorted(w for (_, _, _, w) in rows)[150]
    long_frac = sum(1 for r in out if r["n_chars"] > med) / 25
    assert long_frac > 0.5


def test_weighted_sample_plan_is_takeordered(spark):
    from tests.test_plans import plan_text

    docs = spark.createDataFrame(
        [(1, "t", "s", 10)], ["doc_id", "text", "source", "n_chars"]
    )
    txt = plan_text(textops.weighted_sample(docs, k=5))
    assert "TakeOrderedAndProject" in txt  # no global Sort+Exchange


def test_unigram_surprisal_rare_words_score_higher(spark):
    docs = spark.createDataFrame(
        [
            ("common", "the the the the"),
            ("rare", "qux zzz"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textops.unigram_surprisal(docs).collect()}
    assert out["rare"]["mean_surprisal_unat"] > out["common"]["mean_surprisal_unat"]
    assert out["common"]["n_words"] == 4
    # integer-domain sum: exact expected value floor(-ln(4/6)*1e6)*4
    import math

    per = math.floor(-math.log(4.0 / 6.0) * 1e6)
    assert out["common"]["surprisal_sum"] == per * 4


def test_cluster_representatives_pick_longest_then_min_id(spark):
    # {1,2,3}: doc 2 is longest (5 words) -> rep; {10,11}: 2-word tie ->
    # min doc_id 10; unclustered doc 99 never appears
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c d e"),
            (3, "a b c d"),
            (10, "x y"),
            (11, "p q"),
            (99, "unclustered doc"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["cluster_id"]: (
            r["rep_doc_id"],
            r["rep_n_words"],
            r["cluster_size"],
            r["n_dropped"],
        )
        for r in cluster.cluster_representatives(pairs, docs).collect()
    }
    assert got == {1: (2, 5, 3, 2), 10: (10, 2, 2, 1)}


def test_corpus_shuffle_deterministic_balanced_permutation(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(400)], "doc_id long, text string"
    )
    out = textops.corpus_shuffle(docs).collect()
    # a permutation: every doc exactly once
    assert sorted(r["doc_id"] for r in out) == list(range(400))
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    sizes = [len(v) for v in by_shard.values()]
    # hash-uniform shards: all 16 present, none pathologically skewed
    assert len(by_shard) == 16 and max(sizes) <= 3 * min(sizes)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rows] == list(range(1, len(rows) + 1))
        keys = [(r["skey"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    # reproducible: identical permutation on a re-run
    again = textops.corpus_shuffle(docs).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in again} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in out
    }


def test_importance_resampling_target_like_docs_score_higher(spark):
    # target (lang=en) docs use words {alpha, beta}; raw-only docs use
    # {gamma, delta}: en-vocabulary docs must score higher and be kept
    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha", "en"),
            (2, "alpha beta beta", "en"),
            (3, "gamma delta gamma", "xx"),
            (4, "delta gamma delta", "xx"),
            (5, "alpha beta alpha beta", "xx"),  # target-like but raw lang
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r["doc_id"]: r for r in textops.importance_resampling(docs).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["keep"] and out[2]["keep"]
    assert not out[3]["keep"] and not out[4]["keep"]
    # the target-vocabulary doc with raw lang is still kept: DSIR scores
    # content, not provenance
    assert out[5]["keep"]
    assert out[1]["dsir_score_unat"] > out[3]["dsir_score_unat"]
    assert out[1]["n_words"] == 3
