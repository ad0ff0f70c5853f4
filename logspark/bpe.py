"""Corpus-driven BPE-style merge learning — iterative, yet oracle-exact.

Learns the top-``steps`` byte-pair merges FROM the corpus (the way a real
BPE tokenizer vocabulary is trained: repeatedly merge the most frequent
adjacent symbol pair), then tokenizes with them. This is the "BPE-ish"
tokenization the round brief names, expressed so that BOTH engines compute
bit-identical results:

  * words are represented as space-separated symbol sequences with sentinel
    spaces (``' a b c '``); a merge is ``replace(' a b ', ' ab ')``;
  * ``replace`` scans left-to-right non-overlapping IDENTICALLY in Spark
    and DuckDB (verified: ``' a b a b '`` -> ``' ab a b '`` in both), so we
    apply each merge THREE times per step — a deterministic, engine-
    identical approximation of merge-to-fixpoint (documented divergence
    from canonical BPE's single left-to-right pass; parity is the point);
  * the per-step argmax (most frequent pair, lexicographic tie-break) is a
    1-row aggregate cross-joined back in — no collect(), the whole k-step
    training is ONE lazy plan;
  * pair counts are weighted by word frequency (type-level merge over the
    word histogram — the corpus-scale trick: state is |vocab| rows, not
    |corpus| rows, identical results).

Scale: each step costs one explode + one sum-aggregate over the WORD
HISTOGRAM (vocabulary-sized, not corpus-sized) plus a broadcast of one row.
Against 100TB the histogram is built once (one shuffle over the corpus);
the k training steps never touch the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logspark.textops import words_df

_APPLY_TIMES = 3


def _sym_seq(word_col: str) -> str:
    return f"' ' || array_join(split({word_col}, ''), ' ') || ' '"


def _pairs_expr() -> str:
    """Adjacent symbol pairs of a sequence column named ``seq``. Guarded
    for single-symbol words: Spark's sequence(1, 0) counts DOWN (yielding
    index 0 -> INVALID_INDEX_OF_ZERO), unlike DuckDB's end-exclusive
    range(1, 1) which is empty."""
    return (
        "CASE WHEN size(split(trim(seq), ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(trim(seq), ' ')) - 1), "
        "i -> element_at(split(trim(seq), ' '), i) || ' ' || "
        "element_at(split(trim(seq), ' '), i + 1)) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def _word_histogram(docs: DataFrame) -> DataFrame:
    return (
        words_df(docs)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .withColumn("seq", F.expr(_sym_seq("word")))
    )


def _step(state: DataFrame, step_no: int):
    """One training step: (new_state, learned_row_df)."""
    pairs = state.select(
        "freq", F.explode(F.expr(_pairs_expr())).alias("pair")
    )
    counts = pairs.groupBy("pair").agg(F.sum("freq").alias("cnt"))
    best = (
        counts.orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .select(
            F.lit(step_no).alias("step"),
            "pair",
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
            "cnt",
        )
    )
    applied = state.crossJoin(F.broadcast(best.select("pair", "merged")))
    seq = F.col("seq")
    for _ in range(_APPLY_TIMES):
        seq = F.replace(
            seq,
            F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("merged"), F.lit(" ")),
        )
    new_state = applied.select("word", "freq", seq.alias("seq"))
    return new_state, best


def train_state(docs: DataFrame, steps: int = 4):
    """Run the full training chain once: (final_state, merge_table).

    Both contract consumers need the identical chain — learn_merges wants
    the per-step merge rows, token_counts_after_merges wants the final
    post-merge symbol state — so a caller can train once (the state is
    vocabulary-sized; the contract memoizes + lineage-truncates it) and
    hand the pair to both instead of paying the 4-step argmax chain
    twice."""
    state = _word_histogram(docs)
    learned = []
    for t in range(1, steps + 1):
        state, best = _step(state, t)
        learned.append(best)
    out = learned[0]
    for b in learned[1:]:
        out = out.unionByName(b)
    return state, out


def learn_merges(
    docs: DataFrame, steps: int = 4, trained=None
) -> DataFrame:
    """The learned merge table: (step, pair, merged, cnt), one row per
    training step, in training order."""
    return (trained if trained is not None else train_state(docs, steps))[1]


def token_counts_after_merges(
    docs: DataFrame, steps: int = 4, trained=None
) -> DataFrame:
    """Per-document token counts before (chars) and after the learned
    merges were applied: (doc_id, n_base, n_bpe)."""
    state = (trained if trained is not None else train_state(docs, steps))[0]
    per_word = state.select(
        "word",
        F.length("word").alias("w_base"),
        F.size(F.split(F.trim("seq"), " ")).alias("w_bpe"),
    )
    w = words_df(docs)
    return (
        w.join(per_word, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("w_base").alias("n_base"),
            F.sum("w_bpe").alias("n_bpe"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle (identical construction, generated CTE chain)
# ---------------------------------------------------------------------------


def _duck_apply(seq: str) -> str:
    for _ in range(_APPLY_TIMES):
        seq = (
            f"replace({seq}, ' ' || b.pair || ' ', ' ' || b.merged || ' ')"
        )
    return seq


def _duck_ctes(words_rel: str, steps: int) -> str:
    """CTE chain s0, b1, s1, ... b{k}, s{k} over a (doc_id, word) relation."""
    pairs = (
        "list_transform(range(1, len(string_split(trim(seq), ' '))), "
        "i -> string_split(trim(seq), ' ')[i] || ' ' || "
        "string_split(trim(seq), ' ')[i + 1])"
    )
    parts = [
        f"""s0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seq
  FROM ({words_rel}) w0 GROUP BY word)"""
    ]
    for t in range(1, steps + 1):
        prev = f"s{t - 1}"
        parts.append(
            f"""b{t} AS (
  SELECT {t} AS step, pair, replace(pair, ' ', '') AS merged,
         CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, unnest({pairs}) AS pair FROM {prev}) p{t}
  GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1)"""
        )
        parts.append(
            f"""s{t} AS (
  SELECT word, freq, {_duck_apply('seq')} AS seq FROM {prev}, b{t} b)"""
        )
    return "WITH " + ",\n".join(parts)


def duck_learn_merges_sql(words_rel: str, steps: int = 4) -> str:
    selects = " UNION ALL ".join(
        f"SELECT step, pair, merged, cnt FROM b{t}" for t in range(1, steps + 1)
    )
    return f"{_duck_ctes(words_rel, steps)}\n{selects}"


def duck_token_counts_sql(words_rel: str, steps: int = 4) -> str:
    return f"""{_duck_ctes(words_rel, steps)}
SELECT w.doc_id,
       CAST(SUM(length(w.word)) AS BIGINT) AS n_base,
       CAST(SUM(len(string_split(trim(s.seq), ' '))) AS BIGINT) AS n_bpe
FROM ({words_rel}) w JOIN s{steps} s ON w.word = s.word
GROUP BY w.doc_id"""
