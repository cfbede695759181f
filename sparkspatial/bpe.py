"""Distributed BPE merge training (Sennrich et al. 2016) on Spark.

The classic byte-pair-encoding vocabulary construction: start from
characters, repeatedly merge the most frequent adjacent symbol pair.
The corpus-scale work happens EXACTLY ONCE — the word-frequency count
(one combiner-friendly shuffle over the token stream). Every merge
round then runs on the WORD VOCABULARY table (word, weight, symbols),
which is 10^5-10^7 rows regardless of corpus size — the shape that
makes BPE training feasible at 100 TB: rounds cost vocab-sized
aggregations, not corpus scans.

Per round: explode adjacent symbol pairs -> weight-summed pair counts
(map-side combine) -> arg-max pair via a distributed TakeOrdered
(orderBy+limit(1), deterministic ties by pair text) -> apply the
merge with a greedy left-to-right codegen'd `aggregate` fold over the
symbol arrays -> localCheckpoint (flat lineage). Only the winning
pair (2 strings + a count) reaches the driver each round.

Pinned against a pure-Python reference implementation of the textbook
algorithm in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import norm_text_sql

__all__ = ["word_counts", "bpe_train", "bpe_train_with_vocab",
           "bpe_token_counts", "bpe_reference"]

END = "</w>"  # end-of-word marker (standard BPE)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight) corpus word frequencies — the single
    corpus-sized stage of BPE training."""
    norm = norm_text_sql(text_col, "spark")
    return (docs
            .select(F.explode(F.split(F.expr(norm), " ")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("weight")))


def _lit(s: str) -> str:
    """Symbol -> Spark SQL string literal (backslashes and quotes in
    corpus text would otherwise break or escape the inlined fold)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold(a: str, b: str, col: str = "syms"):
    """Column: greedy left-to-right merge of adjacent (a, b) symbol
    pairs inside a symbol array (the textbook BPE merge), as a
    codegen'd higher-order aggregate — no Python per word."""
    return F.expr(
        f"aggregate({col}, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {_lit(a)} "
        f"          AND x = {_lit(b)} "
        f"     THEN concat(slice(acc, 1, size(acc) - 1), "
        f"                 array({_lit(a + b)})) "
        "      ELSE concat(acc, array(x)) END)")


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> list:
    """Learn up to `n_merges` BPE merge rules from the corpus.

    Returns [(sym_a, sym_b, weight)] in merge order — the vocabulary
    artifact (small by definition; it IS driver-side state, like any
    trained tokenizer). Stops early when no pair repeats.
    """
    return bpe_train_with_vocab(docs, n_merges, text_col)[0]


def bpe_reference(word_weights: dict, n_merges: int) -> list:
    """Pure-Python textbook BPE (the pytest oracle): same greedy
    merge, same (count desc, pair asc) tie order."""
    vocab = {w: list(w) + [END] for w in word_weights}
    rules = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in vocab.items():
            wt = word_weights[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wt
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        rules.append((a, b, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return rules


def bpe_train_with_vocab(docs: DataFrame, n_merges: int,
                         text_col: str = "text"):
    """Like :func:`bpe_train` but also returns the final encoded
    vocabulary DataFrame (word, weight, syms) — the artifact the
    APPLY side joins against. Encoding a 10^12-token corpus with a
    trained BPE never re-runs merges per document: the vocab (word ->
    symbol sequence) is encoded once here, and corpus encoding is a
    word-level equi-join (see bpe_token_counts)."""
    vocab = (word_counts(docs, text_col)
             .select("word", "weight",
                     F.concat(F.split(F.col("word"), ""),
                              F.array(F.lit(END))).alias("syms"))
             .localCheckpoint())
    rules = []
    for _ in range(n_merges):
        pairs = vocab.select(
            "weight",
            F.explode(F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1))).alias("p"))
        best = (pairs.select(F.col("p.0").alias("a"),
                             F.col("p.1").alias("b"), "weight")
                .groupBy("a", "b").agg(F.sum("weight").alias("n"))
                .orderBy(F.col("n").desc(), F.col("a").asc(),
                         F.col("b").asc())
                .limit(1).collect())
        if not best or best[0].n < 2:
            break
        a, b, n = best[0].a, best[0].b, best[0].n
        rules.append((a, b, n))
        # localCheckpoint per round keeps the plan flat; superseded
        # checkpoint blocks free via ContextCleaner on dereference
        # (see graph.py — production: reliable checkpoint dir)
        vocab = (vocab.withColumn("syms", _merge_fold(a, b))
                 .localCheckpoint())
    return rules, vocab


def bpe_token_counts(docs: DataFrame, vocab: DataFrame, rules: list,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document learned-BPE token counts: explode document words,
    equi-join the encoded vocabulary (word -> |symbols|), sum — the
    corpus-scale APPLY step costs one broadcast-or-shuffle join, no
    per-document merge replay. Words UNSEEN during training (the
    distinct set left-anti the vocab — small) are encoded by running
    the learned merge folds over them once, exactly as encoding them
    from scratch would (the merges apply to unseen words too).

    Note: the inlined-fold apply is right for the tens-to-hundreds of
    merges an analytics pass learns; a production 30k-merge tokenizer
    applies rules with a trie per word, not 30k plan operators.
    """
    norm = norm_text_sql(text_col, "spark")
    words = (docs.select(
                 F.col(id_col),
                 F.explode(F.split(F.expr(norm), " ")).alias("word"))
             .where(F.col("word") != ""))
    seen = vocab.select("word", F.size("syms").alias("n_syms"))

    unseen = (words.select("word").distinct()
              .join(vocab.select("word"), "word", "left_anti")
              .select("word",
                      F.concat(F.split(F.col("word"), ""),
                               F.array(F.lit(END))).alias("syms")))
    for a, b, _ in rules:
        unseen = unseen.withColumn("syms", _merge_fold(a, b))
    sizes = seen.unionByName(
        unseen.select("word", F.size("syms").alias("n_syms")))
    return (words.join(sizes, "word", "left")
            .groupBy(id_col)
            .agg(F.sum("n_syms").alias("n_bpe_learned"),
                 F.count(F.lit(1)).alias("n_words")))
