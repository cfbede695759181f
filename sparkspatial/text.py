"""Training-data text operators over web-page corpora.

Beyond-reference ops a 100 TB training-data pipeline needs (task
brief): deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard),
language-ID, quality scoring, token counting, fingerprinting.

Design rule: every operator is pure relational algebra + built-in
functions (JVM, whole-stage codegen) wherever possible, so the same
semantics are expressible in DuckDB oracle SQL. The only randomness is
the deterministic h32 hash family; permutations are fixed affine maps
mod the Mersenne-31 prime, so MinHash signatures are bit-reproducible
across engines.

Scale notes: exact dedup is one hash-shuffle on a 16-byte key; MinHash
is explode(shingles) -> partial-agg min per hash (map-side combine
soaks up the explode); LSH banding turns all-pairs similarity into an
equi-join on band keys — the standard linear-scan-free near-dup plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import h32_duckdb_sql, h32_spark_sql

MERSENNE31 = (1 << 31) - 1

# fixed affine MinHash permutations (a_j, b_j) — generated once from
# h32 of a versioned seed string, identical in every engine. The
# modulus is Mersenne-31 so a*(h%p)+b stays < 2^63 (BIGINT-safe in
# Spark, DuckDB and numpy alike).
def minhash_params(n_hashes: int) -> list[tuple[int, int]]:
    from .hashing import h32

    out = []
    for j in range(n_hashes):
        a = (h32(f"minhash-a-{j}") % (MERSENNE31 - 2)) + 1
        b = h32(f"minhash-b-{j}") % MERSENNE31
        out.append((a, b))
    return out


# ------------------------------------------------------------------ basics

def norm_text_sql(col: str, dialect: str = "spark") -> str:
    """Lower + collapse whitespace.

    Spark's regexp_replace is replace-all; DuckDB needs the 'g' flag.
    """
    if dialect == "spark":
        return f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def fingerprint_sql(col: str, dialect: str = "spark") -> str:
    """Document fingerprint: md5 of normalized text, first 16 hex."""
    return f"substring(md5({norm_text_sql(col, dialect)}), 1, 16)"


def token_count_sql(col: str, dialect: str = "spark") -> str:
    if dialect == "spark":
        return (f"CASE WHEN length(trim({col})) = 0 THEN 0 "
                f"ELSE size(split(trim({col}), '\\\\s+')) END")
    return (f"CASE WHEN length(trim({col})) = 0 THEN 0 "
            f"ELSE len(regexp_split_to_array(trim({col}), '\\s+')) END")


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the minimum id per normalized-text hash."""
    h = F.expr(fingerprint_sql(text_col))
    return (docs.withColumn("fp", h)
            .groupBy("fp")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "y"],
}


def _count_word_sql(col: str, word: str, dialect: str = "spark") -> str:
    """# of occurrences of ' word ' in ' '||text||' ' via length diff."""
    padded = f"(' ' || {norm_text_sql(col, dialect)} || ' ')"
    return (f"CAST((length({padded}) - "
            f"length(replace({padded}, ' {word} ', ''))) / {len(word) + 2} "
            f"AS BIGINT)")


def lang_scores_sql(col: str, dialect: str = "spark") -> dict[str, str]:
    """Per-language stopword-hit counts (n-gram-heuristic lang-ID)."""
    return {
        lang: "(" + " + ".join(_count_word_sql(col, w, dialect)
                               for w in words) + ")"
        for lang, words in STOPWORDS.items()
    }


def lang_id_sql(col: str, dialect: str = "spark") -> str:
    """Predicted language: argmax of stopword hits, ties -> lang name
    order, zero hits -> 'und'. Same semantics in both dialects."""
    scores = lang_scores_sql(col, dialect)
    langs = sorted(scores)  # deterministic tie order
    greatest = "GREATEST(" + ", ".join(scores[l] for l in langs) + ")"
    exprs = " ".join(
        f"WHEN {scores[l]} = {greatest} AND {scores[l]} > 0 THEN '{l}'"
        for l in langs)
    return f"(CASE {exprs} ELSE 'und' END)"


def quality_score_sql(col: str, dialect: str = "spark") -> str:
    """Quality heuristic in [0,1]: token-length band + punctuation
    terminal + stopword presence (pure arithmetic, cross-engine)."""
    ntok = token_count_sql(col, dialect)
    stop_en = _count_word_sql(col, "the", dialect)
    punct = (f"(length({col}) - length(replace(replace(replace("
             f"{col}, '.', ''), '!', ''), '?', '')))")
    return (f"(CASE WHEN ({ntok}) >= 5 AND ({ntok}) <= 100000 THEN 4e-1 "
            f"ELSE 0e0 END "
            f"+ CASE WHEN {punct} > 0 THEN 3e-1 ELSE 0e0 END "
            f"+ CASE WHEN ({stop_en}) > 0 THEN 3e-1 ELSE 0e0 END)")


# ------------------------------------------------------------------ shingles

def shingles_sql(col: str, k: int, dialect: str = "spark") -> str:
    """k-word shingle array from normalized text.

    Spark: higher-order functions over split(); DuckDB: list lambdas.
    Documents shorter than k words yield a single shingle of the whole
    text (so short docs still dedup).
    """
    norm = norm_text_sql(col, dialect)
    if dialect == "spark":
        toks = f"split({norm}, ' ')"
        return (f"CASE WHEN size({toks}) < {k} THEN array({norm}) "
                f"ELSE transform(sequence(1, size({toks}) - {k - 1}), "
                f"i -> concat_ws(' ', slice({toks}, i, {k}))) END")
    toks = f"string_split({norm}, ' ')"
    join = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    return (f"CASE WHEN len({toks}) < {k} THEN [{norm}] "
            f"ELSE (SELECT list_transform(generate_series(1, len(__t) - {k - 1}), "
            f"i -> {join}) FROM (SELECT {toks} AS __t)) END")


# rolling-combination constants for token-based shingle hashing:
# shingle_hash(t1..tk) = sum_j h32(t_j) * B^(k-j) mod M31 — one md5
# per TOKEN (not per concatenated shingle), combined with exact
# integer arithmetic that both engines reproduce.
SHINGLE_B = 1000003


# NOTE: an array-based Spark formulation (transform over token-hash
# arrays + element_at windows) was removed: projection collapse inlines
# the token-hash array into every element_at, re-evaluating O(tokens)
# md5 calls per SHINGLE (O(tokens^2) per doc, measured 46s vs 8s cold
# at sf0.1). The window-lead formulation in minhash_signatures hashes
# each token exactly once.


def shingle_hashes_duckdb_sql(col: str, k: int) -> str:
    """DuckDB expr mirroring the Spark pair above (correlated scalar
    subquery binds the token-hash list once per row)."""
    norm = norm_text_sql(col, "duckdb")
    coefs = [pow(SHINGLE_B, k - 1 - j, MERSENNE31) for j in range(k)]
    h = h32_duckdb_sql("t")
    toks = (f"list_transform(string_split({norm}, ' '), "
            f"t -> ({h}) % {MERSENNE31})")
    terms = " + ".join(
        f"(__th[i + {j}] * {coefs[j]}) % {MERSENNE31}" for j in range(k))
    whole = f"({h32_duckdb_sql(norm)}) % {MERSENNE31}"
    return (f"CASE WHEN len(string_split({norm}, ' ')) < {k} "
            f"THEN [{whole}] ELSE "
            f"(SELECT list_transform(generate_series(1, len(__th) - {k - 1}), "
            f"i -> ({terms}) % {MERSENNE31}) "
            f"FROM (SELECT {toks} AS __th)) END")


def minhash_sql_exprs(n_hashes: int, hash_col: str = "sh") -> list[str]:
    """Aggregate expressions MIN((a*h+b) % p) per permutation, over an
    exploded shingle-hash column. Same text both dialects."""
    return [
        f"MIN((({a} * ({hash_col} % {MERSENNE31}) + {b}) % {MERSENNE31}))"
        f" AS mh{j}"
        for j, (a, b) in enumerate(minhash_params(n_hashes))
    ]


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n_hashes: int = 16,
                       shingle_k: int = 3) -> DataFrame:
    """(id, mh0..mhN) MinHash signature matrix.

    Token-level md5 hashing + rolling shingle combination (one hash
    per token instead of per concatenated shingle), then
    explode(shingle hashes) -> groupBy(id) with N partial-agg mins:
    the explode never shuffles (map-side combine collapses it before
    the exchange on id).
    """
    norm = norm_text_sql(text_col, "spark")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.expr(norm), " ")).alias("pos", "tok"),
        F.size(F.split(F.expr(norm), " ")).alias("ntok"))
    th = toks.select(
        id_col, "pos", "ntok",
        (F.expr(h32_spark_sql("tok")) % MERSENNE31).alias("th"))
    # rolling k-shingle hash via window leads — each token hashes once
    # (an array formulation re-evaluates the token-hash array per
    # shingle after projection collapse: O(tokens^2) md5 per doc)
    w = Window.partitionBy(id_col).orderBy("pos")
    coefs = [pow(SHINGLE_B, shingle_k - 1 - j, MERSENNE31)
             for j in range(shingle_k)]
    parts = [(F.lead("th", j).over(w) if j else F.col("th"))
             * F.lit(coefs[j]) % MERSENNE31
             for j in range(shingle_k)]
    sh_expr = parts[0]
    for p in parts[1:]:
        sh_expr = sh_expr + p
    long_docs = (th.where(F.col("ntok") >= shingle_k)
                 .select(id_col, (sh_expr % MERSENNE31).alias("sh"))
                 .where(F.col("sh").isNotNull()))
    short_docs = (docs
                  .where(F.expr(f"size(split({norm}, ' '))") < shingle_k)
                  .select(F.col(id_col),
                          (F.expr(h32_spark_sql(norm)) % MERSENNE31)
                          .alias("sh")))
    exploded = long_docs.unionByName(short_docs)
    aggs = [F.expr(e) for e in minhash_sql_exprs(n_hashes)]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id",
                        bands: int = 4) -> DataFrame:
    """Band the signature matrix; docs sharing a band-hash pair up.

    Returns distinct (id_a, id_b), id_a < id_b. The band join is an
    equi-join on (band_idx, band_hash) — broadcast-or-shuffle by size,
    AQE-managed; no all-pairs comparison ever materializes.
    """
    mh_cols = [c for c in sigs.columns if c.startswith("mh")]
    rows_per_band = len(mh_cols) // bands
    band_exprs = []
    for b in range(bands):
        chunk = mh_cols[b * rows_per_band:(b + 1) * rows_per_band]
        band_exprs.append(
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(*[F.col(c) for c in chunk]).alias("bh")))
    banded = (sigs.select(id_col, F.explode(F.array(*band_exprs)).alias("e"))
              .select(id_col, "e.band", "e.bh"))
    # persist: the self-join would otherwise recompute the full
    # signature pipeline once per join side; registered so long-lived
    # sessions can release it via session.unpersist_all()
    banded = banded.persist()
    from . import session as _session
    _session.register_persisted(banded)
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, on=["band", "bh"])
            .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"))
            .distinct())


def token_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs — pure relational
    (explode -> equi-joins -> counts), no UDF.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|)
    """
    sh = (docs.select(F.col(id_col),
                      F.explode(F.expr(shingles_sql(text_col, shingle_k)))
                      .alias("shingle"))
          .distinct())
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (pairs
             .join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
             .join(sh.withColumnRenamed(id_col, "id_b")
                     .withColumnRenamed("shingle", "shingle_b"),
                   on="id_b")
             .where(F.col("shingle") == F.col("shingle_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    return (pairs
            .join(inter, on=["id_a", "id_b"], how="left")
            .na.fill({"n_inter": 0})
            .join(sizes.withColumnRenamed(id_col, "id_a")
                       .withColumnRenamed("n", "n_a"), on="id_a")
            .join(sizes.withColumnRenamed(id_col, "id_b")
                       .withColumnRenamed("n", "n_b"), on="id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter")
                     / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard")))


# ------------------------------------------------------------------ simhash

def simhash_exprs(n_bits: int = 32, hash_col: str = "th") -> list[str]:
    """Per-bit weighted sums for SimHash over exploded token hashes."""
    return [
        f"SUM(CASE WHEN ({hash_col} // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)"
        f" AS s{b}"
        for b in range(n_bits)
    ]


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", n_bits: int = 32) -> DataFrame:
    """32-bit SimHash: tokens -> h32 -> per-bit majority vote.

    The per-bit sums are 32 partial aggregates over the exploded token
    stream (map-side combine); the final fold to an int is arithmetic.
    """
    toks = (docs.select(
        F.col(id_col),
        F.explode(F.split(F.expr(norm_text_sql(text_col)), " "))
        .alias("tok")))
    toks = toks.select(id_col, F.expr(h32_spark_sql("tok")).alias("th"))
    # Spark integer division is DIV
    aggs = [F.expr(e.replace("//", "DIV")) for e in simhash_exprs(n_bits)]
    sums = toks.groupBy(id_col).agg(*aggs)
    bit_terms = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits))
    return sums.select(id_col, F.expr(f"({bit_terms})").alias("simhash"))


def simhash_duckdb_sql(n_bits: int = 32, text_col: str = "text",
                       id_col: str = "doc_id",
                       table: str = "documents") -> str:
    """DuckDB oracle for :func:`simhash` (same math, list dialect)."""
    norm = norm_text_sql(text_col, "duckdb")
    h = h32_duckdb_sql("tok")
    sums = ", ".join(e for e in simhash_exprs(n_bits, "th"))
    bit_terms = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits))
    return f"""
        WITH toks AS (
            SELECT {id_col}, unnest(string_split({norm}, ' ')) AS tok
            FROM {table}),
        hashed AS (SELECT {id_col}, {h} AS th FROM toks),
        sums AS (SELECT {id_col}, {sums} FROM hashed GROUP BY {id_col})
        SELECT {id_col}, ({bit_terms}) AS simhash FROM sums
    """


# ------------------------------------------------------- repetition / sampling

def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document.

    Output: (id, n_tokens, n_distinct, dup_token_frac,
    top_token_share, top_bigram_share) where
      dup_token_frac  = 1 - n_distinct / n_tokens
      top_token_share = count(mode token) / n_tokens
      top_bigram_share= count(mode bigram) / n_bigrams.

    Scale shape: explode -> partial-agg count per (id, gram) ->
    per-id agg. The (id, gram) partial aggregation map-side-combines
    the explode (same plan discipline as minhash_signatures), so the
    only wide exchanges are two hash shuffles keyed by (id, gram) —
    repetitive documents compress in the combiner instead of
    traveling, which is exactly the skew you want soaked up at 100 TB
    (a spam page with one token 10^6 times shuffles one row).
    """
    norm = F.expr(norm_text_sql(text_col))
    uni = (docs.select(F.col(id_col), F.explode(F.split(norm, " "))
                       .alias("g"))
           .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
           .groupBy(id_col)
           .agg(F.sum("c").alias("n_tokens"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.max("c").alias("top_c")))
    bi = (docs.select(F.col(id_col),
                      F.explode(F.expr(shingles_sql(text_col, 2)))
                      .alias("g"))
          .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
          .groupBy(id_col)
          .agg(F.sum("c").alias("n_bigrams"),
               F.max("c").alias("top_bi_c")))
    return (uni.join(bi, id_col)
            .select(
                id_col, "n_tokens", "n_distinct",
                (F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"))
                .alias("dup_token_frac"),
                (F.col("top_c") / F.col("n_tokens"))
                .alias("top_token_share"),
                (F.col("top_bi_c") / F.col("n_bigrams"))
                .alias("top_bigram_share")))


def repetition_stats_duckdb_sql(text_col: str = "text",
                                id_col: str = "doc_id",
                                table: str = "documents") -> str:
    """DuckDB oracle for :func:`repetition_stats` (same integer counts,
    same IEEE divisions)."""
    norm = norm_text_sql(text_col, "duckdb")
    bigrams = shingles_sql(text_col, 2, "duckdb")
    return f"""
        WITH u1 AS (
            SELECT {id_col}, unnest(string_split({norm}, ' ')) AS g
            FROM {table}),
        u2 AS (SELECT {id_col}, g, count(*) AS c FROM u1 GROUP BY 1, 2),
        uni AS (SELECT {id_col},
                       -- duckdb SUM(BIGINT) is HUGEINT; pin to BIGINT
                       CAST(SUM(c) AS BIGINT) AS n_tokens,
                       COUNT(*) AS n_distinct, MAX(c) AS top_c
                FROM u2 GROUP BY 1),
        b1 AS (
            SELECT {id_col}, unnest({bigrams}) AS g FROM {table}),
        b2 AS (SELECT {id_col}, g, count(*) AS c FROM b1 GROUP BY 1, 2),
        bi AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                      MAX(c) AS top_bi_c
               FROM b2 GROUP BY 1)
        SELECT uni.{id_col}, n_tokens, n_distinct,
               1e0 - CAST(n_distinct AS DOUBLE) / n_tokens
                   AS dup_token_frac,
               CAST(top_c AS DOUBLE) / n_tokens AS top_token_share,
               CAST(top_bi_c AS DOUBLE) / n_bigrams AS top_bigram_share
        FROM uni JOIN bi USING ({id_col})
    """


def hash_sample_sql(key_expr: str, rate_num: int, rate_den: int,
                    dialect: str = "spark") -> str:
    """Deterministic hash-based sampling predicate: keep rows where
    h32(key) % den < num.

    Unlike rand()-based sampling this is reproducible across engines,
    runs, and partitionings — the property a training pipeline needs
    so a resumed/partial job samples the SAME documents (and so the
    sample of a table equals the sample of its shards unioned).
    """
    h = (h32_spark_sql(key_expr) if dialect == "spark"
         else h32_duckdb_sql(key_expr))
    return f"({h}) % {rate_den} < {rate_num}"
