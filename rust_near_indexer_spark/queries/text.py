"""Text-analysis operators over the ``documents`` table (north-star §LLM).

Large-scale training-data pipeline primitives: token counting
(whitespace + BPE-ish regex), language-ID heuristic, quality scoring,
and document fingerprinting — all pure ``pyspark.sql.functions``
(higher-order array functions; zero Python UDFs), each hash-matched
against a DuckDB oracle implementing the same semantics.

Determinism: ratios/scores live in integer milli-units; fingerprints use
the cross-engine md5-based hash60 (canonical.py).

Scale posture: every query is scan→project→(small) aggregate — no
shuffle except the final groupBy on low-cardinality keys; at 100 TB these
run as embarrassingly parallel scans with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load, spread
from . import register
from .dedup import AUG_SQL

# Frequent tokens of the synthetic corpus's "English" register; the
# heuristic generalizes to real stopword lists unchanged.
MARKER_WORDS = ("the", "and", "of", "table", "row", "query", "data", "join", "scan", "value")
_MARKERS_SQL = "('" + "', '".join(MARKER_WORDS) + "')"

# BPE-ish pre-tokenizer: word pieces or single non-space punctuation.
TOKEN_RE = r"\w+|[^\w\s]"


def _words(col):
    return F.split(col, " ")


_MARKER_VALUES_SQL = ", ".join(f"('{w}', 'marker')" for w in MARKER_WORDS)


@register(
    "token_frequencies_salted",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    agg AS (
        SELECT t.token, COALESCE(d.token_class, 'other') AS token_class,
               CAST(count(*) AS BIGINT) AS n
        FROM toks t
        LEFT JOIN (SELECT * FROM (VALUES {_MARKER_VALUES_SQL}) v(token, token_class)) d
               ON d.token = t.token
        WHERE t.token != ''
        GROUP BY 1, 2
    )
    SELECT token, token_class, n FROM agg
    ORDER BY n DESC, token
    LIMIT 20
    """,
    tags=("llm", "text", "skew"),
)
def token_frequencies_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token frequencies through a skew-resilient salted join.

    Exploded tokens are Zipf-distributed — the hottest token appears in
    nearly every document, the exact single-hot-key shape that breaks an
    unsalted shuffle join at corpus scale.  ``operators.skew.salted_join``
    spreads each hot key over 8 salt partitions; the result is provably
    identical to the plain join (the oracle runs the unsalted SQL)."""
    from ..operators.skew import salted_join

    toks = (
        spread(load(spark, sf_dir, "documents"), "doc_id")
        .select(F.explode(_words(F.col("text"))).alias("token"))
        .where(F.col("token") != "")
    )
    dim = spark.createDataFrame(
        [(w, "marker") for w in MARKER_WORDS], "token string, token_class string"
    )
    return (
        salted_join(toks, dim, "token", n_salt=8, how="left")
        .select("token", F.coalesce("token_class", F.lit("other")).alias("token_class"))
        .groupBy("token", "token_class")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


@register(
    "text_stats",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           ROUND(SUM(length(text)) / (SUM(len(string_split(text, ' '))) * 1.0), 4) AS chars_per_token
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("llm", "text"),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per source: whitespace tokens + BPE-ish regex tokens
    (regexp_extract_all stays inside whole-stage codegen)."""
    d = load(spark, sf_dir, "documents")
    ws_tokens = F.size(_words(F.col("text")))
    bpe_tokens = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), F.lit(0)))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(ws_tokens).alias("total_tokens"),
            F.sum(bpe_tokens).alias("total_bpe_tokens"),
            F.sum(F.length("text")).alias("total_chars"),
            F.max(ws_tokens).alias("max_tokens"),
            F.round(
                F.sum(F.length("text")) / (F.sum(ws_tokens) * F.lit(1.0)), 4
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


@register(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKERS_SQL})) AS marker_hits,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT lang,
           CASE WHEN marker_hits * 1000 >= n_tokens * 30 THEN 'en' ELSE 'other' END AS predicted,
           COUNT(*) AS n_docs,
           CAST(SUM(marker_hits) AS BIGINT) AS total_marker_hits
    FROM scored
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    tags=("llm", "text"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-word language-ID heuristic → confusion matrix against
    the labeled ``lang`` column.  Threshold in integer milli-units
    (hits/token ≥ 3%)."""
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    hits = F.size(F.filter(words, lambda w: w.isin(*MARKER_WORDS)))
    n_tokens = F.size(words)
    scored = d.select(
        "lang",
        hits.alias("marker_hits"),
        n_tokens.alias("n_tokens"),
    )
    predicted = F.when(
        F.col("marker_hits") * 1000 >= F.col("n_tokens") * 30, F.lit("en")
    ).otherwise(F.lit("other"))
    return (
        scored.groupBy("lang", predicted.alias("predicted"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("marker_hits").alias("total_marker_hits"),
        )
        .orderBy("lang", "predicted")
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKERS_SQL})) AS marker_hits,
               len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
        FROM documents
    )
    SELECT doc_id,
           LEAST(500, n_tokens) + LEAST(300, marker_hits * 25)
             - LEAST(200, (n_punct * 1000) // GREATEST(n_tokens, 1)) AS score_milli,
           CASE WHEN LEAST(500, n_tokens) + LEAST(300, marker_hits * 25)
                     - LEAST(200, (n_punct * 1000) // GREATEST(n_tokens, 1)) >= 400
                THEN 'keep' ELSE 'filter' END AS verdict
    FROM f
    ORDER BY doc_id
    """,
    tags=("llm", "text"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score: length + marker-word density − punct
    penalty, all integer milli-units; banded into keep/filter — the
    pre-training corpus filter shape."""
    d = load(spark, sf_dir, "documents")
    words = _words(F.col("text"))
    n_tokens = F.size(words)
    marker_hits = F.size(F.filter(words, lambda w: w.isin(*MARKER_WORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), F.lit(0)))
    # floor division on both sides (values non-negative, so Spark's
    # truncating double→long cast equals DuckDB's // floor)
    score = (
        F.least(F.lit(500), n_tokens)
        + F.least(F.lit(300), marker_hits * 25)
        - F.least(
            F.lit(200),
            F.floor(n_punct * 1000 / F.greatest(n_tokens, F.lit(1))).cast("long"),
        )
    )
    return d.select(
        "doc_id",
        score.alias("score_milli"),
        F.when(score >= 400, F.lit("keep")).otherwise(F.lit("filter")).alias("verdict"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    oracle="""
    WITH sh AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(
               list_transform(range(1, GREATEST(len(w) - 2, 0) + 1),
                              i -> array_to_string(w[i:i+2], ' ')),
               s -> ('0x' || substring(md5(s), 1, 15))::BIGINT)) AS fingerprint
    FROM sh
    ORDER BY doc_id
    """,
    tags=("llm", "text", "S26"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint: min hash60 over 3-word shingles
    (a 1-permutation MinHash — the dedup building block)."""
    d = spread(load(spark, sf_dir, "documents"), "doc_id")
    w = _words(F.col("text"))
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i, 3)),
    )
    fp = F.array_min(
        F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        )
    )
    # docs shorter than 3 words have no shingle → NULL (matches the
    # oracle's list_min([]) = NULL)
    return d.select(
        "doc_id", F.when(F.size(w) >= 3, fp).otherwise(F.lit(None)).alias("fingerprint")
    ).orderBy("doc_id")


# Funnel cutoffs calibrated to this corpus (score p25≈240, median≈354;
# marker-density median ≈266 milli) so every stage discriminates — a real
# curation pipeline tunes these per corpus the same way.
Q_MIN = 300
L_MIN_MILLI = 250


@register(
    "corpus_curation_funnel",
    oracle=f"""
    WITH aug AS ({AUG_SQL}),
    f AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '), w -> w IN {_MARKERS_SQL})) AS marker_hits,
               len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
        FROM aug
    ),
    flags AS (
        SELECT *,
               (LEAST(500, n_tokens) + LEAST(300, marker_hits * 25)
                - LEAST(200, (n_punct * 1000) // GREATEST(n_tokens, 1))) >= {Q_MIN} AS q,
               marker_hits * 1000 >= n_tokens * {L_MIN_MILLI} AS l
        FROM f
    ),
    surv AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM flags WHERE q AND l
    )
    SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS total_tokens FROM flags
    UNION ALL
    SELECT '2_quality', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM flags WHERE q
    UNION ALL
    SELECT '3_language', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM flags WHERE q AND l
    UNION ALL
    SELECT '4_dedup', COUNT(*), CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM surv WHERE rn = 1
    ORDER BY stage
    """,
    tags=("llm", "text", "dedup", "capstone"),
)
def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation funnel: quality filter →
    language filter → exact dedup (keep-min), reporting surviving docs
    and tokens after each stage — the composition a 100 TB pre-training
    pipeline runs, with every stage's scoring expressions identical to
    its standalone oracle-gated query (text_quality_score,
    text_language_id, dedup_exact) and cutoffs calibrated to the corpus.

    Scale shape: stages 1–3 are ONE corpus scan — each doc explodes into
    the list of stages it survives, then a map-side-combined count per
    stage (no per-stage re-scan); the dedup stage is the only wide
    exchange (window on the content key over the already-filtered
    survivors)."""
    from .dedup import augmented_docs
    from pyspark.sql.window import Window

    words = _words(F.col("text"))
    n_tokens = F.size(words)
    marker_hits = F.size(F.filter(words, lambda w: w.isin(*MARKER_WORDS)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), F.lit(0)))
    score = (
        F.least(F.lit(500), n_tokens)
        + F.least(F.lit(300), marker_hits * 25)
        - F.least(
            F.lit(200),
            F.floor(n_punct * 1000 / F.greatest(n_tokens, F.lit(1))).cast("long"),
        )
    )
    flags = augmented_docs(spark, sf_dir).select(
        "doc_id",
        "text",
        n_tokens.alias("n_tokens"),
        (score >= Q_MIN).alias("q"),
        (marker_hits * 1000 >= n_tokens * L_MIN_MILLI).alias("l"),
    )
    surv = (
        flags.where(F.col("q") & F.col("l"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("text").orderBy("doc_id"))
        )
        .where(F.col("rn") == 1)
    )

    reached = F.array_compact(
        F.array(
            F.lit("1_raw"),
            F.when(F.col("q"), F.lit("2_quality")),
            F.when(F.col("q") & F.col("l"), F.lit("3_language")),
        )
    )
    counts = (
        flags.select("n_tokens", F.explode(reached).alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("c"), F.sum("n_tokens").alias("t"))
    )
    # spine guarantees a row per stage even when a cutoff filters everything
    spine = spark.createDataFrame(
        [("1_raw",), ("2_quality",), ("3_language",)], "stage string"
    )
    funnel = spine.join(counts, "stage", "left").select(
        "stage",
        F.coalesce("c", F.lit(0)).alias("n_docs"),
        F.coalesce("t", F.lit(0)).alias("total_tokens"),
    )
    dedup_stage = surv.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
    ).select(F.lit("4_dedup").alias("stage"), "n_docs", "total_tokens")
    return funnel.unionByName(dedup_stage).orderBy("stage")
