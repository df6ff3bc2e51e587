"""Web-corpus curation operators — the C4/RefinedWeb preprocessing
rules, expressed ENTIRELY in built-in JVM expressions (zero Python
UDFs: these are the highest-volume steps of a 100 TB pipeline, so
they must stay inside whole-stage codegen).

Two named operators every web-scale curation pipeline runs right
after WARC ingestion (operators/warc.py):

- HTML → text extraction with C4-style quality counters (terminal-
  punctuation lines, token counts) — `html_text_extract_stats`;
- URL normalization + registrable-domain rollup + blocklist filter —
  `url_domain_curation`.

Both oracles replay the same regex/string algebra in DuckDB (note
DuckDB's regexp_replace needs the 'g' flag where Spark's replaces all
matches by default).  The reference has no web surface; SURVEY §2B
north-star pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import register


@register(
    "html_text_extract_stats",
    oracle="""
    WITH h AS (
        SELECT doc_id, source,
               '<html><head><script>var k=' || doc_id ||
               ';</script><style>.c{color:red}</style></head><body>' ||
               '<h1>doc ' || doc_id || '</h1><p class="t">' || text ||
               '.</p><br/><!-- c' || doc_id || ' --></body></html>' AS html,
               text
        FROM documents
    ),
    s AS (
        SELECT doc_id, source, text,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(html,
                     '<script>[^<]*</script>|<style>[^<]*</style>|<!--[^>]*-->',
                     ' ', 'g'),
                   '<[^>]+>', ' ', 'g'),
                 ' +', ' ', 'g') AS spaced
        FROM h
    ),
    c AS (SELECT doc_id, source, text, trim(spaced) AS clean FROM s)
    SELECT doc_id,
           CAST(length(clean) AS BIGINT) AS n_chars_clean,
           CAST(length(clean) - length(replace(clean, ' ', '')) + 1
                AS BIGINT) AS n_tokens,
           CAST(CASE WHEN clean = 'doc ' || doc_id || ' ' || text || '.'
                THEN 1 ELSE 0 END AS BIGINT) AS extraction_exact,
           CAST(CASE WHEN clean LIKE '%.' THEN 1 ELSE 0 END AS BIGINT)
               AS ends_terminal
    FROM c ORDER BY doc_id
    """,
    tags=("llm", "web", "curation", "c4"),
)
def html_text_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style HTML → text extraction as pure JVM expressions: per
    document a genuine HTML page is built around the corpus text
    (script/style/comment blocks + heading + paragraph markup), then
    the extraction removes non-content blocks, strips tags, and
    collapses whitespace — three regexp_replace passes inside
    whole-stage codegen, NO Python in the loop.  `extraction_exact`
    asserts the round-trip recovers exactly the heading + original
    text + terminal period, and `ends_terminal` is the C4
    terminal-punctuation rule.  DuckDB replays the same regex algebra
    (with its explicit 'g' flag).

    Scale shape: a single narrow projection on the scan partitioning —
    the shape this step MUST have at 100 TB where it touches every
    byte of the crawl."""
    d = load(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><script>var k="),
        F.col("doc_id"),
        F.lit(";</script><style>.c{color:red}</style></head><body>"),
        F.lit("<h1>doc "),
        F.col("doc_id"),
        F.lit('</h1><p class="t">'),
        F.col("text"),
        F.lit(".</p><br/><!-- c"),
        F.col("doc_id"),
        F.lit(" --></body></html>"),
    )
    spaced = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                html,
                "<script>[^<]*</script>|<style>[^<]*</style>|<!--[^>]*-->",
                " ",
            ),
            "<[^>]+>",
            " ",
        ),
        " +",
        " ",
    )
    clean = F.trim(spaced)
    want = F.concat(
        F.lit("doc "), F.col("doc_id"), F.lit(" "), F.col("text"), F.lit(".")
    )
    return (
        d.select(
            "doc_id",
            F.length(clean).cast("long").alias("n_chars_clean"),
            (
                F.length(clean)
                - F.length(F.regexp_replace(clean, " ", ""))
                + F.lit(1)
            )
            .cast("long")
            .alias("n_tokens"),
            F.when(clean == want, 1).otherwise(0).cast("long").alias(
                "extraction_exact"
            ),
            F.when(clean.endswith("."), 1)
            .otherwise(0)
            .cast("long")
            .alias("ends_terminal"),
        )
        .orderBy("doc_id")
    )


@register(
    "url_domain_curation",
    oracle="""
    WITH u AS (
        SELECT doc_id, unnest(range(0, 3)) AS i FROM documents
    ),
    raw AS (
        SELECT doc_id, i,
               'HTTP://' ||
               (['News.Example.com', 'blog.example.com', 'Spam.bad-ads.net',
                 'docs.example.org'])[(doc_id + i) % 4 + 1] ||
               ':80/p/' || doc_id || '/x?b=2&a=1#frag' || i AS url
        FROM u
    ),
    norm AS (
        SELECT doc_id, i,
               regexp_replace(
                 regexp_replace(lower(url), '#.*$', ''),
                 ':80/', '/') AS nurl
        FROM raw
    ),
    dom AS (
        SELECT doc_id, nurl,
               regexp_extract(nurl, '^http://([^/]+)/', 1) AS host
        FROM norm
    ),
    reg AS (
        SELECT doc_id, nurl, host,
               regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain
        FROM dom
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
    FROM reg
    WHERE domain <> 'bad-ads.net'
    GROUP BY domain ORDER BY domain
    """,
    tags=("llm", "web", "curation", "url"),
)
def url_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL curation as pure JVM expressions: three crawl URLs per
    document (mixed-case scheme/host, default :80 port, fragments —
    the mess real crawls carry), normalized by lowercasing, fragment
    drop, and default-port strip; the registrable domain is rolled up
    (last two labels — a public-suffix list plugs in here at
    production), blocklisted domains are filtered, and the rollup
    counts URLs / docs / distinct hosts per domain — the
    frequency-per-domain table C4/RefinedWeb curation thresholds run
    on.  Zero Python; one explode + one aggregation.

    Scale shape: explode is per-row bounded (3), the aggregate is a
    map-side-combinable groupBy on a low-cardinality key — at 100 TB
    the only shuffle is domain-sized."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("i")
    )
    hosts = F.array(
        F.lit("News.Example.com"),
        F.lit("blog.example.com"),
        F.lit("Spam.bad-ads.net"),
        F.lit("docs.example.org"),
    )
    url = F.concat(
        F.lit("HTTP://"),
        F.element_at(hosts, ((F.col("doc_id") + F.col("i")) % 4 + 1).cast("int")),
        F.lit(":80/p/"),
        F.col("doc_id"),
        F.lit("/x?b=2&a=1#frag"),
        F.col("i"),
    )
    nurl = F.regexp_replace(
        F.regexp_replace(F.lower(url), "#.*$", ""), ":80/", "/"
    )
    host = F.regexp_extract(nurl, "^http://([^/]+)/", 1)
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return (
        d.select("doc_id", nurl.alias("nurl"), host.alias("host"),
                 domain.alias("domain"))
        .where(F.col("domain") != "bad-ads.net")
        .groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.countDistinct("host").cast("long").alias("n_hosts"),
        )
        .orderBy("domain")
    )
