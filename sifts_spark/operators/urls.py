"""URL / domain curation operators for crawled corpora.

Every production crawl pipeline filters and audits by DOMAIN before any
content-level stage (C4 and RefinedWeb both start with URL blocklists
and per-domain caps; Gopher's MassiveWeb reports per-domain attrition):
it is the cheapest signal available — no parse, no tokenize — and it is
where licensing/toxicity blocklists apply. These operators give the
engine that stage over any frame carrying a URL column (the ``uri`` the
WARC readers put in ``metadata``, or an explicit column).

Everything here is pure JVM expression (``parse_url``, arrays, one
groupBy for stats) — codegen'd, no Python, no UDFs; the only shuffle is
the stats aggregation keyed by domain.

Registrable domain ("example.co.uk" from "news.example.co.uk") is
computed against a built-in set of COMMON multi-label public suffixes,
not the full Public Suffix List (~10k entries, updated continuously —
a production deployment broadcasts the real PSL as a join or generated
literal; the operator takes ``extra_suffixes`` for that). The
approximation is documented, deterministic, and exactly reproducible
in SQL, which keeps the DuckDB twin byte-exact.

At 100 TB: host extraction and blocklist filtering are map-side
(broadcast anti-join for list-sized blocklists; for non-broadcastable
lists compose with ``functions/bloom.py``'s Bloom anti-join, same
pattern as the docs blocklist); ``domain_stats`` shuffles once on the
registrable domain — bounded by the domain count (~10^7 for the full
web), far below doc cardinality, and skew on mega-domains is partial-
aggregated map-side by Spark's hash aggregate before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Common multi-label public suffixes (second level). A host whose last
# TWO labels match takes three labels as its registrable domain.
_MULTI_SUFFIXES = (
    "co.uk org.uk ac.uk gov.uk net.uk "
    "com.au net.au org.au edu.au gov.au "
    "co.jp ne.jp or.jp ac.jp go.jp "
    "com.br net.br org.br gov.br "
    "co.in net.in org.in gen.in firm.in "
    "com.cn net.cn org.cn gov.cn edu.cn "
    "co.nz net.nz org.nz govt.nz "
    "co.za org.za net.za gov.za "
    "com.mx org.mx net.mx gob.mx "
    "com.ar net.ar org.ar gob.ar "
    "com.tr net.tr org.tr gov.tr "
    "co.kr ne.kr or.kr go.kr "
    "com.sg net.sg org.sg gov.sg "
    "com.hk net.hk org.hk gov.hk "
    "com.tw net.tw org.tw gov.tw "
    "co.il net.il org.il gov.il "
    "com.ua net.ua org.ua gov.ua "
    "com.pl net.pl org.pl gov.pl"
).split()

_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def url_host(url: Column | str) -> Column:
    """Lower-cased host of a URL (no port, no userinfo) — NULL for
    unparseable values. JVM ``parse_url``, codegen'd."""
    c = F.col(url) if isinstance(url, str) else url
    # try_parse_url: ANSI mode makes parse_url THROW on junk values —
    # crawl URLs are untrusted input, NULL is the contract
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def registrable_domain(
    host: Column | str, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable domain (eTLD+1 approximation) of a lower-cased host:
    last two labels, or last three when the two-label tail is a known
    multi-label suffix (``co.uk``-style; extend via ``extra_suffixes``
    — e.g. the full PSL rendered to literals). IPv4 hosts and
    single-label hosts pass through whole."""
    c = F.col(host) if isinstance(host, str) else host
    parts = F.split(c, r"\.")
    n = F.size(parts)
    tail2 = F.concat_ws(".", F.slice(parts, -2, 2))
    tail3 = F.concat_ws(".", F.slice(parts, -3, 3))
    suffixes = list(_MULTI_SUFFIXES) + list(extra_suffixes)
    return (
        # NULL host → NULL (concat_ws would otherwise fold NULL to "")
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c.rlike(_IPV4_RE) | (n <= 2), c)
        .when(tail2.isin(suffixes), tail3)
        .otherwise(tail2)
    )


def with_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Append host + registrable-domain columns (map-side)."""
    host = url_host(url_col)
    return df.withColumn("host", host).withColumn(
        out_col, registrable_domain(F.col("host"), extra_suffixes)
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = None,
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Per-registrable-domain corpus audit → ``(domain, n_docs,
    n_hosts, total_chars?, avg_chars?)`` sorted nowhere (caller
    orders). The per-domain doc share is THE input to domain capping
    (RefinedWeb §3.1 caps any single domain's contribution); feed this
    to ``topk_per_group`` / quantiles for the report."""
    d = with_domain(df, url_col, extra_suffixes=extra_suffixes)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
    ]
    if text_col is not None:
        aggs += [
            F.sum(F.length(text_col)).alias("total_chars"),
            F.round(F.avg(F.length(text_col)), 6).alias("avg_chars"),
        ]
    return d.groupBy("domain").agg(*aggs)


def filter_domains(
    df: DataFrame,
    blocked: DataFrame | list[str] | tuple[str, ...],
    url_col: str = "url",
    mode: str = "block",
    extra_suffixes: tuple[str, ...] = (),
) -> DataFrame:
    """Drop (``mode="block"``) or keep (``mode="allow"``) rows whose
    registrable domain is in the list. List-sized inputs become a
    BROADCAST anti/semi join (blocklists are ~10^5-10^6 rows — always
    broadcastable); a DataFrame input must have a ``domain`` column.
    Subdomains match their registrable domain by construction
    (``ads.tracker.co.uk`` is blocked by ``tracker.co.uk``). For a
    blocklist too large to broadcast, build the same key and use
    ``functions.bloom.bloom_anti_join`` — identical semantics, map-side
    probe. Original columns pass through unchanged."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    spark = df.sparkSession
    if not isinstance(blocked, DataFrame):
        blocked = spark.createDataFrame(
            [(d.lower(),) for d in blocked], "domain string"
        )
    key = registrable_domain(url_host(url_col), extra_suffixes)
    how = "left_anti" if mode == "block" else "left_semi"
    return (
        df.withColumn("__dom", key)
        .join(
            F.broadcast(blocked.select(F.col("domain").alias("__dom"))),
            "__dom",
            how,
        )
        .drop("__dom")
    )
