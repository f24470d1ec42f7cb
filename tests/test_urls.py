"""URL / domain curation — operators/urls.py.

`domain_stats` is pinned value-exact against a DuckDB twin over URLs
synthesized deterministically from the real documents table (same
construction in both engines), the same test-level-oracle pattern as
fingerprint/boilerplate. Unit rows cover the eTLD+1 approximation
corners (multi-label suffixes, IPv4, single label, port/userinfo/case,
junk URLs) and both filter modes, plus the broadcast plan shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from sifts_spark.operators.urls import (
    PublicSuffixList,
    cap_domains,
    dedup_by_url,
    domain_stats,
    filter_domains,
    normalize_url,
    normalize_url_sql,
    registrable_domain,
    url_duplicates,
    url_host,
    with_domain,
)

SF_DIR = "/root/testdata/sf0.001"

# Deterministic URL synthesis shared by Spark and DuckDB: doc_id % 5
# picks a host family covering subdomains, co.uk, IPv4 and bare hosts.
_URL_CASE_SQL = """
CASE CAST(doc_id AS INTEGER) % 5
  WHEN 0 THEN 'https://www.' || source || '.example.com/a/' || doc_id
  WHEN 1 THEN 'https://news.' || source || '.example.com/b'
  WHEN 2 THEN 'http://shop.' || source || '.co.uk/c?x=' || doc_id
  WHEN 3 THEN 'http://192.168.0.' || (CAST(doc_id AS INTEGER) % 250) || '/d'
  ELSE 'http://intranet/e/' || doc_id
END
"""


@pytest.fixture(scope="module")
def url_docs(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.withColumn("url", F.expr(_URL_CASE_SQL))


# Messy-URL synthesis for the normalize_url twin: tracking params in
# both cases, unsorted params, default and non-default ports, userinfo,
# fragments, hostless junk — every normalization path exercised with
# the same construction in both engines.
_MESSY_URL_CASE_SQL = """
CASE CAST(doc_id AS INTEGER) % 7
  WHEN 0 THEN 'https://www.' || source || '.Example.com/a/' || doc_id
              || '?utm_source=feed&id=' || doc_id || '&b=2#frag'
  WHEN 1 THEN 'http://' || source || '.example.co.uk:80/b?z=1&a=' || doc_id
  WHEN 2 THEN 'https://shop.' || source || '.com:443/c'
  WHEN 3 THEN 'http://user@' || source || '.org:8080/d?UTM_CAMPAIGN=x'
  WHEN 4 THEN 'http://' || source || '.net'
  WHEN 5 THEN 'not a url ' || doc_id
  ELSE 'https://cdn.' || source || '.io/p/?fbclid=abc&x=' || doc_id
       || '&flag'
END
"""


@pytest.fixture(scope="module")
def url_docs_messy(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return (
        docs.withColumn("url", F.expr(_MESSY_URL_CASE_SQL)),
        _MESSY_URL_CASE_SQL,
    )


class TestHostAndDomain:
    @pytest.mark.parametrize(
        "url,host,domain",
        [
            ("http://User@News.Example.CO.UK:8080/a?x=1",
             "news.example.co.uk", "example.co.uk"),
            ("https://sub.news.example.com/path",
             "sub.news.example.com", "example.com"),
            ("http://192.168.0.1/x", "192.168.0.1", "192.168.0.1"),
            ("http://localhost/x", "localhost", "localhost"),
            ("ftp://a.b.c.d.co.jp/f", "a.b.c.d.co.jp", "d.co.jp"),
            ("not a url", None, None),
        ],
    )
    def test_corner_cases(self, spark, url, host, domain):
        (row,) = (
            spark.createDataFrame([(url,)], "url string")
            .select(url_host("url").alias("h"),
                    registrable_domain(url_host("url")).alias("d"))
            .collect()
        )
        assert row["h"] == host and row["d"] == domain

    def test_extra_suffixes_extend_the_psl_subset(self, spark):
        (row,) = (
            spark.createDataFrame([("http://a.b.custom.tld/x",)], "url string")
            .select(registrable_domain(
                url_host("url"), extra_suffixes=("custom.tld",)).alias("d"))
            .collect()
        )
        assert row["d"] == "b.custom.tld"


class TestPublicSuffixList:
    """Expectations mirror publicsuffix.org's published test vectors
    (checkPublicSuffix cases) for the rule subset below — exact rules,
    wildcard (`*.ck`, `*.kawasaki.jp`, a multi-label-base
    `*.platform.sh`), and exceptions (`!www.ck`, `!city.kawasaki.jp`)."""

    PSL_TEXT = """\
// ===BEGIN test section===
com
uk
co.uk  // inline note: rule ends at first whitespace per spec
jp
sh
*.ck
!www.ck
*.kawasaki.jp
!city.kawasaki.jp
*.platform.sh

// blank + comment lines above must be ignored
"""

    @pytest.fixture(scope="class")
    def psl(self):
        return PublicSuffixList(self.PSL_TEXT)

    @pytest.mark.parametrize(
        "host,domain",
        [
            # exact rules, longest wins
            ("example.com", "example.com"),
            ("www.example.com", "example.com"),
            ("example.co.uk", "example.co.uk"),
            ("a.b.example.co.uk", "example.co.uk"),
            # host IS a public suffix → no registrable domain
            ("com", None),
            ("co.uk", None),
            # wildcard: any single label under the base is a suffix
            ("foo.ck", None),
            ("bar.foo.ck", "bar.foo.ck"),
            ("a.bar.foo.ck", "bar.foo.ck"),
            # the wildcard base itself is NOT matched by the wildcard —
            # falls through to the default rule (no exact 'ck' rule)
            ("ck", None),
            # exception rules prevail over the covering wildcard
            ("www.ck", "www.ck"),
            ("a.www.ck", "www.ck"),
            ("test.kawasaki.jp", None),
            ("a.test.kawasaki.jp", "a.test.kawasaki.jp"),
            ("city.kawasaki.jp", "city.kawasaki.jp"),
            ("test.city.kawasaki.jp", "city.kawasaki.jp"),
            ("kawasaki.jp", "kawasaki.jp"),  # exact 'jp' rule
            # multi-label wildcard base: host == base must NOT hit the
            # wildcard; exact 'sh' prevails → registrable = the base
            ("platform.sh", "platform.sh"),
            ("foo.platform.sh", None),
            ("bar.foo.platform.sh", "bar.foo.platform.sh"),
            # default rule '*' for unknown TLDs
            ("example.unknown", "example.unknown"),
            ("a.example.unknown", "example.unknown"),
            ("unknown", None),
            # IPv4 passes through whole (engine convention)
            ("192.168.0.1", "192.168.0.1"),
            (None, None),
        ],
    )
    def test_checkpublicsuffix_vectors(self, spark, psl, host, domain):
        (row,) = (
            spark.createDataFrame([(host,)], "host string")
            .select(psl.registrable_domain("host").alias("d"))
            .collect()
        )
        assert row["d"] == domain, f"{host!r}: {row['d']!r} != {domain!r}"

    def test_with_domain_psl_and_host_col(self, spark, psl):
        df = spark.createDataFrame(
            [("http://a.bar.foo.ck/x", "keepme")], "url string, host string"
        )
        out = with_domain(df, psl=psl, host_col="url_host")
        (row,) = out.collect()
        # pre-existing 'host' column is NOT clobbered (ADVICE r8)
        assert row["host"] == "keepme"
        assert row["url_host"] == "a.bar.foo.ck"
        assert row["domain"] == "bar.foo.ck"

    def test_plan_is_pure_expression(self, spark, psl):
        df = spark.range(1).select(
            F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".co.uk"))
            .alias("host")
        )
        plan = df.select(psl.registrable_domain("host"))._jdf\
            .queryExecution().executedPlan().toString()
        # no join, no exchange, no python — one codegen'd project
        # (the `*(1)` prefix is executedPlan's whole-stage-codegen mark)
        assert "Exchange" not in plan and "Join" not in plan
        assert "EvalPython" not in plan and plan.startswith("*(1) Project")

    def test_from_file(self, tmp_path, spark):
        p = tmp_path / "psl.dat"
        p.write_text(self.PSL_TEXT, encoding="utf-8")
        psl = PublicSuffixList.from_file(str(p))
        (row,) = (
            spark.createDataFrame([("x.example.co.uk",)], "host string")
            .select(psl.registrable_domain("host").alias("d"))
            .collect()
        )
        assert row["d"] == "example.co.uk"


class TestTrailingDot:
    def test_fqdn_trailing_dot_stripped(self, spark):
        (row,) = (
            spark.createDataFrame(
                [("http://news.Example.com./a",)], "url string"
            )
            .select(url_host("url").alias("h"),
                    registrable_domain(url_host("url")).alias("d"))
            .collect()
        )
        assert row["h"] == "news.example.com"
        assert row["d"] == "example.com"

    def test_blocklist_matches_fqdn_form(self, spark):
        df = spark.createDataFrame(
            [("http://ads.tracker.com./x",), ("http://ok.org/y",)],
            "url string",
        )
        kept = filter_domains(df, ["tracker.com"], "url")
        assert [r["url"] for r in kept.collect()] == ["http://ok.org/y"]


class TestDomainStats:
    def test_duckdb_value_twin(self, spark, url_docs):
        got = {
            r["domain"]: r
            for r in domain_stats(url_docs, "url", text_col="text").collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        suffix_list = ",".join(
            f"'{s}'" for s in ("co.uk",)
        )  # only co.uk appears in the synthesized hosts
        want = con.execute(f"""
            WITH u AS (
              SELECT *, {_URL_CASE_SQL} AS url FROM documents
            ), h AS (
              SELECT *, lower(regexp_extract(url, '^[a-z]+://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host
              FROM u
            ), p AS (
              SELECT *, string_split(host, '.') AS parts FROM h
            ), r AS (
              SELECT *, CASE
                WHEN regexp_matches(host, '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
                     OR len(parts) <= 2 THEN host
                WHEN array_to_string(parts[-2:], '.') IN ({suffix_list})
                  THEN array_to_string(parts[-3:], '.')
                ELSE array_to_string(parts[-2:], '.')
              END AS domain FROM p
            )
            SELECT domain, count(*) AS n_docs, count(DISTINCT host) AS n_hosts,
                   sum(length(text)) AS total_chars,
                   round(avg(length(text)), 6) AS avg_chars
            FROM r GROUP BY domain
        """).fetchall()
        assert len(want) == len(got) > 3
        for domain, n_docs, n_hosts, total_chars, avg_chars in want:
            g = got[domain]
            assert (g["n_docs"], g["n_hosts"], g["total_chars"]) == (
                n_docs, n_hosts, total_chars), domain
            assert abs(g["avg_chars"] - avg_chars) < 1e-9

    def test_shuffle_shape_and_column_pruning(self, url_docs):
        plan = domain_stats(url_docs, "url")._jdf.queryExecution(
        ).executedPlan().toString()
        # exact COUNT(DISTINCT host) is the canonical two-exchange agg:
        # (domain, host) dedup phase then domain final — nothing more
        assert plan.count("Exchange hashpartitioning") == 2
        assert "partial" in plan.lower()
        # column pruning reached the scan: only url inputs are read
        assert "ReadSchema: struct<doc_id:bigint,source:string>" in plan


class TestFilterDomains:
    def test_block_drops_all_subdomains(self, spark, url_docs):
        n_all = url_docs.count()
        # block every synthesized .co.uk registrable domain
        blocked = [
            r["domain"]
            for r in with_domain(url_docs).select("domain").distinct().collect()
            if r["domain"].endswith(".co.uk")
        ]
        kept = filter_domains(url_docs, blocked, "url")
        assert kept.count() == n_all - url_docs.filter(
            F.col("url").contains(".co.uk")).count()
        assert kept.filter(F.col("url").contains(".co.uk")).count() == 0
        assert kept.columns == url_docs.columns  # passthrough schema

    def test_allow_keeps_only_listed(self, spark, url_docs):
        doms = with_domain(url_docs).select("domain").distinct().collect()
        one = sorted(r["domain"] for r in doms)[0]
        kept = filter_domains(url_docs, [one], "url", mode="allow")
        assert kept.count() > 0
        got = {r["domain"] for r in with_domain(kept).select("domain").distinct().collect()}
        assert got == {one}

    def test_broadcast_join_shape(self, url_docs):
        plan = filter_domains(url_docs, ["example.com"], "url")._jdf\
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_bad_mode_raises(self, url_docs):
        with pytest.raises(ValueError, match="mode"):
            filter_domains(url_docs, ["x.com"], "url", mode="deny")

class TestPslThreading:
    """Round-10: the PSL is usable from every consumer, not just
    with_domain — domain_stats / filter_domains / the curation recipe
    key on full-PSL eTLD+1 when one is supplied."""

    @pytest.fixture(scope="class")
    def psl(self):
        return PublicSuffixList(TestPublicSuffixList.PSL_TEXT)

    def test_empty_label_hosts_yield_null(self, spark, psl):
        # checkPublicSuffix leading-dot vectors: NULL, not 'example.com'
        df = spark.createDataFrame(
            [(".example.com",), ("example..com",), (".com",), ("ok.com",)],
            "host string",
        )
        got = [
            r["d"]
            for r in df.select(psl.registrable_domain("host").alias("d"))
            .collect()
        ]
        assert got == [None, None, None, "ok.com"]

    def test_psl_plus_extra_suffixes_raises(self, spark, psl):
        df = spark.createDataFrame([("http://a.com/x",)], "url string")
        with pytest.raises(ValueError, match="mutually exclusive"):
            with_domain(df, psl=psl, extra_suffixes=("x.y",))
        with pytest.raises(ValueError, match="mutually exclusive"):
            filter_domains(df, ["a.com"], psl=psl, extra_suffixes=("x.y",))

    def test_filter_domains_psl_wildcard_rule(self, spark, psl):
        # under *.ck the registrable domain of a.bar.foo.ck is
        # bar.foo.ck; the built-in approximation would compute foo.ck,
        # so this block ONLY works when the PSL is actually threaded
        df = spark.createDataFrame(
            [
                ("http://a.bar.foo.ck/1",),
                ("http://bar.foo.ck/2",),
                ("http://other.baz.ck/3",),
                ("http://keep.example.com/4",),
            ],
            "url string",
        )
        kept = filter_domains(df, ["bar.foo.ck"], "url", psl=psl)
        urls = sorted(r["url"] for r in kept.collect())
        assert urls == ["http://keep.example.com/4", "http://other.baz.ck/3"]
        # sanity: WITHOUT the psl the same blocklist misses (key=foo.ck)
        assert filter_domains(df, ["bar.foo.ck"], "url").count() == 4

    def test_domain_stats_psl_key(self, spark, psl):
        df = spark.createDataFrame(
            [
                ("http://a.bar.foo.ck/1", "x" * 10),
                ("http://b.bar.foo.ck/2", "x" * 30),
                ("http://www.example.com/3", "x" * 20),
            ],
            "url string, text string",
        )
        rows = {
            r["domain"]: r
            for r in domain_stats(df, "url", text_col="text", psl=psl)
            .collect()
        }
        assert set(rows) == {"bar.foo.ck", "example.com"}
        assert rows["bar.foo.ck"]["n_docs"] == 2
        assert rows["bar.foo.ck"]["n_hosts"] == 2
        assert rows["bar.foo.ck"]["total_chars"] == 40
        assert rows["example.com"]["n_docs"] == 1

    def test_recipe_blocks_psl_registrable_domain(self, spark, psl, tmp_path):
        # e2e: prepare_training_data(url_col=, blocked_domains=, psl=)
        # drops the wildcard-rule domain before any content stage
        from sifts_spark.pipelines.curation import prepare_training_data

        base = (
            "The quick brown fox jumps over the lazy dog and then walks "
            "home through the quiet town while friendly people wave. "
        ) * 4
        rows = [
            (f"d{i}", base + f"unique marker {i}", f"http://h{i}.keep.com/{i}")
            for i in range(8)
        ] + [
            (f"b{i}", base + f"blocked marker {i}", f"http://x{i}.bar.foo.ck/{i}")
            for i in range(4)
        ]
        docs = spark.createDataFrame(rows, "doc_id string, text string, url string")
        manifest = prepare_training_data(
            docs,
            str(tmp_path / "out"),
            min_quality=0.0,
            url_col="url",
            blocked_domains=["bar.foo.ck"],
            psl=psl,
        )
        assert manifest["stages"]["input"] == 12
        assert manifest["stages"]["domain_filtered"] == 8
        out = spark.read.parquet(str(tmp_path / "out" / "docs"))
        assert out.filter(F.col("id").startswith("b")).count() == 0


# ---------------------------------------------- URL canonicalization


class TestNormalizeUrl:
    @pytest.mark.parametrize(
        "url,want",
        [
            # tracking strip + param sort + fragment drop + case fold
            ("https://Ex.COM/p?b=2&utm_source=x&a=1#frag",
             "https://ex.com/p?a=1&b=2"),
            # default ports drop, non-default kept
            ("http://ex.com:80/", "http://ex.com/"),
            ("https://ex.com:443/a", "https://ex.com/a"),
            ("http://ex.com:8080/", "http://ex.com:8080/"),
            # empty path -> /
            ("http://ex.com", "http://ex.com/"),
            # userinfo dropped
            ("http://u:p@ex.com/x", "http://ex.com/x"),
            # query emptied of tracking params drops its '?'
            ("http://ex.com/?utm_source=a&UTM_CAMPAIGN=b", "http://ex.com/"),
            # valueless params sort with the rest
            ("http://ex.com/?flag&b=1", "http://ex.com/?b=1&flag"),
            # trailing FQDN dot
            ("http://ex.com./x", "http://ex.com/x"),
            # path case is significant and preserved
            ("HTTP://EX.com/Path", "http://ex.com/Path"),
            # unparseable / hostless -> NULL
            ("not a url", None),
            ("mailto:a@b.com", None),
        ],
    )
    def test_corner_cases(self, spark, url, want):
        (row,) = (
            spark.createDataFrame([(url,)], "url string")
            .select(normalize_url("url").alias("n"))
            .collect()
        )
        assert row["n"] == want

    def test_strip_www_keeps_two_label_minimum(self, spark):
        rows = (
            spark.createDataFrame(
                [("http://www.ex.com/",), ("http://www.com/",)],
                "url string",
            )
            .select(normalize_url("url", strip_www=True).alias("n"))
            .collect()
        )
        assert [r["n"] for r in rows] == [
            "http://ex.com/",  # www. stripped, 2 labels remain
            "http://www.com/",  # remainder 'com' has no dot: kept
        ]

    def test_duckdb_value_twin(self, spark, url_docs_messy):
        df, case_sql = url_docs_messy
        got = {
            r["doc_id"]: r["n"]
            for r in df.select(
                "doc_id", normalize_url("url").alias("n")
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = con.execute(
            f"SELECT doc_id, {normalize_url_sql('url')} AS n "
            f"FROM (SELECT *, {case_sql} AS url FROM documents)"
        ).fetchall()
        assert len(want) == len(got) > 50
        for doc_id, n in want:
            assert got[doc_id] == n, doc_id


class TestUrlDedup:
    def test_spelling_variants_collapse(self, spark):
        rows = [
            ("a", "https://ex.com:443/p?b=2&a=1&utm_source=x#f"),
            ("b", "https://EX.com/p?a=1&b=2"),
            ("c", "https://ex.com./p?a=1&utm_medium=y&b=2"),
            ("d", "https://ex.com/p?a=1&b=3"),  # different resource
            ("e", "junk"),  # unparseable: never merged
            ("f", "junk"),
        ]
        df = spark.createDataFrame(rows, "doc_id string, url string")
        got = {
            r["id"]: r["canonical_id"]
            for r in url_duplicates(df).collect()
        }
        assert got == {
            "a": "a", "b": "a", "c": "a", "d": "d", "e": "e", "f": "f"
        }
        kept = sorted(
            r["doc_id"] for r in dedup_by_url(df).collect()
        )
        assert kept == ["a", "d", "e", "f"]

    def test_single_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [("a", "http://ex.com/")], "doc_id string, url string"
        )
        plan = url_duplicates(df)._jdf.queryExecution(
        ).executedPlan().toString()
        # canonicalization is map-side; the only exchange is the
        # window's hash partitioning on the canonical key
        assert plan.count("Exchange hashpartitioning") == 1

    def test_recipe_url_dedup_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        texts = [
            "the quick brown fox jumps over the lazy dog near the barn",
            "a completely different tale about ships sailing the sea",
            "engineers measure the bridge span with careful instruments",
            "the market sells fresh bread and fruit every single morning",
            "mountain trails wind upward through pine forest and stone",
            "the library keeps old maps of rivers and forgotten towns",
        ]
        rows = [
            (f"d{i}", t + f" unique marker {i}", f"http://h{i}.keep.com/{i}")
            for i, t in enumerate(texts)
        ] + [
            # refetches of d0's resource under tracking-param spellings
            ("r1", texts[0] + " refetch one",
             "http://h0.keep.com/0?utm_source=feed"),
            ("r2", texts[0] + " refetch two",
             "http://h0.keep.com:80/0#frag"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id string, text string, url string"
        )
        manifest = prepare_training_data(
            docs,
            str(tmp_path / "out"),
            min_quality=0.0,
            url_col="url",
            url_dedup=True,
        )
        assert manifest["stages"]["input"] == 8
        assert manifest["stages"]["url_deduped"] == 6
        out = spark.read.parquet(str(tmp_path / "out" / "docs"))
        assert sorted(
            r["id"] for r in out.select("id").collect()
        ) == [f"d{i}" for i in range(6)]

    def test_url_dedup_requires_url_col(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        docs = spark.createDataFrame(
            [("a", "text")], "doc_id string, text string"
        )
        with pytest.raises(ValueError, match="url_dedup requires url_col"):
            prepare_training_data(
                docs, str(tmp_path / "out"), url_dedup=True
            )


# ---------------------------------------------------- per-domain caps


class TestCapDomains:
    def _docs(self, spark):
        # 12 docs on big.com (via subdomains), 2 on small.org, 2 junk
        rows = (
            [(f"b{i}", f"http://sub{i % 3}.big.com/p/{i}") for i in range(12)]
            + [("s0", "http://small.org/a"), ("s1", "http://small.org/b")]
            + [("j0", "junk"), ("j1", "also junk")]
        )
        return spark.createDataFrame(rows, "doc_id string, url string")

    def test_exact_cap_and_determinism(self, spark):
        df = self._docs(spark)
        out1 = sorted(r["doc_id"] for r in cap_domains(df, max_docs=4).collect())
        out2 = sorted(r["doc_id"] for r in cap_domains(df, max_docs=4).collect())
        assert out1 == out2  # hash-order sample is rerun-stable
        kept_big = [i for i in out1 if i.startswith("b")]
        assert len(kept_big) == 4
        # under-cap domains and unparseable URLs survive whole
        assert {"s0", "s1", "j0", "j1"} <= set(out1)

    def test_hash_cap_no_window_in_plan(self, spark):
        df = self._docs(spark)
        capped = cap_domains(df, max_docs=4, method="hash")
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # the skew-proof path has no sort
        got = {r["doc_id"] for r in capped.collect()}
        # under-cap domains + junk always complete; big.com thinned
        assert {"s0", "s1", "j0", "j1"} <= got
        n_big = sum(1 for i in got if i.startswith("b"))
        assert 0 < n_big < 12  # binomial around 4 — bounded strictly

    def test_exact_duckdb_twin(self, spark, url_docs):
        import duckdb

        got = sorted(
            r["doc_id"]
            for r in cap_domains(url_docs, max_docs=2).select("doc_id").collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = sorted(
            t[0]
            for t in con.execute(f"""
            WITH u AS (SELECT *, {_URL_CASE_SQL} AS url FROM documents),
            h AS (SELECT *, lower(regexp_extract(url,
                '^[a-z]+://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host FROM u),
            p AS (SELECT *, string_split(host, '.') AS parts FROM h),
            r AS (SELECT *, CASE
              WHEN regexp_matches(host,
                   '^\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}$')
                   OR len(parts) <= 2 THEN host
              WHEN array_to_string(parts[-2:], '.') IN ('co.uk')
                THEN array_to_string(parts[-3:], '.')
              ELSE array_to_string(parts[-2:], '.') END AS domain FROM p),
            k AS (SELECT doc_id, domain, row_number() OVER (
                    PARTITION BY domain
                    ORDER BY md5(domain || chr(0) || CAST(doc_id AS VARCHAR))
                  ) AS rn FROM r)
            SELECT doc_id FROM k WHERE domain IS NULL OR rn <= 2
            """).fetchall()
        )
        assert got == want and 0 < len(got) < url_docs.count()

    def test_recipe_domain_cap_stage(self, spark, tmp_path):
        from sifts_spark.pipelines.curation import prepare_training_data

        texts = [
            "the quick brown fox jumps over the lazy dog near the barn",
            "a completely different tale about ships sailing the sea",
            "engineers measure the bridge span with careful instruments",
            "the market sells fresh bread and fruit every single morning",
            "mountain trails wind upward through pine forest and stone",
            "the library keeps old maps of rivers and forgotten towns",
        ]
        rows = [
            (f"d{i}", t + f" unique marker {i}",
             f"http://sub{i}.farm.com/{i}")
            for i, t in enumerate(texts)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id string, text string, url string"
        )
        manifest = prepare_training_data(
            docs, str(tmp_path / "out"), min_quality=0.0,
            url_col="url", max_docs_per_domain=2,
        )
        assert manifest["stages"]["input"] == 6
        assert manifest["stages"]["domain_capped"] == 2


def test_normalize_url_idempotent_on_messy_corpus(spark, url_docs_messy):
    """normalize_url is a canonicalization: applying it twice must be
    the identity on its own output (param sort stable, stripped keys
    stay stripped, dropped ports stay dropped)."""
    df, _ = url_docs_messy
    once = df.select(normalize_url("url").alias("u1"))
    twice = once.select(
        "u1", normalize_url(F.col("u1")).alias("u2")
    ).filter(F.col("u1").isNotNull())
    bad = twice.filter(
        F.col("u2").isNull() | (F.col("u1") != F.col("u2"))
    ).count()
    assert bad == 0 and twice.count() > 50
