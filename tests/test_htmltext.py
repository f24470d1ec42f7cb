"""HTML main-text extraction — operators/htmltext.py.

Covers: block segmentation + boilerplate classification (chrome
containers, link density, short blocks, heading promotion), entity
decoding, script/style stripping, charset sniffing (HTTP param beats
meta, meta beats default, bogus charset falls back), malformed-markup
tolerance, the distributed kernel over string and binary columns, and
the WARC→docs e2e (`read_warc_html`) including the no-exchange fusion
of the two map stages.
"""

from __future__ import annotations

import gzip
import json

from sifts_spark.operators.htmltext import (
    decode_html_bytes,
    extract_main_text,
    extract_page,
    read_warc_html,
)

ARTICLE = """
<html><head>
  <title>The  Example&nbsp;Title</title>
  <style>body { color: red }</style>
  <script>var x = "<p>not text</p>";</script>
</head><body>
  <nav><a href="/">Home</a> <a href="/about">About</a> <a href="/faq">FAQ</a></nav>
  <div class="sidebar">
    <ul>
      <li><a href="/1">Related link one</a></li>
      <li><a href="/2">Related link two</a></li>
    </ul>
  </div>
  <article>
    <h2>Section heading</h2>
    <p>This is the first real paragraph of the article, long enough to
       pass the minimum block length and containing <b>inline</b>
       markup plus an entity: caf&eacute;.</p>
    <p>The second paragraph also carries enough prose to count as
       content, with <a href="/ref">one small link</a> inside a lot of
       surrounding text so the link density stays low.</p>
  </article>
  <footer>Copyright 2026 Example Corp. All rights reserved. Terms.
    Privacy. Contact us at the address below for more information.</footer>
</body></html>
"""


class TestExtractPage:
    def test_main_text_keeps_article_drops_chrome(self):
        d = extract_page(ARTICLE)
        assert "first real paragraph" in d["main_text"]
        assert "second paragraph" in d["main_text"]
        # nav / sidebar link farm / footer are boilerplate
        assert "Home" not in d["main_text"]
        assert "Related link" not in d["main_text"]
        assert "Copyright" not in d["main_text"]  # chrome even though long
        assert d["n_blocks"] > d["n_content_blocks"] >= 2

    def test_heading_promotion(self):
        d = extract_page(ARTICLE)
        # "Section heading" is short but precedes a content paragraph
        assert d["main_text"].startswith("Section heading")

    def test_heading_not_promoted_without_following_content(self):
        page = "<h2>Lonely heading</h2><nav><a href='/'>x</a></nav>"
        assert extract_page(page)["main_text"] == ""

    def test_entities_and_inline_tags_merge_into_one_block(self):
        d = extract_page(ARTICLE)
        assert "inline markup plus an entity: café." in d["main_text"]

    def test_title_normalized(self):
        # double space and &nbsp; both collapse to single spaces
        assert extract_page(ARTICLE)["title"] == "The Example Title"

    def test_script_style_never_leak(self):
        d = extract_page(ARTICLE)
        assert "not text" not in d["main_text"]
        assert "color: red" not in d["main_text"]

    def test_link_farm_dropped_by_density(self):
        page = (
            "<div><a href='/a'>Alpha product page</a> — "
            "<a href='/b'>Beta product page</a> — "
            "<a href='/c'>Gamma product page</a> and more links here</div>"
        )
        assert extract_page(page)["main_text"] == ""

    def test_long_low_density_div_kept(self):
        page = (
            "<div>A perfectly ordinary paragraph of body prose that easily "
            "clears the forty character minimum and has no links.</div>"
        )
        d = extract_page(page)
        assert d["main_text"].startswith("A perfectly ordinary")

    def test_malformed_markup_is_tolerated(self):
        page = "<p>Unclosed paragraph with <b>bold text that runs long enough to be kept as content"
        d = extract_page(page)
        assert "Unclosed paragraph" in d["main_text"]

    def test_keep_chrome_flag(self):
        d = extract_page(ARTICLE, keep_chrome=True)
        assert "Copyright" in d["main_text"]

    PROSE = ("Recoverable article prose that is comfortably past the "
             "forty character block minimum.")

    def test_unclosed_svg_bounded_at_body_end(self):
        # html.parser never auto-closes <svg>; without the boundary
        # clear, everything after it would be silently dropped
        page = (
            "<html><body><svg><circle r='1'/>"
            f"</body></html><p>{self.PROSE}</p>"
        )
        d = extract_page(page)
        assert "Recoverable article prose" in d["main_text"]

    def test_unclosed_select_implicitly_closed_by_block_tag(self):
        page = (
            "<div><select><option>one</option><option>two</option>"
            f"<p>{self.PROSE}</p></div>"
        )
        d = extract_page(page)
        assert "Recoverable article prose" in d["main_text"]
        assert "one" not in d["main_text"]  # option text stays dropped

    def test_mismatched_skip_close_pops_through(self):
        # </svg> closes the inner unclosed <iframe> too
        page = (
            f"<svg><iframe>junk inside</svg><p>{self.PROSE}</p>"
        )
        d = extract_page(page)
        assert "Recoverable article prose" in d["main_text"]
        assert "junk inside" not in d["main_text"]


class TestCharset:
    def test_http_param_wins_over_meta(self):
        # bytes are latin-1 "café"; meta lies (utf-8), HTTP header is right
        body = (
            b'<html><head><meta charset="utf-8"></head>'
            b"<body><p>caf\xe9 et croissants pour tout le monde ce matin</p></body></html>"
        )
        s = decode_html_bytes(body, "text/html; charset=iso-8859-1")
        assert "café" in s

    def test_meta_charset_used_without_header(self):
        body = (
            b'<html><head><meta charset="iso-8859-1"></head>'
            b"<body><p>caf\xe9 et croissants pour tout le monde ce matin</p></body></html>"
        )
        assert "café" in decode_html_bytes(body)

    def test_bogus_charset_falls_back_utf8(self):
        body = '<p>plain ascii prose that is long enough</p>'.encode()
        s = decode_html_bytes(body, "text/html; charset=no-such-encoding")
        assert "plain ascii prose" in s

    def test_default_utf8_with_replacement(self):
        s = decode_html_bytes(b"<p>ok \xff\xfe bytes</p>")
        assert "ok" in s


class TestDistributed:
    def test_extract_main_text_string_column(self, spark):
        df = spark.createDataFrame(
            [("a", ARTICLE), ("b", "<p>too short</p>")], ["id", "html"]
        )
        out = {r["id"]: r for r in extract_main_text(df).collect()}
        assert "first real paragraph" in out["a"]["main_text"]
        assert out["a"]["title"] == "The Example Title"
        assert out["b"]["main_text"] == ""
        assert out["b"]["n_blocks"] == 1 and out["b"]["n_content_blocks"] == 0

    def test_extract_main_text_binary_column_sniffs_charset(self, spark):
        body = (
            b'<html><head><meta charset="iso-8859-1"></head><body>'
            b"<p>caf\xe9 au lait is a perfectly content-worthy sentence "
            b"when it is long enough to keep</p></body></html>"
        )
        df = spark.createDataFrame([("x", bytearray(body))], "id string, html binary")
        (row,) = extract_main_text(df).collect()
        assert "café au lait" in row["main_text"]

    def test_keep_errors_surfaces_err_column(self, spark):
        df = spark.createDataFrame([("a", ARTICLE)], ["id", "html"])
        out = extract_main_text(df, keep_errors=True)
        assert "_err" in out.columns
        (row,) = out.collect()
        assert row["_err"] is None and row["title"] == "The Example Title"
        # default path drops the column (back-compat)
        assert "_err" not in extract_main_text(df).columns


def _http_html_record(rid: str, uri: str, html: bytes,
                      ctype: bytes = b"text/html; charset=utf-8") -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + html
    )
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: {rid}\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: 2026-08-14T00:00:00Z\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


class TestReadWarcHtml:
    def test_e2e_docs_frame(self, spark, tmp_path):
        png = b"\x89PNG\r\n\x1a\nnotreallyapng"
        img_http = b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n" + png
        img = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:img>\r\n"
            f"Content-Length: {len(img_http)}\r\n\r\n"
        ).encode() + img_http + b"\r\n\r\n"
        shard = (
            _http_html_record("<urn:a>", "http://a.example/", ARTICLE.encode())
            + img
            + _http_html_record(
                "<urn:b>", "http://b.example/",
                b"<html><body><nav><a href='/'>only chrome</a></nav></body></html>",
            )
        )
        (tmp_path / "shard.warc.gz").write_bytes(gzip.compress(shard))
        good, quar = read_warc_html(spark, str(tmp_path))
        rows = {r["id"]: r for r in good.collect()}
        # image skipped by mime filter, chrome-only page dropped as empty
        assert set(rows) == {"<urn:a>"}
        assert "first real paragraph" in rows["<urn:a>"]["content"]
        meta = json.loads(rows["<urn:a>"]["metadata"])
        assert meta["uri"] == "http://a.example/"
        assert meta["title"] == "The Example Title"
        assert quar.count() == 0

    def test_framing_fault_quarantines(self, spark, tmp_path):
        shard = (
            _http_html_record("<urn:ok>", "http://ok.example/", ARTICLE.encode())
            + b"garbage that is not a record\r\n\r\n"
            + _http_html_record("<urn:ok2>", "http://ok2.example/", ARTICLE.encode())
        )
        (tmp_path / "shard.warc").write_bytes(shard)
        good, quar = read_warc_html(spark, str(tmp_path))
        assert {r["id"] for r in good.collect()} == {"<urn:ok>", "<urn:ok2>"}
        assert quar.count() == 1

    def test_http_header_only_charset_reaches_decoder(self, spark, tmp_path):
        # charset declared ONLY in the HTTP Content-Type header — no
        # <meta> — the legacy-site shape the r8 pipeline mis-decoded
        # because read_warc_responses stripped header parameters
        body = (
            b"<html><body><p>caf\xe9 et croissants pour tout le monde "
            b"ce matin, une phrase assez longue pour rester</p></body></html>"
        )
        (tmp_path / "s.warc").write_bytes(
            _http_html_record(
                "<urn:l1>", "http://legacy.example/",
                body, ctype=b"text/html; charset=iso-8859-1",
            )
        )
        good, quar = read_warc_html(spark, str(tmp_path))
        (row,) = good.collect()
        assert "café et croissants" in row["content"]
        # the content_type plumbing stays out of the docs metadata
        assert set(json.loads(row["metadata"])) == {
            "uri", "date", "source", "title"
        }
        assert quar.count() == 0

    def test_no_exchange_between_map_stages(self, spark, tmp_path):
        (tmp_path / "s.warc").write_bytes(
            _http_html_record("<urn:a>", "http://a/", ARTICLE.encode())
        )
        good, _ = read_warc_html(spark, str(tmp_path))
        plan = good._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # WARC parse + HTML extract fuse
