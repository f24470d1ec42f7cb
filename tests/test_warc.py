"""WARC/WET ingestion — sources/warc.py.

Shards are synthesized with the stdlib (the format is bytes + gzip, no
codec library involved), covering: plain and gzip (member-per-record)
framing, warcinfo skipping, the best-effort-prefix quarantine contract
on truncated shards, HTTP body extraction + mime classification for
response records, and the e2e hop into the collection / pHash paths.
"""

from __future__ import annotations

import gzip
import json

import pytest

from sifts_spark.sources.warc import read_warc_responses, read_wet


def _record(warc_type: str, body: bytes, uri: str | None = None,
            rid: str | None = None, extra: dict | None = None) -> bytes:
    headers = [f"WARC-Type: {warc_type}",
               f"Content-Length: {len(body)}"]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    if rid:
        headers.append(f"WARC-Record-ID: {rid}")
    headers.append("WARC-Date: 2026-08-14T00:00:00Z")
    for k, v in (extra or {}).items():
        headers.append(f"{k}: {v}")
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
    return head.encode() + body + b"\r\n\r\n"


def _wet_shard() -> bytes:
    info = _record("warcinfo", b"software: test\r\n")
    a = _record("conversion", "first doc text here".encode(),
                uri="http://a.example/x", rid="<urn:uuid:aaa>")
    b = _record("conversion", "second doc é unicode".encode("utf-8"),
                uri="http://b.example/y", rid="<urn:uuid:bbb>")
    empty = _record("conversion", b"", uri="http://c.example/empty")
    return info + a + b + empty


def test_read_wet_plain_and_gzip(spark, tmp_path):
    plain_dir = tmp_path / "plain"
    plain_dir.mkdir()
    (plain_dir / "shard0.warc.wet").write_bytes(_wet_shard())
    gz_dir = tmp_path / "gz"
    gz_dir.mkdir()
    # Common Crawl convention: one gzip MEMBER per record, concatenated
    members = b"".join(
        gzip.compress(chunk)
        for chunk in (
            _record("warcinfo", b"software: test\r\n"),
            _record("conversion", b"gz doc one", uri="http://g.example/1",
                    rid="<urn:uuid:g1>"),
            _record("conversion", b"gz doc two", uri="http://g.example/2",
                    rid="<urn:uuid:g2>"),
        )
    )
    (gz_dir / "shard0.warc.wet.gz").write_bytes(members)

    for path, want_ids in (
        (str(plain_dir), {"<urn:uuid:aaa>", "<urn:uuid:bbb>"}),
        (str(gz_dir), {"<urn:uuid:g1>", "<urn:uuid:g2>"}),
    ):
        good, quar = read_wet(spark, path)
        rows = {r["id"]: r for r in good.collect()}
        assert set(rows) == want_ids  # warcinfo + empty skipped
        assert quar.count() == 0
        meta = json.loads(next(iter(rows.values()))["metadata"])
        assert meta["uri"].startswith("http") and meta["source"]


def test_read_wet_truncated_shard_quarantines_not_kills(spark, tmp_path):
    """Best-effort prefix: records before the break are KEPT, the shard
    lands ONE quarantine row, the job never dies."""
    ok = _record("conversion", b"good record", rid="<urn:uuid:ok>")
    broken = b"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 99999\r\n\r\nshort"
    (tmp_path / "bad.warc.wet").write_bytes(ok + broken)
    good, quar = read_wet(spark, str(tmp_path))
    assert {r["id"] for r in good.collect()} == {"<urn:uuid:ok>"}
    q = quar.collect()
    assert len(q) == 1 and "truncated" in q[0]["error"]


def test_read_wet_non_warc_bytes_quarantined(spark, tmp_path):
    (tmp_path / "junk.wet").write_bytes(b"this is not a warc file at all")
    good, quar = read_wet(spark, str(tmp_path))
    assert good.count() == 0
    assert "WARC/1.x version line" in quar.collect()[0]["error"]


def test_read_wet_resyncs_past_corrupt_record(spark, tmp_path):
    """One corrupt record BETWEEN two good ones costs one quarantine
    row — the scanner resyncs at the next record boundary and the
    trailing good record is KEPT (the docstring's per-record
    contract)."""
    a = _record("conversion", b"good before", rid="<urn:uuid:r-a>")
    # Content-Length LIES (3 < actual 5): the scanner lands mid-body,
    # sees no version line, and must resync at the next boundary
    corrupt = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"Content-Length: 3\r\n\r\nhello\r\n\r\n")
    b = _record("conversion", b"good after", rid="<urn:uuid:r-b>")
    (tmp_path / "mid.warc.wet").write_bytes(a + corrupt + b)
    good, quar = read_wet(spark, str(tmp_path))
    ids = {r["id"] for r in good.collect()}
    # both neighbors survive (the lying record itself yields a short
    # body row — the fault is only detectable at the NEXT scan position)
    assert {"<urn:uuid:r-a>", "<urn:uuid:r-b>"} <= ids
    q = quar.collect()
    assert len(q) == 1 and "version line" in q[0]["error"]


def test_read_wet_bad_content_length_resyncs(spark, tmp_path):
    """Missing Content-Length mid-shard: one quarantine row, both
    neighbors survive."""
    a = _record("conversion", b"before", rid="<urn:uuid:cl-a>")
    no_len = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody-with-no-length"
    b = _record("conversion", b"after", rid="<urn:uuid:cl-b>")
    (tmp_path / "cl.warc.wet").write_bytes(a + no_len + b"\r\n\r\n" + b)
    good, quar = read_wet(spark, str(tmp_path))
    assert {r["id"] for r in good.collect()} == {"<urn:uuid:cl-a>",
                                                 "<urn:uuid:cl-b>"}
    q = quar.collect()
    assert len(q) == 1 and "Content-Length" in q[0]["error"]


def test_read_wet_oversized_record_skipped_unbuffered(spark, tmp_path):
    """A record whose Content-Length exceeds the cap is quarantined and
    its body skipped; the following record still parses (memory guard
    for adversarial/miscut shards)."""
    big = _record("conversion", b"x" * 4096, rid="<urn:uuid:big>")
    ok = _record("conversion", b"small survivor", rid="<urn:uuid:sm>")
    (tmp_path / "big.warc.wet").write_bytes(big + ok)
    good, quar = read_wet(spark, str(tmp_path), max_record_bytes=1024)
    assert {r["id"] for r in good.collect()} == {"<urn:uuid:sm>"}
    q = quar.collect()
    assert len(q) == 1 and "oversized record" in q[0]["error"]


def test_inflate_streams_chunks_not_whole_shard():
    """The gzip path yields bounded chunks (zlib.decompressobj), never
    one whole-shard bytes object — the 100 TB memory posture."""
    from sifts_spark.sources.warc import _iter_inflated_chunks

    member = gzip.compress(b"a" * (3 << 20))
    blob = member + gzip.compress(b"b" * (2 << 20))  # multi-member
    chunks = list(_iter_inflated_chunks(blob, chunk_size=1 << 20))
    assert all(len(c) <= 1 << 20 for c in chunks)
    assert len(chunks) >= 5
    assert b"".join(chunks) == b"a" * (3 << 20) + b"b" * (2 << 20)

    with pytest.raises(ValueError, match="truncated"):
        list(_iter_inflated_chunks(member[:-8]))
    with pytest.raises(ValueError, match="bad gzip"):
        list(_iter_inflated_chunks(member[:10] + b"garbage" * 4))


def _http_response(mime: str, body: bytes) -> bytes:
    head = (f"HTTP/1.1 200 OK\r\nContent-Type: {mime}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode()
    return head + body


def test_read_warc_responses_media_frame(spark, tmp_path):
    img = _http_response("image/png", b"\x89PNG-fake-image-bytes")
    html = _http_response("text/html; charset=utf-8", b"<html>hi</html>")
    aud = _http_response("audio/wav", b"RIFF-fake")
    shard = (
        _record("warcinfo", b"x\r\n")
        + _record("response", img, uri="http://m.example/i.png",
                  rid="<urn:uuid:img>")
        + _record("response", html, uri="http://m.example/p.html",
                  rid="<urn:uuid:html>")
        + _record("response", aud, uri="http://m.example/a.wav",
                  rid="<urn:uuid:aud>")
        + _record("request", b"GET / HTTP/1.1\r\n\r\n")  # skipped
    )
    (tmp_path / "s.warc").write_bytes(shard)
    good, quar = read_warc_responses(spark, str(tmp_path))
    rows = {r["media_id"]: r for r in good.collect()}
    assert set(rows) == {"<urn:uuid:img>", "<urn:uuid:html>", "<urn:uuid:aud>"}
    assert quar.count() == 0
    assert rows["<urn:uuid:img>"]["kind"] == "image"
    assert rows["<urn:uuid:img>"]["mime"] == "image/png"
    # HTTP envelope stripped: payload is exactly the body bytes
    assert bytes(rows["<urn:uuid:img>"]["payload"]) == b"\x89PNG-fake-image-bytes"
    assert rows["<urn:uuid:html>"]["kind"] == "text"
    assert rows["<urn:uuid:aud>"]["kind"] == "audio"
    assert rows["<urn:uuid:img>"]["meta"]["uri"] == "http://m.example/i.png"

    # mime_prefixes filters parse-side
    only_img, _ = read_warc_responses(spark, str(tmp_path),
                                      mime_prefixes=("image/",))
    assert {r["media_id"] for r in only_img.collect()} == {"<urn:uuid:img>"}


def test_wet_to_collection_and_warc_to_phash_e2e(spark, tmp_path, store_root):
    """The two frames plug straight into the engine: WET docs →
    Collection.add_dataframe → FTS query; WARC image responses →
    image_phash_pairs (exact-copy pairing via the fake-free hasher)."""
    from sifts_spark.collection import Collection
    from sifts_spark.operators.multimodal import image_phash_pairs

    (tmp_path / "w.warc.wet").write_bytes(
        _record("conversion", b"spark engines ingest common crawl",
                rid="d1", uri="http://x/1")
        + _record("conversion", b"unrelated text body", rid="d2",
                  uri="http://x/2")
    )
    good, _ = read_wet(spark, str(tmp_path / "w.warc.wet"))
    col = Collection(store_root, "wet", spark=spark)
    col.add_dataframe(good, id_col="id", content_col="content",
                      metadata_col="metadata")
    assert {r["id"] for r in col.query("crawl")["results"]} == {"d1"}

    img = b"identical-fake-image-payload" * 4
    (tmp_path / "m.warc").write_bytes(
        _record("response", _http_response("image/png", img), rid="m1")
        + _record("response", _http_response("image/png", img), rid="m2")
        + _record("response", _http_response("image/png", b"other" * 20),
                  rid="m3")
    )
    media, _ = read_warc_responses(spark, str(tmp_path / "m.warc"),
                                   mime_prefixes=("image/",))
    pairs = image_phash_pairs(media, max_hamming=0).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {("m1", "m2")}
