"""WARC / WET (Common Crawl) ingestion sources.

The reference ingests Python lists (``collection.add``,
/root/reference/src/sifts/core.py:139-187); a real pretraining corpus
starts as Common Crawl WARC/WET shards. These readers turn them into
the same canonical frames the rest of the engine consumes:

* :func:`read_wet` — WET ("extracted text") shards → the canonical
  ``(id, content, metadata)`` docs frame of ``sources/ingest.py``,
  plus a quarantine frame for malformed records (a bad record must
  cost one row, never one 400 MB shard, never the job);
* :func:`read_warc_responses` — raw WARC ``response`` records → the
  multimodal MEDIA frame (``media_id, kind, mime, payload, meta``) of
  ``operators/multimodal.py``, payload = the HTTP body bytes, so
  crawled images/audio flow straight into pHash / feature extraction.

Parsing is stdlib-only (gzip + bytes splitting — the WARC/1.x format,
ISO 28500): no optional deps, engine-portable. Distributed shape: ONE
``binaryFile`` scan (one whole shard per task — WARC's per-record gzip
members do not split mid-record, which is why Common Crawl ships ~1 GB
shards) through an Arrow ``mapInPandas`` parser; nothing touches the
driver. Size ``spark.sql.files.maxPartitionBytes`` is irrelevant here —
binaryFile assigns whole files; parallelism = shard count, exactly how
Common Crawl is meant to be consumed (100 TB ≈ 90k shards ≈ 90k tasks).

Record framing (ISO 28500 §4): ``WARC/1.x`` version line, CRLF header
block, empty line, ``Content-Length`` payload bytes, CRLF CRLF. Gzip
shards are member-per-record; Python's gzip handles concatenated
members in one decompress.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"

_WET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("metadata", T.StringType()),
        T.StructField("_err", T.StringType()),
    ]
)

_MEDIA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_err", T.StringType()),
    ]
)


def _inflate(data: bytes) -> bytes:
    if data[:2] == _GZIP_MAGIC:
        import gzip

        return gzip.decompress(data)  # multi-member: all records
    return data


def _iter_warc_records(data: bytes, source: str):
    """Yield ``(headers: dict[lower-str, str], body: bytes)`` per WARC
    record; raise ValueError with a byte offset on malformed framing so
    the caller can quarantine THIS shard's remainder, not the job."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"{source}: unterminated header block at {pos}")
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"{source}: expected WARC/1.x version line at {pos}, "
                f"got {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{source}: missing/invalid Content-Length at {pos}"
            ) from None
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError(
                f"{source}: truncated record at {pos} "
                f"(wants {length} bytes, {n - body_start} left)"
            )
        yield headers, data[body_start:body_start + length]
        pos = body_start + length


def _binary_files(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )


def read_wet(
    spark: SparkSession, path: str, min_content_chars: int = 1
) -> tuple[DataFrame, DataFrame]:
    """WET shards at ``path`` (glob ok; ``.gz`` or plain) →
    ``(good, quarantined)``.

    ``good`` is the canonical docs frame: ``id`` = WARC-Record-ID
    (falls back to ``<path>#<record index>``), ``content`` = the
    record's extracted text, ``metadata`` = JSON with ``uri``, ``date``
    and ``source`` shard path. ``conversion`` records only —
    ``warcinfo`` prologues are skipped, not quarantined (every WET
    shard starts with one). Records shorter than ``min_content_chars``
    are dropped (Common Crawl WET carries many empty extractions).

    ``quarantined`` rows are ``(id=<path>, content=NULL,
    metadata=<error JSON>)`` — one per shard whose framing broke, with
    the records already parsed before the break KEPT in ``good``
    (best-effort prefix, the PERMISSIVE-reader posture)."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                try:
                    data = _inflate(bytes(blob))
                except Exception as e:
                    rows.append((src, None, None, f"bad gzip: {e}"))
                    continue
                idx = 0
                try:
                    for headers, body in _iter_warc_records(data, src):
                        idx += 1
                        if headers.get("warc-type") != "conversion":
                            continue
                        text = body.decode("utf-8", "replace")
                        if len(text) < min_content_chars:
                            continue
                        rid = headers.get("warc-record-id") or f"{src}#{idx}"
                        meta = {
                            "uri": headers.get("warc-target-uri"),
                            "date": headers.get("warc-date"),
                            "source": src,
                        }
                        rows.append((rid, text, json.dumps(meta), None))
                except ValueError as e:
                    rows.append((src, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=["id", "content", "metadata", "_err"]
            )

    parsed = _binary_files(spark, path).mapInPandas(parse, _WET_SCHEMA)
    good = parsed.filter(F.col("_err").isNull()).select(
        "id", "content", "metadata"
    )
    quarantined = parsed.filter(F.col("_err").isNotNull()).select(
        F.col("id").alias("source"), F.col("_err").alias("error")
    )
    return good, quarantined


def read_warc_responses(
    spark: SparkSession, path: str, mime_prefixes: tuple = ()
) -> tuple[DataFrame, DataFrame]:
    """Raw WARC shards → the multimodal MEDIA frame: one row per
    ``response`` record, ``payload`` = the HTTP response BODY bytes
    (status line + headers stripped), ``mime`` from the HTTP
    Content-Type, ``kind`` coarse-classified from it (image/audio/
    video/text/other). ``mime_prefixes`` (e.g. ``("image/",)``) filters
    records PARSE-side, so a 1 GB HTML-dominated shard costs Arrow
    transfer only for the media types the pipeline wants.

    Feed the ``good`` frame straight to
    :func:`~sifts_spark.operators.multimodal.extract_image_features` /
    :func:`~sifts_spark.operators.multimodal.image_phash_pairs`."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                try:
                    data = _inflate(bytes(blob))
                except Exception as e:
                    rows.append((src, None, None, None, None, f"bad gzip: {e}"))
                    continue
                idx = 0
                try:
                    for headers, body in _iter_warc_records(data, src):
                        idx += 1
                        if headers.get("warc-type") != "response":
                            continue
                        # HTTP message: status line + headers, CRLF CRLF, body
                        sep = body.find(b"\r\n\r\n")
                        http_head = body[:sep].decode("utf-8", "replace") if sep >= 0 else ""
                        payload = body[sep + 4:] if sep >= 0 else body
                        mime = "application/octet-stream"
                        for line in http_head.split("\r\n")[1:]:
                            k, _, v = line.partition(":")
                            if k.strip().lower() == "content-type":
                                mime = v.strip().split(";")[0].strip() or mime
                                break
                        if mime_prefixes and not any(
                            mime.startswith(p) for p in mime_prefixes
                        ):
                            continue
                        kind = next(
                            (k for k in ("image", "audio", "video", "text")
                             if mime.startswith(k + "/")),
                            "other",
                        )
                        rid = headers.get("warc-record-id") or f"{src}#{idx}"
                        meta = {
                            "uri": headers.get("warc-target-uri"),
                            "date": headers.get("warc-date"),
                            "source": src,
                        }
                        rows.append((rid, kind, mime, payload, meta, None))
                except ValueError as e:
                    rows.append((src, None, None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "mime", "payload", "meta", "_err"],
            )

    parsed = _binary_files(spark, path).mapInPandas(parse, _MEDIA_OUT_SCHEMA)
    good = parsed.filter(F.col("_err").isNull()).select(
        "media_id", "kind", "mime", "payload", "meta"
    )
    quarantined = parsed.filter(F.col("_err").isNotNull()).select(
        F.col("media_id").alias("source"), F.col("_err").alias("error")
    )
    return good, quarantined
