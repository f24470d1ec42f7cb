"""WARC / WET (Common Crawl) ingestion sources.

The reference ingests Python lists (``collection.add``,
/root/reference/src/sifts/core.py:139-187); a real pretraining corpus
starts as Common Crawl WARC/WET shards. These readers turn them into
the same canonical frames the rest of the engine consumes:

* :func:`read_wet` — WET ("extracted text") shards → the canonical
  ``(id, content, metadata)`` docs frame of ``sources/ingest.py``,
  plus a quarantine frame for malformed records (a bad record costs
  one quarantine row, never one 400 MB shard, never the job — on a
  framing error the scanner emits one error event and RESYNCS at the
  next ``\\r\\nWARC/`` boundary);
* :func:`read_warc_responses` — raw WARC ``response`` records → the
  multimodal MEDIA frame (``media_id, kind, mime, payload, meta``) of
  ``operators/multimodal.py``, payload = the HTTP body bytes, so
  crawled images/audio flow straight into pHash / feature extraction.

Parsing is stdlib-only (zlib + bytes splitting — the WARC/1.x format,
ISO 28500): no optional deps, engine-portable. Distributed shape: ONE
``binaryFile`` scan (one whole shard per task — WARC's per-record gzip
members do not split mid-record, which is why Common Crawl ships ~1 GB
shards) through an Arrow ``mapInPandas`` parser; nothing touches the
driver. Size ``spark.sql.files.maxPartitionBytes`` is irrelevant here —
binaryFile assigns whole files; parallelism = shard count, exactly how
Common Crawl is meant to be consumed (100 TB ≈ 90k shards ≈ 90k tasks).

Memory posture: the COMPRESSED shard is whole-in-task (binaryFile
hands us the bytes; Spark's binaryFile caps individual files at 2 GB —
larger shards must be re-cut upstream), but decompression is streamed
via ``zlib.decompressobj`` and the parse buffer holds at most ONE
record plus a chunk, so peak decompressed memory is record-sized, not
shard-sized. Records whose declared Content-Length exceeds
``max_record_bytes`` (default 256 MiB) are quarantined and their body
bytes skipped without buffering — an adversarial/miscut shard costs
quarantine rows, not an executor OOM.

Record framing (ISO 28500 §4): ``WARC/1.x`` version line, CRLF header
block, empty line, ``Content-Length`` payload bytes, CRLF CRLF. Gzip
shards are member-per-record; members are inflated back-to-back into
one logical byte stream.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GZIP_MAGIC = b"\x1f\x8b"
_RESYNC_MARKER = b"\r\nWARC/"
_MAX_HEADER_BYTES = 1 << 20  # sanity cap on one header block
_DEFAULT_MAX_RECORD_BYTES = 256 << 20  # CC truncates payloads ~1 MiB

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


def _iter_inflated_chunks(data: bytes, chunk_size: int = 1 << 20):
    """Stream-decompress a (possibly multi-member) gzip blob in
    ``chunk_size`` pieces — never materializes the whole decompressed
    shard (``gzip.decompress`` would; at ~10:1 text ratios a 1 GB
    shard is ~10 GB decompressed × 32 concurrent tasks)."""
    import zlib

    d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
    pending = data
    while True:
        try:
            out = d.decompress(pending, chunk_size)
        except zlib.error as e:
            raise ValueError(f"bad gzip: {e}") from None
        if out:
            yield out
        if d.eof:
            tail = d.unused_data
            if tail[:2] == _GZIP_MAGIC:  # next member
                d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
                pending = tail
                continue
            if tail.strip(b"\x00"):
                raise ValueError("bad gzip: trailing garbage after final member")
            return
        pending = d.unconsumed_tail
        if not pending:
            # input exhausted mid-member (zlib halts input consumption
            # only when max_length fills, so empty tail + no eof = cut)
            raise ValueError("bad gzip: truncated member")


def _chunks_of(blob: bytes):
    if blob[:2] == _GZIP_MAGIC:
        return _iter_inflated_chunks(blob)
    return iter((blob,)) if blob else iter(())


def _scan_warc(chunks, source: str,
               max_record_bytes: int = _DEFAULT_MAX_RECORD_BYTES):
    """Incremental WARC scanner over a decompressed-chunk iterator.

    Yields ``("record", headers: dict[lower-str, str], body: bytes)``
    per well-framed record and ``("error", message)`` per framing
    fault. A fault costs ONE event: the scanner resyncs at the next
    ``\\r\\nWARC/`` boundary and keeps parsing, so one corrupt record
    never drops the shard remainder. The buffer holds at most one
    record (bodies over ``max_record_bytes`` are skipped unbuffered),
    bounding peak memory at record size."""
    buf = bytearray()
    base = 0  # absolute offset of buf[0] in the decompressed stream
    it = iter(chunks)
    eof = False
    stream_err = None

    def pull() -> bool:
        nonlocal eof, stream_err
        if eof:
            return False
        try:
            chunk = next(it)
        except StopIteration:
            eof = True
            return False
        except Exception as e:  # gzip corruption mid-stream
            stream_err = f"{source}: {e}"
            eof = True
            return False
        buf.extend(chunk)
        return True

    def resync() -> bool:
        # Skip to the next record boundary; keep a marker-sized tail so
        # a boundary split across chunks is still found.
        nonlocal base
        while True:
            i = buf.find(_RESYNC_MARKER)
            if i >= 0:
                del buf[: i + 2]  # leave "WARC/" at buf[0]
                base += i + 2
                return True
            keep = min(len(buf), len(_RESYNC_MARKER) - 1)
            base += len(buf) - keep
            del buf[: len(buf) - keep]
            if not pull():
                base += len(buf)
                buf.clear()
                return False

    while True:
        # skip inter-record CRLFs
        while True:
            while len(buf) < 2 and pull():
                pass
            if buf[:2] in (b"\r\n", b"\n\n"):
                del buf[:2]
                base += 2
                continue
            break
        if not buf and eof:
            break
        # version-line prefix FIRST: "not a WARC file" must say so even
        # when the junk contains no header terminator at all
        while len(buf) < 5 and pull():
            pass
        if not buf.startswith(b"WARC/"):
            yield ("error",
                   f"{source}: expected WARC/1.x version line at {base}, "
                   f"got {bytes(buf[:40])!r}")
            if not resync():
                break
            continue
        # header terminator (bounded search; restart 3 back in case the
        # CRLFCRLF straddles a chunk edge)
        search_from = 0
        head_end = -1
        while True:
            head_end = buf.find(b"\r\n\r\n", search_from)
            if head_end >= 0 or len(buf) > _MAX_HEADER_BYTES:
                break
            search_from = max(0, len(buf) - 3)
            if not pull():
                break
        if head_end < 0:
            kind = ("oversized" if len(buf) > _MAX_HEADER_BYTES
                    else "unterminated")
            yield ("error", f"{source}: {kind} header block at {base}")
            del buf[:5]  # step past "WARC/" so resync finds the NEXT one
            base += 5
            if not resync():
                break
            continue
        head = bytes(buf[:head_end]).decode("utf-8", "replace")
        headers: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError
        except (KeyError, ValueError):
            yield ("error",
                   f"{source}: missing/invalid Content-Length at {base}")
            del buf[:5]
            base += 5
            if not resync():
                break
            continue
        body_start = head_end + 4
        if length > max_record_bytes:
            yield ("error",
                   f"{source}: oversized record at {base} "
                   f"({length} > {max_record_bytes} byte cap)")
            remaining = body_start + length
            while remaining > 0:  # skip unbuffered
                drop = min(len(buf), remaining)
                del buf[:drop]
                base += drop
                remaining -= drop
                if remaining > 0 and not pull():
                    break
            continue
        while len(buf) < body_start + length and pull():
            pass
        if len(buf) < body_start + length:
            yield ("error",
                   f"{source}: truncated record at {base} "
                   f"(wants {length} bytes, {len(buf) - body_start} left)")
            break  # nothing past EOF to resync into
        yield ("record", headers, bytes(buf[body_start:body_start + length]))
        del buf[: body_start + length]
        base += body_start + length
    if stream_err:
        yield ("error", stream_err)


def _binary_files(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )


def read_wet(
    spark: SparkSession, path: str, min_content_chars: int = 1,
    max_record_bytes: int = _DEFAULT_MAX_RECORD_BYTES,
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

    ``quarantined`` rows are ``(source=<shard path>, error=<message
    with byte offset>)`` — ONE per framing fault; the scanner resyncs
    at the next record boundary, so records before AND after a corrupt
    record are KEPT in ``good`` (only gzip-stream corruption or EOF
    truncation costs the remainder, which is physically unrecoverable).

    Shards over Spark's 2 GB ``binaryFile`` cap must be re-cut
    upstream; records whose Content-Length exceeds
    ``max_record_bytes`` are quarantined without buffering."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                idx = 0
                for event in _scan_warc(
                    _chunks_of(bytes(blob)), src, max_record_bytes
                ):
                    if event[0] == "error":
                        rows.append((src, None, None, event[1]))
                        continue
                    _, headers, body = event
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
    spark: SparkSession, path: str, mime_prefixes: tuple = (),
    max_record_bytes: int = _DEFAULT_MAX_RECORD_BYTES,
) -> tuple[DataFrame, DataFrame]:
    """Raw WARC shards → the multimodal MEDIA frame: one row per
    ``response`` record, ``payload`` = the HTTP response BODY bytes
    (status line + headers stripped), ``mime`` from the HTTP
    Content-Type, ``kind`` coarse-classified from it (image/audio/
    video/text/other). ``mime_prefixes`` (e.g. ``("image/",)``) filters
    records PARSE-side, so a 1 GB HTML-dominated shard costs Arrow
    transfer only for the media types the pipeline wants.

    Same quarantine/resync/memory contract as :func:`read_wet`.

    Feed the ``good`` frame straight to
    :func:`~sifts_spark.operators.multimodal.extract_image_features` /
    :func:`~sifts_spark.operators.multimodal.image_phash_pairs`."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, blob in zip(pdf["path"], pdf["content"]):
                idx = 0
                for event in _scan_warc(
                    _chunks_of(bytes(blob)), src, max_record_bytes
                ):
                    if event[0] == "error":
                        rows.append((src, None, None, None, None, event[1]))
                        continue
                    _, headers, body = event
                    idx += 1
                    if headers.get("warc-type") != "response":
                        continue
                    # HTTP message: status line + headers, CRLF CRLF, body
                    sep = body.find(b"\r\n\r\n")
                    http_head = body[:sep].decode("utf-8", "replace") if sep >= 0 else ""
                    payload = body[sep + 4:] if sep >= 0 else body
                    mime = "application/octet-stream"
                    content_type = None
                    for line in http_head.split("\r\n")[1:]:
                        k, _, v = line.partition(":")
                        if k.strip().lower() == "content-type":
                            # mime = bare type for prefix filtering /
                            # kind classification; the FULL header value
                            # (incl. charset= and other parameters) is
                            # preserved in meta for downstream decoders
                            # — legacy sites often declare charset ONLY
                            # here, not in <meta>
                            content_type = v.strip() or None
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
                    if content_type is not None:
                        meta["content_type"] = content_type
                    rows.append((rid, kind, mime, payload, meta, None))
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
