"""WARC (ISO 28500) ingestion and export — the container format web
crawls ship in (Common Crawl publishes each monthly round as ~100 TB of
``.warc.gz`` segments), and therefore the FIRST format a large-scale
LLM-training-data pipeline has to read.

Spark-first shape:

- **Read**: one file = one row via the built-in ``binaryFile`` source,
  then an Arrow-batched ``mapInPandas`` stage splits each file into WARC
  records. Parallelism is file-level — exactly how crawl processing
  distributes in practice (a Common Crawl round is ~72k segment files of
  ~1 GB; 1000 executors stream ~72 files each, no shuffle anywhere:
  the whole ingest is a map-only stage feeding the text/dedup tiers).
- **Write**: a real ``.warc.gz`` is the plain concatenation of
  independently-gzipped members (one per record, per the spec), so a
  distributed writer needs NO global coordination: each task gzips its
  own records and appends them into one part-file. Files are written
  under task-unique temp names and atomically renamed, and the manifest
  is recounted from committed bytes.

Everything is stdlib (``gzip``/``zlib``) — no external crawl libraries.

The record grammar implemented (version line, CRLF headers,
``Content-Length``-delimited payload, double-CRLF terminator) is the
normative core of ISO 28500 / the IIPC WARC 1.1 spec; arbitrary header
names are preserved case-insensitively.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"


def _hdecode(raw: bytes) -> str:
    """Header bytes -> str: UTF-8 (the WARC 1.1 header encoding, and
    what the writer emits) with a latin-1 total fallback so damaged
    wild-crawl headers never kill the parse."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


# ---------------------------------------------------------------------------
# pure byte-level codec (unit-testable without Spark)
# ---------------------------------------------------------------------------


def _default_record_id(target_uri: str | None, warc_date: str, payload: bytes) -> str:
    h = hashlib.md5(
        (target_uri or "").encode() + b"\x00" + warc_date.encode() + b"\x00" + payload
    ).hexdigest()
    return f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def build_warc_record(
    payload: bytes,
    *,
    warc_type: str = "resource",
    target_uri: str | None = None,
    warc_date: str = "2000-01-01T00:00:00Z",
    content_type: str = "text/plain",
    record_id: str | None = None,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize ONE WARC record. ``record_id`` defaults to a
    deterministic ``urn:uuid`` derived from (uri, date, payload) md5 —
    rerunning an export produces byte-identical records, so downstream
    exact-dedup and resume logic see a stable stream."""
    if record_id is None:
        record_id = _default_record_id(target_uri, warc_date, payload)
    for name, val in (("warc_type", warc_type), ("target_uri", target_uri),
                      ("warc_date", warc_date), ("content_type", content_type),
                      ("record_id", record_id),
                      *(extra_headers or {}).items()):
        if "\r" in name or "\n" in name:
            raise ValueError(f"CR/LF in WARC header name {name!r}")
        if val is not None and ("\r" in str(val) or "\n" in str(val)):
            # a CRLF in a header value would forge headers / desync the
            # record stream (confirmed injection in review) — refuse
            raise ValueError(f"CR/LF in WARC header value for {name!r}")
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<{record_id}>"),
        ("WARC-Date", warc_date),
        ("Content-Length", str(len(payload))),
        ("Content-Type", content_type),
    ]
    if target_uri is not None:
        headers.insert(3, ("WARC-Target-URI", target_uri))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = b"WARC/1.0" + _CRLF
    head += b"".join(f"{k}: {v}".encode() + _CRLF for k, v in headers)
    return head + _CRLF + payload + _CRLF + _CRLF


def gzip_member(record: bytes, compresslevel: int = 6) -> bytes:
    """One record -> one gzip member (``mtime=0`` so identical records
    compress to identical bytes regardless of wall clock)."""
    buf = io.BytesIO()
    with gzip.GzipFile(
        fileobj=buf, mode="wb", compresslevel=compresslevel, mtime=0
    ) as gz:
        gz.write(record)
    return buf.getvalue()


_GUNZIP_CHUNK = 1 << 20


def _iter_gunzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream (the .warc.gz layout)
    ONE MEMBER AT A TIME. Tolerates trailing garbage after the last
    complete member (truncated uploads) — parsed records up to that
    point survive (a member cut off mid-stream yields its inflated
    prefix; a member whose bytes are corrupt is discarded and the
    scan RESYNCS to the next gzip magic, so later members survive —
    the compressed-level twin of the record-level damage resync).
    Peak memory is one inflated member (one record in the standard
    crawl layout), not the whole inflated segment.

    Compressed input is fed in bounded chunks from a memoryview —
    the naive per-member ``obj.unused_data`` handoff copies the whole
    remaining compressed stream once PER MEMBER (quadratic in member
    count over a ~1 GB segment)."""
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos + 2 <= n and data[pos : pos + 2] == b"\x1f\x8b":
        obj = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out: list[bytes] = []
        p = pos
        corrupt = False
        while p < n and not obj.eof:
            chunk = bytes(view[p : p + _GUNZIP_CHUNK])
            p += len(chunk)
            try:
                out.append(obj.decompress(chunk))
            except zlib.error:
                corrupt = True
                break
            if obj.eof:
                p -= len(obj.unused_data)
        if corrupt:
            # discard the damaged member, resync to the next gzip
            # magic (deflate-level damage is unrecoverable within the
            # member; a false positive just fails and resyncs again)
            nxt = data.find(b"\x1f\x8b\x08", pos + 3)
            if nxt < 0:
                break
            pos = nxt
            continue
        yield b"".join(out)
        if not obj.eof:  # input exhausted: truncated final member
            break
        pos = p


def _gunzip_members(data: bytes) -> bytes:
    """Whole-stream inflate (see `_iter_gunzip_members` for the
    bounded-memory member iterator the Spark splitter uses)."""
    return b"".join(_iter_gunzip_members(data))


#: Record-boundary magic used for damage resync: every record ends
#: with CRLF CRLF and the next starts with its version line.
_RESYNC_MAGIC = b"\r\n\r\nWARC/"


def iter_warc_records(
    data: bytes,
    strict: bool = False,
    stats: dict | None = None,
    stop_at_damage: bool = False,
) -> Iterator[dict]:
    """Generator over the records of a PLAIN (already-decompressed)
    WARC byte stream — the incremental core `parse_warc_bytes` and the
    Spark splitter share, so a multi-GB inflated segment never has to
    materialize its full record list at once.

    Non-strict mode (the 100 TB default — real crawls contain damage)
    RESYNCS after a malformed record: it scans forward for the next
    record-boundary magic (``CRLF CRLF "WARC/"``) and continues, so one
    corrupt record costs itself, not the rest of a ~1 GB segment
    (review finding: the old break-on-damage silently discarded the
    remainder). Strict raises ValueError with an offset.

    ``stats``, when given, is filled in-place with ``skipped_bytes``
    and ``resync_events`` so silent loss stays observable, plus
    ``consumed_bytes`` — the offset after the last COMPLETE record.

    ``stop_at_damage`` (internal, used by the streaming splitter's
    carry buffer): instead of resyncing, STOP at the first malformed
    or incomplete record and report its start via
    ``stats['consumed_bytes']`` — the caller appends more input (the
    next gzip member) and re-parses from there, so a record that
    merely CONTINUES past the current buffer is never mistaken for
    damage.
    """
    pos = 0
    n = len(data)
    skipped = 0
    resyncs = 0
    consumed = 0
    stopped = False

    def _damage(at: int, msg: str) -> int:
        """Handle non-strict damage at offset ``at``: return the next
        parse position (or ``n`` when no later record boundary
        exists). Strict mode raises instead."""
        nonlocal skipped, resyncs, stopped
        if strict:
            raise ValueError(msg)
        if stop_at_damage:
            stopped = True
            return n
        nxt = data.find(_RESYNC_MAGIC, at)
        resyncs += 1
        if nxt < 0:
            skipped += n - at
            return n
        skipped += (nxt + 4) - at
        return nxt + 4

    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            consumed = n
            break
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            pos = _damage(pos, f"expected WARC version line at offset {pos}")
            continue
        rec_start = pos
        pos = eol + 2
        headers: dict[str, str] = {}
        ok = True
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                ok = False
                break
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line = end of headers
            k, _, v = line.partition(b":")
            # symmetric with the writer's UTF-8 encoding; latin-1 is
            # the total fallback for wild-crawl bytes (never raises)
            headers[_hdecode(k.strip()).lower()] = _hdecode(v.strip())
        if not ok:
            pos = _damage(
                rec_start, f"unterminated header block at offset {pos}"
            )
            continue
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = _damage(
                rec_start, f"missing/invalid Content-Length at offset {pos}"
            )
            continue
        if clen < 0:
            # a negative length would move the cursor BACKWARD and
            # re-parse the same record forever (confirmed hang in
            # review) — malformed either way
            pos = _damage(
                rec_start, f"negative Content-Length at offset {pos}"
            )
            continue
        if pos + clen > n:
            # payload runs past end-of-data: a truly truncated segment
            # has no later boundary (loop ends); a corrupt oversized
            # length with intact records after it resyncs past the
            # damaged one only
            pos = _damage(rec_start, f"truncated payload at offset {pos}")
            continue
        payload = data[pos : pos + clen]
        pos += clen
        rid = headers.get("warc-record-id", "")
        yield {
            "record_id": rid.strip("<>"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": payload,
        }
        consumed = pos
    if stats is not None:
        stats["skipped_bytes"] = skipped
        stats["resync_events"] = resyncs
        stats["consumed_bytes"] = consumed
        stats["stopped_at_damage"] = stopped


def parse_warc_bytes(
    data: bytes, strict: bool = False, stats: dict | None = None
) -> list[dict]:
    """Parse a WARC byte stream (plain or multi-member gzip) into
    record dicts: ``{record_id, warc_type, target_uri, warc_date,
    content_type, content_length, payload}``. See `iter_warc_records`
    for the damage-resync contract; ``stats`` is passed through.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    return list(iter_warc_records(data, strict=strict, stats=stats))


# ---------------------------------------------------------------------------
# Spark stages
# ---------------------------------------------------------------------------

_WARC_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", BinaryType()),
    ]
)


#: Per-emitted-batch payload budget for the splitter. Bounds the
#: pandas/Arrow batch a 1 GB+ segment turns into: one batch per FILE
#: (the old shape) buffered the whole inflated segment as a single
#: Arrow binary column, risking executor OOM and Arrow's 2 GB
#: binary-offset limit (review finding).
_SPLIT_BATCH_BYTES = 64 * 1024 * 1024
_SPLIT_BATCH_RECORDS = 4096

#: Above this, an un-parseable carry span stops accumulating and the
#: splitter switches to bounded boundary-scan (see _file_records) —
#: the memory cap for damaged segments, and the size above which a
#: single VALID record in a .warc.gz is no longer recoverable by the
#: streaming path.
_STALL_MAX_BYTES = 4 * _SPLIT_BATCH_BYTES


def _record_splitter(strict: bool):
    import pandas as pd

    def _flush(rows):
        return pd.DataFrame(
            rows, columns=[f.name for f in _WARC_SCHEMA.fields]
        ).astype({"content_length": "int64"}, errors="ignore")

    def _file_records(data: bytes) -> Iterator[dict]:
        """Record iterator for one file's bytes. Plain files parse
        directly; .warc.gz inflates ONE MEMBER AT A TIME with a carry
        buffer, so peak memory on the standard crawl layout (one
        record per member) is one inflated member, not the whole
        inflated segment (review finding). The carry parse stops at
        an incomplete tail instead of resyncing (the record may
        simply continue in the next member); the FINAL flush applies
        the normal damage-resync semantics so a genuinely corrupt
        mid-segment record still costs only itself. An un-parseable
        span wider than ``_STALL_MAX_BYTES`` switches to BOUNDED
        boundary-scan mode — bytes discard until the next record
        magic (8-byte carry tail for boundaries split across members)
        — so memory never grows past the stall cap even when a ~1 GB
        segment is damaged near its head (review finding: the first
        cut buffered the whole remaining tail forever). The cost of
        the bound: a VALID single record wider than the cap is lost;
        spanning records under the cap always parse whole. Strict
        mode raises on gz damage too (r8): mid-segment damage
        surfaces once the span provably cannot complete (buffered
        past the stall cap) or at the final flush — later than the
        plain-file path's immediate raise, but never silent."""
        if data[:2] != b"\x1f\x8b":
            yield from iter_warc_records(data, strict=strict)
            return
        # members accumulate into ~4 MB parse windows (list + join —
        # linear copies; and one parser call per WINDOW, not per
        # member: a per-member parse cost 24% of read throughput at
        # the 100x probe's one-record-per-member layout)
        window = _SPLIT_BATCH_BYTES // 16
        parts: list[bytes] = []
        size = 0
        scan_tail: bytes | None = None  # not None => boundary-scan mode
        for member in _iter_gunzip_members(data):
            if scan_tail is not None:
                probe = scan_tail + member
                idx = probe.find(_RESYNC_MAGIC)
                if idx < 0:
                    scan_tail = probe[-(len(_RESYNC_MAGIC) - 1):]
                    continue
                parts = [probe[idx + 4:]]  # resume AT the version line
                size = len(parts[0])
                scan_tail = None
                continue
            parts.append(member)
            size += len(member)
            if size < window:
                continue
            buf = b"".join(parts)
            st: dict = {}
            # the carry parse is NEVER strict: an "incomplete" record
            # here may simply continue in the next member — only the
            # final flush can tell real damage from a member boundary
            yield from iter_warc_records(
                buf, strict=False, stats=st, stop_at_damage=True
            )
            leftover = buf[st["consumed_bytes"]:]
            parts, size = ([leftover], len(leftover)) if leftover else ([], 0)
            if st["stopped_at_damage"] and size > _STALL_MAX_BYTES:
                if strict:
                    # honor strict on the gz path too (r8, review
                    # finding): at this point the span is PROVABLY
                    # damaged-or-over-cap — no further member can
                    # complete it — and before this raise only damage
                    # within the final flush window surfaced, so a
                    # mid-segment corruption was silently resynced in
                    # "strict" mode.
                    raise ValueError(
                        "strict: damaged or over-cap record span "
                        f"({size} buffered bytes > {_STALL_MAX_BYTES})"
                    )
                # the span may already CONTAIN a later boundary
                # (stop-at-damage never scans ahead): resync within,
                # else discard-and-scan incoming members
                nxt = leftover.find(_RESYNC_MAGIC, 1)
                if nxt >= 0:
                    parts, size = [leftover[nxt + 4:]], len(leftover) - nxt - 4
                else:
                    scan_tail = leftover[-(len(_RESYNC_MAGIC) - 1):]
                    parts, size = [], 0
        if scan_tail is None:
            yield from iter_warc_records(b"".join(parts), strict=strict)

    def _split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            acc = 0
            for fname, content in zip(pdf["path"], pdf["content"]):
                if content is None:
                    continue
                for rec in _file_records(bytes(content)):
                    rec = dict(rec)
                    rec["file"] = fname
                    rows.append(rec)
                    acc += rec["content_length"]
                    if (
                        acc >= _SPLIT_BATCH_BYTES
                        or len(rows) >= _SPLIT_BATCH_RECORDS
                    ):
                        yield _flush(rows)
                        rows, acc = [], 0
            yield _flush(rows)

    return _split


def read_warc(spark: SparkSession, path: str, strict: bool = False) -> DataFrame:
    """WARC files -> one row per record.

    ``binaryFile`` scan (one whole file per row — a WARC segment is
    ~1 GB by convention, sized to be a task) followed by a map-only
    Arrow-batched split; no shuffle. Output columns: file, record_id,
    warc_type, target_uri, warc_date, content_type, content_length,
    payload (binary).
    """
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        _record_splitter(strict), _WARC_SCHEMA
    )


#: binaryFile's fixed schema (streaming readers must declare it).
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    strict: bool = False,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming crawl intake: watch a directory for new WARC segments
    and emit records per micro-batch — the live twin of `read_warc`
    (same splitter, same schema), feeding the streaming dedup /
    screen / anomaly tiers as segments land from the fetcher fleet.

    ``max_files_per_trigger`` bounds per-batch work (a segment is
    ~1 GB, so the default of 'all new files' is only right for catch-up
    runs); file-granularity checkpointing comes from the file source
    itself — a crashed batch replays its files, and downstream sinks
    are idempotent per record id.
    """
    if max_files_per_trigger is not None and max_files_per_trigger < 1:
        raise ValueError("max_files_per_trigger must be >= 1")
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(
        _record_splitter(strict), _WARC_SCHEMA
    )


def warc_documents(
    spark: SparkSession, path: str, encoding: str = "utf-8"
) -> DataFrame:
    """Read WARC and decode text payloads — the crawl -> documents
    bridge. Emits (record_id, target_uri, warc_date, text); undecodable
    bytes are replaced (U+FFFD) rather than dropped, matching how crawl
    pipelines handle mixed encodings before `fix_mojibake`. The decode
    runs in the Arrow stage with ``errors='replace'`` — Spark's own
    ``decode()`` THROWS on malformed bytes under ANSI (review-confirmed
    on a one-byte-bad payload), which would kill a whole-segment scan.
    """
    import pandas as pd

    rec = read_warc(spark, path)
    schema = StructType(
        [
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("text", StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "record_id": pdf["record_id"],
                    "target_uri": pdf["target_uri"],
                    "warc_date": pdf["warc_date"],
                    "text": pdf["payload"].map(
                        lambda b: None
                        if b is None
                        else bytes(b).decode(encoding, errors="replace")
                    ),
                }
            )

    return rec.select(
        "record_id", "target_uri", "warc_date", "payload"
    ).mapInPandas(_decode, schema)


def write_warc(
    df: DataFrame,
    path: str,
    payload_col: str,
    uri_col: str | None = None,
    *,
    warc_type: str = "resource",
    content_type: str = "text/plain",
    warc_date: str = "2000-01-01T00:00:00Z",
    num_files: int | None = None,
    gzip_members: bool = True,
    compresslevel: int = 6,
    index: bool = False,
) -> list[dict]:
    """Distributed ``.warc.gz`` export: each task serializes its rows as
    independently-gzipped members and appends them into ONE part file
    (`.warc.gz` is member-concatenation per spec, so no coordination,
    no merge pass). String payloads are encoded UTF-8; binary payloads
    pass through.

    Files land as ``part-NNNNN.warc.gz`` via write-temp-then-rename
    (rename is atomic within a directory), and the returned manifest —
    ``[{file, records, bytes}, ...]``, also written as
    ``_MANIFEST.json`` — is recounted from what each task actually
    committed. ``num_files`` repartitions (round-robin) to bound file
    count/size; default keeps the upstream partitioning (map-only).

    ``index=True`` additionally writes a CDX-style random-access index
    (the Common Crawl index pattern) as parquet under ``<path>/_cdx``:
    one row per record — ``(file, offset, length, record_id,
    target_uri)`` — where (offset, length) bound the record's own gzip
    member, so `fetch_warc_records` can seek-read ANY record without
    scanning its segment. The underscore prefix keeps the index
    invisible to `read_warc`'s binaryFile listing. The index is
    distributed parquet (never collected); the manifest aggregates
    from it. Tasks write deterministically, so a retried task's
    re-rename is idempotent.
    """
    import json

    os.makedirs(path, exist_ok=True)
    cols = [F.col(payload_col).alias("__payload")]
    cols.append(
        (F.col(uri_col) if uri_col else F.lit(None)).cast("string").alias("__uri")
    )
    slim = df.select(*cols)
    if num_files is not None:
        if num_files < 1:
            raise ValueError("num_files must be >= 1")
        slim = slim.repartition(num_files)

    ext = ".warc.gz" if gzip_members else ".warc"
    idx_schema = StructType(
        [
            StructField("file", StringType()),
            StructField("offset", LongType()),
            StructField("length", LongType()),
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
        ]
    )

    def _write(batches):
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        fname = f"part-{pid:05d}{ext}"
        tmp = os.path.join(path, f"._tmp-{pid:05d}-{attempt}{ext}")
        rows = []
        pos = 0
        with open(tmp, "wb") as out:
            for pdf in batches:
                for payload, uri in zip(pdf["__payload"], pdf["__uri"]):
                    if payload is None:
                        continue
                    raw = (
                        payload.encode("utf-8")
                        if isinstance(payload, str)
                        else bytes(payload)
                    )
                    rec = build_warc_record(
                        raw,
                        warc_type=warc_type,
                        target_uri=None if uri is None else str(uri),
                        warc_date=warc_date,
                        content_type=content_type,
                    )
                    member = gzip_member(rec, compresslevel) if gzip_members else rec
                    out.write(member)
                    rows.append(
                        (
                            fname,
                            pos,
                            len(member),
                            _default_record_id(
                                None if uri is None else str(uri),
                                warc_date, raw,
                            ),
                            None if uri is None else str(uri),
                        )
                    )
                    pos += len(member)
        if not rows:
            os.remove(tmp)
            return iter(())
        os.replace(tmp, os.path.join(path, fname))
        return iter([pd.DataFrame(rows, columns=[f.name for f in idx_schema.fields])])

    idx = slim.mapInPandas(_write, idx_schema)
    spark = df.sparkSession
    if index:
        # the index parquet write IS the single action that runs the
        # export; the manifest aggregates from the committed index
        idx.write.mode("overwrite").parquet(os.path.join(path, "_cdx"))
        idx_back = spark.read.parquet(os.path.join(path, "_cdx"))
        manifest = [
            {"file": r["file"], "records": r["records"], "bytes": r["bytes"]}
            for r in idx_back.groupBy("file")
            .agg(
                F.count(F.lit(1)).alias("records"),
                F.sum("length").alias("bytes"),
            )
            .collect()
        ]
    else:
        manifest = [
            {"file": r["file"], "records": r["records"], "bytes": r["bytes"]}
            for r in idx.groupBy("file")
            .agg(
                F.count(F.lit(1)).alias("records"),
                F.sum("length").alias("bytes"),
            )
            .collect()
        ]
    manifest.sort(key=lambda m: m["file"])
    with open(os.path.join(path, "_MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def read_warc_index(spark: SparkSession, path: str) -> DataFrame:
    """The CDX index a `write_warc(..., index=True)` export carries:
    (file, offset, length, record_id, target_uri) per record."""
    return spark.read.parquet(os.path.join(path, "_cdx"))


def fetch_warc_records(
    spark: SparkSession, path: str, index: DataFrame
) -> DataFrame:
    """Random-access record fetch: seek-read exactly the (offset,
    length) spans the (filtered) index names — a point lookup never
    scans a segment. Each task opens its files once (rows grouped by
    file within the partition), reads the member bytes, and parses the
    single record. Output matches `read_warc`'s schema.

    This is the serving path of the Common Crawl index pattern: join
    your URL/id list against `read_warc_index`, pass the result here,
    and pay I/O proportional to the records FETCHED, not the corpus.
    """
    import pandas as pd

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fname, grp in pdf.groupby("file", sort=True):
                with open(os.path.join(path, fname), "rb") as fh:
                    for off, ln in zip(grp["offset"], grp["length"]):
                        fh.seek(int(off))
                        for rec in parse_warc_bytes(fh.read(int(ln))):
                            rec = dict(rec)
                            rec["file"] = fname
                            rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in _WARC_SCHEMA.fields]
            ).astype({"content_length": "int64"}, errors="ignore")

    return index.select("file", "offset", "length").mapInPandas(
        _fetch, _WARC_SCHEMA
    )


# ---------------------------------------------------------------------------
# HTTP response payloads (WARC-Type: response records carry the raw
# HTTP message — status line + headers + body — per ISO 28500 §6.3)
# ---------------------------------------------------------------------------


def parse_http_response(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split one raw HTTP/1.x response into (status, headers, body).
    Header names lowercase; repeated headers keep the LAST value.
    Returns ``(0, {}, payload)`` when the payload is not HTTP (some
    crawlers write bare bodies into response records) — the body
    passes through rather than being lost."""
    sep = payload.find(b"\r\n\r\n")
    if not payload.startswith(b"HTTP/") or sep < 0:
        return 0, {}, payload
    head, body = payload[:sep], payload[sep + 4 :]
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return 0, {}, payload
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if _:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    return status, headers, body


def _charset_of(content_type: str | None) -> str:
    if content_type:
        for part in content_type.split(";")[1:]:
            k, _, v = part.partition("=")
            if k.strip().lower() == "charset" and v.strip():
                return v.strip().strip("\"'")
    return "utf-8"


def warc_http_documents(
    spark: SparkSession, path: str, ok_only: bool = True
) -> DataFrame:
    """Crawl responses -> decoded text documents: the Common Crawl
    intake path. Reads WARC, keeps ``response`` records, splits the
    HTTP message, decodes the body with the header-declared charset
    (fallback utf-8; undecodable bytes replaced, never dropped).

    Output: (record_id, target_uri, warc_date, http_status,
    content_type, text). ``ok_only`` keeps 2xx statuses plus status 0
    (bare-body records with no HTTP framing — their content is still
    the document). Map-only end to end, like `read_warc`.
    """
    import pandas as pd

    rec = read_warc(spark, path).filter(F.col("warc_type") == "response")
    schema = StructType(
        [
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("http_status", LongType()),
            StructField("content_type", StringType()),
            StructField("text", StringType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, uri, date, payload in zip(
                pdf["record_id"], pdf["target_uri"], pdf["warc_date"], pdf["payload"]
            ):
                if payload is None:
                    continue
                status, headers, body = parse_http_response(bytes(payload))
                ctype = headers.get("content-type")
                try:
                    text = body.decode(_charset_of(ctype), errors="replace")
                except LookupError:  # unknown charset label in the wild
                    text = body.decode("utf-8", errors="replace")
                rows.append((rid, uri, date, status, ctype, text))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    out = rec.select(
        "record_id", "target_uri", "warc_date", "payload"
    ).mapInPandas(_decode, schema)
    if ok_only:
        out = out.filter(
            (F.col("http_status") == 0)
            | ((F.col("http_status") >= 200) & (F.col("http_status") < 300))
        )
    return out


def build_http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """Serialize an HTTP/1.1 response (tests + writer support for
    response-type WARC records). Header values are refused if they
    contain CR/LF — the same injection guard `build_warc_record`
    applies: a ``\\r\\n`` inside a value would forge headers or smuggle
    a body into the serialized message (review finding)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        status, "Status"
    )
    for name, val in (("content_type", content_type),
                      *(extra_headers or {}).items()):
        if "\r" in name or "\n" in name:
            raise ValueError(f"CR/LF in HTTP header name {name!r}")
        if val is not None and ("\r" in str(val) or "\n" in str(val)):
            raise ValueError(f"CR/LF in HTTP header value for {name!r}")
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}",
             f"Content-Length: {len(body)}"]
    for k, v in (extra_headers or {}).items():
        lines.append(f"{k}: {v}")
    return "\r\n".join(lines).encode("latin-1") + b"\r\n\r\n" + body
