"""WARC ingestion/export tier (sources/warc.py) — byte-level codec,
Spark read/write round trip, damage tolerance, determinism."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from udacity_data_engineering_capstone_project_spark.sources.warc import (
    build_warc_record,
    gzip_member,
    parse_warc_bytes,
    read_warc,
    warc_documents,
    write_warc,
)


def test_record_roundtrip_plain_and_gzip():
    payload = "héllo wörld".encode("utf-8")
    rec = build_warc_record(
        payload,
        target_uri="http://example.com/a",
        warc_date="2024-05-01T00:00:00Z",
        content_type="text/plain; charset=utf-8",
    )
    for blob in (rec, gzip_member(rec)):
        out = parse_warc_bytes(blob, strict=True)
        assert len(out) == 1
        r = out[0]
        assert r["payload"] == payload
        assert r["target_uri"] == "http://example.com/a"
        assert r["warc_type"] == "resource"
        assert r["content_length"] == len(payload)
        assert r["record_id"].startswith("urn:uuid:")


def test_record_id_deterministic_and_payload_sensitive():
    a1 = build_warc_record(b"x", target_uri="u")
    a2 = build_warc_record(b"x", target_uri="u")
    b = build_warc_record(b"y", target_uri="u")
    assert a1 == a2  # byte-identical rerun (mtime-free, hash-derived id)
    assert parse_warc_bytes(a1)[0]["record_id"] != parse_warc_bytes(b)[0]["record_id"]


def test_multi_member_gzip_concatenation_parses_all():
    recs = [build_warc_record(f"doc {i}".encode(), target_uri=f"u{i}") for i in range(5)]
    blob = b"".join(gzip_member(r) for r in recs)
    out = parse_warc_bytes(blob, strict=True)
    assert [r["payload"] for r in out] == [f"doc {i}".encode() for i in range(5)]


def test_payload_containing_warc_magic_is_not_split():
    """Content-Length delimits the payload — a payload that CONTAINS
    'WARC/1.0' header text must not be mistaken for a record start."""
    evil = b"\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\n"
    rec = build_warc_record(evil) + build_warc_record(b"tail")
    out = parse_warc_bytes(rec, strict=True)
    assert len(out) == 2
    assert out[0]["payload"] == evil
    assert out[1]["payload"] == b"tail"


def test_truncated_tail_nonstrict_keeps_prefix_strict_raises():
    recs = build_warc_record(b"a" * 100) + build_warc_record(b"b" * 100)
    cut = recs[: len(recs) - 60]  # second payload truncated
    out = parse_warc_bytes(cut, strict=False)
    assert len(out) == 1 and out[0]["payload"] == b"a" * 100
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(cut, strict=True)
    # truncated FINAL gzip member: first member's records survive
    gz = gzip_member(recs[: len(build_warc_record(b"a" * 100))]) + b"\x1f\x8b\x08\x00bad"
    assert len(parse_warc_bytes(gz)) == 1


def test_spark_write_read_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"document body {i} " * 10, f"http://ex.com/{i}") for i in range(40)],
        "doc_id bigint, text string, url string",
    )
    out = str(tmp_path / "crawl")
    manifest = write_warc(docs, out, payload_col="text", uri_col="url", num_files=3)
    assert sum(m["records"] for m in manifest) == 40
    assert {m["file"] for m in manifest} == {
        f for f in os.listdir(out) if f.endswith(".warc.gz")
    }
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        assert json.load(fh) == manifest

    back = read_warc(spark, out)
    rows = back.collect()
    assert len(rows) == 40
    texts = sorted(bytes(r.payload).decode() for r in rows)
    assert texts == sorted(f"document body {i} " * 10 for i in range(40))
    uris = {r.target_uri for r in rows}
    assert uris == {f"http://ex.com/{i}" for i in range(40)}
    # warc_documents bridges straight to the text tier
    wd = warc_documents(spark, out)
    assert wd.filter(F.col("text").contains("document body 7 ")).count() >= 1


def test_spark_write_is_rerun_stable(spark, tmp_path):
    """Same input -> byte-identical files (hash-derived ids, mtime=0
    gzip): exports are resumable/diffable."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id bigint, text string"
    ).repartition(1)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(docs.orderBy("doc_id"), p1, payload_col="text", num_files=1)
    write_warc(docs.orderBy("doc_id"), p2, payload_col="text", num_files=1)
    b1 = open(os.path.join(p1, "part-00000.warc.gz"), "rb").read()
    b2 = open(os.path.join(p2, "part-00000.warc.gz"), "rb").read()
    assert b1 == b2


def test_spark_read_plain_warc_and_binary_payload(spark, tmp_path):
    """Uncompressed .warc files and binary (non-UTF8) payloads ride the
    same reader; empty partitions write no file."""
    raw = b"".join(build_warc_record(bytes([i, 255, 0]) * 5) for i in range(3))
    p = tmp_path / "plain"
    p.mkdir()
    (p / "seg.warc").write_bytes(raw)
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 3
    assert all(len(bytes(r.payload)) == 15 for r in rows)

    empty = spark.createDataFrame([], "text string")
    man = write_warc(empty.repartition(2), str(tmp_path / "e"), payload_col="text")
    assert man == []
    assert not [
        f for f in os.listdir(tmp_path / "e") if f.endswith(".warc.gz")
    ]


def test_read_is_map_only(spark, tmp_path):
    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    out = str(tmp_path / "w")
    write_warc(docs, out, payload_col="text", num_files=1)
    plan = read_warc(spark, out)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_streaming_warc_intake(spark, tmp_path):
    """read_warc_stream is the live twin of read_warc: segments landing
    across micro-batches parse to the same records, maxFilesPerTrigger
    bounds per-batch work, and a second availableNow run over a kept
    checkpoint processes nothing new (file-source exactly-once)."""
    from udacity_data_engineering_capstone_project_spark.sources.warc import read_warc_stream

    crawl = tmp_path / "landing"
    crawl.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(seg: int, n: int) -> None:
        blob = b"".join(
            gzip_member(
                build_warc_record(
                    f"seg{seg} doc{i}".encode(), target_uri=f"http://s{seg}.com/{i}"
                )
            )
            for i in range(n)
        )
        (crawl / f"seg-{seg}.warc.gz").write_bytes(blob)

    land(0, 3)
    land(1, 2)

    out_dir = str(tmp_path / "records")
    stream = read_warc_stream(spark, str(crawl), max_files_per_trigger=1)
    assert stream.isStreaming

    def run_once():
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    got = spark.read.parquet(out_dir)
    assert got.count() == 5
    assert {r.target_uri for r in got.collect()} == {
        f"http://s{s}.com/{i}" for s, n in [(0, 3), (1, 2)] for i in range(n)
    }

    # replay with the same checkpoint: no new files -> no new rows
    run_once()
    assert spark.read.parquet(out_dir).count() == 5

    # a THIRD segment lands; only its records append
    land(2, 4)
    run_once()
    assert spark.read.parquet(out_dir).count() == 9


def test_streaming_warc_validates_trigger():
    from udacity_data_engineering_capstone_project_spark.sources.warc import read_warc_stream

    with pytest.raises(ValueError, match="max_files_per_trigger"):
        read_warc_stream(None, "/tmp/x", max_files_per_trigger=0)


# ---------------------------------------------------------------------------
# HTTP response records + link extraction (the Common Crawl intake path)
# ---------------------------------------------------------------------------


def test_parse_http_response_roundtrip_and_tolerance():
    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        build_http_response,
        parse_http_response,
    )

    body = "<html>héllo</html>".encode("utf-8")
    raw = build_http_response(body, 200, "text/html; charset=utf-8",
                              {"X-Crawl": "test"})
    status, headers, got = parse_http_response(raw)
    assert (status, got) == (200, body)
    assert headers["content-type"] == "text/html; charset=utf-8"
    assert headers["x-crawl"] == "test"
    # bare body (no HTTP framing) passes through as status 0
    s2, h2, b2 = parse_http_response(b"just text")
    assert (s2, h2, b2) == (0, {}, b"just text")
    # mangled status line -> tolerated, body preserved
    s3, _, b3 = parse_http_response(b"HTTP/1.1 abc\r\n\r\nx")
    assert (s3, b3) == (0, b"HTTP/1.1 abc\r\n\r\nx")


def test_warc_http_documents_decodes_charset_and_filters_status(spark, tmp_path):
    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        build_http_response,
        warc_http_documents,
    )

    recs = [
        build_warc_record(
            build_http_response("Müller".encode("latin-1"), 200,
                                "text/html; charset=ISO-8859-1"),
            warc_type="response", target_uri="http://a.com/1",
        ),
        build_warc_record(
            build_http_response(b"gone", 404, "text/plain"),
            warc_type="response", target_uri="http://a.com/404",
        ),
        build_warc_record(
            build_http_response(b"ok utf8", 200, "text/plain"),
            warc_type="response", target_uri="http://a.com/2",
        ),
        # charset label nobody knows -> utf-8 fallback, not a crash
        build_warc_record(
            build_http_response(b"weird", 200, "text/plain; charset=x-unknown-1"),
            warc_type="response", target_uri="http://a.com/3",
        ),
        # request records never surface as documents
        build_warc_record(b"GET / HTTP/1.1\r\n\r\n", warc_type="request",
                          target_uri="http://a.com/1"),
    ]
    p = tmp_path / "resp"
    p.mkdir()
    (p / "seg.warc").write_bytes(b"".join(recs))
    out = {r.target_uri: r for r in warc_http_documents(spark, str(p)).collect()}
    assert set(out) == {"http://a.com/1", "http://a.com/2", "http://a.com/3"}
    assert out["http://a.com/1"].text == "Müller"
    assert out["http://a.com/1"].http_status == 200
    assert out["http://a.com/3"].text == "weird"
    # ok_only=False keeps the 404
    all_rows = warc_http_documents(spark, str(p), ok_only=False)
    assert all_rows.count() == 4


def test_extract_links_resolution_matrix(spark):
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        extract_links,
    )

    html = (
        '<a href="https://ext.com/x">a</a> '
        "<a href='//cdn.com/lib.js'>b</a> "
        '<a href="/root.html">c</a> '
        '<a href="rel/page.html">d</a> '
        '<a href="#frag">e</a> '
        '<a href="mailto:x@y.z">f</a> '
        '<A HREF="HTTP://UP.COM/">g</A>'
    )
    df = spark.createDataFrame(
        [(1, html, "https://base.com/dir/index.html"), (2, "<p>no links</p>", "https://b.com/")],
        "id bigint, html string, url string",
    )
    got = sorted(r.link for r in extract_links(df, "id", "html", "url").collect())
    assert got == sorted(
        [
            "https://ext.com/x",
            "https://cdn.com/lib.js",
            "https://base.com/root.html",
            "https://base.com/dir/rel/page.html",
            "HTTP://UP.COM/",
        ]
    )
    # without a base only absolute links survive
    noba = extract_links(df, "id", "html")
    assert noba.count() == 2
    # map-only plan: no join, no shuffle
    plan = extract_links(df, "id", "html", "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_crawl_to_pagerank_composition(spark, tmp_path):
    """The full bridge: WARC responses -> documents -> link edges ->
    PageRank. The synthetic site links page i -> page (i+1)%5 plus
    everyone -> page 0; page 0 must rank first."""
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        extract_links,
    )
    from udacity_data_engineering_capstone_project_spark.operators.graph import pagerank
    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        build_http_response,
        warc_http_documents,
    )

    recs = []
    for i in range(5):
        html = (
            f'<a href="/p{(i + 1) % 5}">next</a> <a href="/p0">home</a>'
        ).encode()
        recs.append(
            build_warc_record(
                build_http_response(html, 200, "text/html; charset=utf-8"),
                warc_type="response",
                target_uri=f"http://site.com/p{i}",
            )
        )
    p = tmp_path / "site"
    p.mkdir()
    (p / "seg.warc").write_bytes(b"".join(recs))

    pages = warc_http_documents(spark, str(p)).select(
        F.col("target_uri").alias("url"), F.col("text").alias("html")
    )
    edges = extract_links(pages, "url", "html", "url").select(
        F.col("url").alias("src"), F.col("link").alias("dst")
    )
    assert edges.count() == 10
    ranks = pagerank(edges, max_iter=10).collect()
    top = max(ranks, key=lambda r: r.rank)
    assert top.node == "http://site.com/p0"


# ---------------------------------------------------------------------------
# review-finding regressions (round-6 continuation-3 self-review)
# ---------------------------------------------------------------------------


def test_negative_content_length_cannot_loop():
    """A negative Content-Length used to move the parse cursor BACKWARD
    and re-parse the same record forever; now it's malformed damage."""
    evil = b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"
    assert parse_warc_bytes(evil, strict=False) == []
    with pytest.raises(ValueError, match="negative"):
        parse_warc_bytes(evil, strict=True)


def test_header_crlf_injection_refused_and_utf8_roundtrip():
    with pytest.raises(ValueError, match="CR/LF"):
        build_warc_record(b"x", target_uri="http://e.com/a\r\nWARC-Type: evil")
    # non-ASCII URI survives the round trip (UTF-8 both sides; used to
    # come back as mojibake via a latin-1 read of utf-8 bytes)
    uri = "http://ex.com/ümlaut/路径"
    rec = build_warc_record(b"x", target_uri=uri)
    assert parse_warc_bytes(rec, strict=True)[0]["target_uri"] == uri
    # damaged latin-1 header bytes still parse (total fallback)
    raw = rec.replace("ümlaut/路径".encode(), b"\xfcmlaut")
    assert parse_warc_bytes(raw)[0]["target_uri"] == "http://ex.com/\xfcmlaut"


def test_warc_documents_replaces_undecodable_bytes(spark, tmp_path):
    """One non-UTF8 payload must not kill the scan (Spark's decode()
    throws under ANSI; ours replaces with U+FFFD per the contract)."""
    recs = build_warc_record(b"\xff\xfe broken") + build_warc_record(b"fine")
    p = tmp_path / "bad"
    p.mkdir()
    (p / "seg.warc").write_bytes(recs)
    texts = sorted(r.text for r in warc_documents(spark, str(p)).collect())
    assert texts == ["fine", "�� broken"]


def test_extract_links_query_only_href(spark):
    from udacity_data_engineering_capstone_project_spark.functions.urls import (
        extract_links,
    )

    df = spark.createDataFrame(
        [(1, '<a href="?page=2">next</a>', "https://b.com/dir/index.html?page=1")],
        "id bigint, html string, url string",
    )
    got = [r.link for r in extract_links(df, "id", "html", "url").collect()]
    # keeps the document path, replaces the query (RFC 3986 §5.3)
    assert got == ["https://b.com/dir/index.html?page=2"]


def test_damage_resync_keeps_records_after_corruption():
    """Review regression (r6 ADVICE): one corrupt record mid-segment
    must cost itself, NOT the rest of the segment — the parser resyncs
    to the next record boundary and keeps counting what it skipped."""
    from udacity_data_engineering_capstone_project_spark.sources.warc import parse_warc_bytes

    good = [build_warc_record(f"doc{i}".encode()) for i in range(5)]
    # corrupt record 2's version line (damage mid-stream)
    bad = good[2].replace(b"WARC/1.0", b"JUNK/9.9", 1)
    stream = good[0] + good[1] + bad + good[3] + good[4]
    stats = {}
    out = parse_warc_bytes(stream, strict=False, stats=stats)
    assert [r["payload"] for r in out] == [b"doc0", b"doc1", b"doc3", b"doc4"]
    assert stats["resync_events"] >= 1
    assert stats["skipped_bytes"] >= len(bad) - 4
    with pytest.raises(ValueError, match="version line"):
        parse_warc_bytes(stream, strict=True)

    # corrupt Content-Length mid-stream: later records still survive
    bad2 = good[2].replace(b"Content-Length: 4", b"Content-Length: xx", 1)
    out2 = parse_warc_bytes(good[0] + bad2 + good[3], strict=False)
    assert [r["payload"] for r in out2] == [b"doc0", b"doc3"]

    # oversized (corrupt) length that would swallow the next record:
    # resync recovers everything after the damaged one
    bad3 = good[2].replace(b"Content-Length: 4", b"Content-Length: 4000", 1)
    out3 = parse_warc_bytes(good[0] + bad3 + good[3] + good[4], strict=False)
    assert b"doc0" in [r["payload"] for r in out3]
    assert b"doc4" in [r["payload"] for r in out3]

    # all-good stream: zero skipped, zero resyncs
    stats_ok = {}
    parse_warc_bytes(b"".join(good), strict=False, stats=stats_ok)
    assert stats_ok["skipped_bytes"] == 0 and stats_ok["resync_events"] == 0
    assert stats_ok["consumed_bytes"] == len(b"".join(good))


def test_splitter_emits_bounded_batches(spark, tmp_path, monkeypatch):
    """Review regression (r6 ADVICE): the Spark splitter must not
    buffer a whole inflated segment into one pandas/Arrow batch —
    shrink the batch budget and verify multi-batch emission preserves
    every record exactly once."""
    from udacity_data_engineering_capstone_project_spark.sources import warc as warc_mod

    recs = b"".join(
        build_warc_record(f"payload-{i:03d}".encode() * 20) for i in range(25)
    )
    p = tmp_path / "seg"
    p.mkdir()
    (p / "part-00000.warc").write_bytes(recs)
    monkeypatch.setattr(warc_mod, "_SPLIT_BATCH_RECORDS", 4)
    out = read_warc(spark, str(p))
    payloads = sorted(r["payload"] for r in out.collect())
    assert payloads == sorted(
        (f"payload-{i:03d}".encode() * 20) for i in range(25)
    )
    # byte-budget trigger too (records bigger than the budget)
    monkeypatch.setattr(warc_mod, "_SPLIT_BATCH_RECORDS", 4096)
    monkeypatch.setattr(warc_mod, "_SPLIT_BATCH_BYTES", 64)
    out2 = read_warc(spark, str(p))
    assert out2.count() == 25


def test_http_response_header_crlf_injection_refused():
    """Review regression (r6 ADVICE): build_http_response applies the
    same CR/LF rejection as build_warc_record — a value with CRLF
    would forge headers / smuggle a body into the message."""
    from udacity_data_engineering_capstone_project_spark.sources.warc import build_http_response

    ok = build_http_response(b"body", extra_headers={"X-A": "v"})
    assert ok.startswith(b"HTTP/1.1 200 OK\r\n") and ok.endswith(b"body")
    with pytest.raises(ValueError, match="CR/LF"):
        build_http_response(b"b", content_type="text/html\r\nX-Forged: 1")
    with pytest.raises(ValueError, match="CR/LF"):
        build_http_response(b"b", extra_headers={"X-A": "v\r\nX-Forged: 1"})
    with pytest.raises(ValueError, match="CR/LF"):
        build_http_response(b"b", extra_headers={"X-A\r\nX-Forged: 1": "v"})


def test_gzip_member_streaming_and_spanning_records(spark, tmp_path):
    """r7: the splitter inflates .warc.gz one member at a time with a
    carry buffer. Three layouts must all read identically to the
    whole-stream parse: (a) standard one-record-per-member, (b) ONE
    record split across two gzip members (the carry case — a naive
    per-member parse would call its tail damage), (c) a corrupt
    member mid-file (later members survive via the final-flush
    resync)."""
    import gzip as _gz
    import io as _io

    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        parse_warc_bytes,
    )

    def member(raw: bytes) -> bytes:
        buf = _io.BytesIO()
        with _gz.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(raw)
        return buf.getvalue()

    recs = [build_warc_record(f"stream-{i}".encode() * 10) for i in range(6)]
    # (b): record 2 split mid-payload across two members
    r2 = recs[2]
    layouts = {
        "std": b"".join(member(r) for r in recs),
        "span": member(recs[0]) + member(recs[1]) + member(r2[:30])
        + member(r2[30:]) + b"".join(member(r) for r in recs[3:]),
    }
    p = tmp_path / "gz"
    p.mkdir()
    for name, blob in layouts.items():
        (p / f"{name}.warc.gz").write_bytes(blob)
        got = sorted(
            r["payload"]
            for r in read_warc(spark, str(p / f"{name}.warc.gz")).collect()
        )
        assert got == sorted(r["payload"] for r in parse_warc_bytes(blob)), name
        assert len(got) == 6, name

    # (c): corrupt middle member — records after it survive
    bad = member(recs[2])
    bad = bad[:20] + bytes([bad[20] ^ 0xFF]) + bad[21:]
    blob = member(recs[0]) + member(recs[1]) + bad + member(recs[3])
    (p / "dmg.warc.gz").write_bytes(blob)
    got = {r["payload"] for r in read_warc(spark, str(p / "dmg.warc.gz")).collect()}
    assert recs and got.issuperset({b"stream-0" * 10, b"stream-1" * 10})


def test_streaming_crawl_screen_composition(spark, tmp_path):
    """r7 composition: the LIVE crawl intake path end-to-end —
    read_warc_stream -> Arrow text decode -> RFC 9309 robots screen ->
    quality rule -> parquet sink — with the robots/quality screens
    applied INSIDE the streaming query (projection + broadcast join
    are stream-safe). Two segment landings must equal the batch twin
    over the same files, and a checkpoint replay adds nothing."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from udacity_data_engineering_capstone_project_spark.functions.robots import (
        filter_robots_disallowed,
        robots_rules_df,
    )
    from udacity_data_engineering_capstone_project_spark.sources.warc import (
        read_warc,
        read_warc_stream,
    )

    crawl = tmp_path / "landing"
    crawl.mkdir()

    def land(seg: int, n: int) -> None:
        blob = b"".join(
            gzip_member(
                build_warc_record(
                    (f"seg{seg} doc{i} " + "body word " * (2 + i)).encode(),
                    target_uri=(
                        f"http://h{i % 2}.com/"
                        + ("blocked/" if i % 3 == 0 else "ok/")
                        + f"p{i}"
                    ),
                )
            )
            for i in range(n)
        )
        (crawl / f"seg-{seg}.warc.gz").write_bytes(blob)

    rules = robots_rules_df(
        spark, [("h0.com", "User-agent: *\nDisallow: /blocked")]
    )
    decode_schema = StructType(
        [
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("text", StringType()),
        ]
    )

    def _decode(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "record_id": pdf["record_id"],
                    "target_uri": pdf["target_uri"],
                    "text": pdf["payload"].map(
                        lambda b: None if b is None
                        else bytes(b).decode("utf-8", errors="replace")
                    ),
                }
            )

    def screened(df):
        decoded = df.select(
            "record_id", "target_uri", "payload"
        ).mapInPandas(_decode, decode_schema)
        allowed = filter_robots_disallowed(decoded, rules, "target_uri")
        return allowed.filter(F.length("text") >= 30)

    land(0, 6)
    out_dir = str(tmp_path / "screened")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            screened(read_warc_stream(spark, str(crawl)))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    land(1, 4)
    run_once()

    got = {
        (r.target_uri, r.text)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.target_uri, r.text)
        for r in screened(read_warc(spark, str(crawl))).collect()
    }
    assert got == want and len(got) > 0
    # screens really screened: h0.com/blocked dropped, short docs dropped
    assert all("h0.com/blocked" not in u for u, _ in got)
    assert all(len(t) >= 30 for _, t in got)
    # replay over the kept checkpoint: nothing new
    run_once()
    assert spark.read.parquet(out_dir).count() == len(got)


def test_strict_mode_raises_on_gz_midsegment_damage(spark, tmp_path, monkeypatch):
    """r8 review fix: strict=True must be honored on the streaming
    .warc.gz path too — a damaged span that buffers past the stall cap
    (provably unable to complete) raises instead of being silently
    boundary-scanned away. Non-strict on the same bytes recovers the
    tail (the documented crawl default)."""
    from udacity_data_engineering_capstone_project_spark.sources import warc as wm
    from udacity_data_engineering_capstone_project_spark.sources.warc import read_warc

    monkeypatch.setattr(wm, "_SPLIT_BATCH_BYTES", 256)
    monkeypatch.setattr(wm, "_STALL_MAX_BYTES", 1024)

    good = [build_warc_record(f"strict-{i}".encode() * 8) for i in range(6)]
    bad_header = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999999999\r\n\r\n"
    )
    junk = b"".join(gzip_member(b"J" * 300) for _ in range(8))
    blob = (
        gzip_member(good[0]) + gzip_member(bad_header) + junk
        + b"".join(gzip_member(r) for r in good[1:])
    )
    p = tmp_path / "strict"
    p.mkdir()
    (p / "x.warc.gz").write_bytes(blob)

    with pytest.raises(Exception, match="strict"):
        read_warc(spark, str(p / "x.warc.gz"), strict=True).collect()

    lax = {
        bytes(r["payload"])
        for r in read_warc(spark, str(p / "x.warc.gz")).collect()
    }
    assert b"strict-0" * 8 in lax  # before the damage


def test_wide_damage_bounded_scan_recovers_tail(spark, tmp_path, monkeypatch):
    """r7 review fix: an un-parseable span wider than the stall cap
    must NOT buffer the rest of the segment — the splitter switches
    to bounded boundary-scan and recovers records after the damage.
    Two damage shapes: (a) a corrupt giant Content-Length swallowing
    real records (a later boundary exists INSIDE the span — in-place
    resync), (b) pure junk with no boundary until a later member
    (cross-member scan with the 8-byte carry tail)."""
    from udacity_data_engineering_capstone_project_spark.sources import warc as wm

    monkeypatch.setattr(wm, "_SPLIT_BATCH_BYTES", 256)
    monkeypatch.setattr(wm, "_STALL_MAX_BYTES", 1024)

    def member(raw: bytes) -> bytes:
        return gzip_member(raw)

    good = [build_warc_record(f"tail-{i}".encode() * 8) for i in range(8)]
    bad_header = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999999999\r\n\r\n"
    )

    p = tmp_path / "dmg"
    p.mkdir()
    # (a) corrupt length followed by real records: resync-inside-span
    blob_a = member(good[0]) + member(bad_header) + b"".join(
        member(r) for r in good[1:]
    )
    (p / "a.warc.gz").write_bytes(blob_a)
    got_a = {
        bytes(r["payload"])
        for r in read_warc(spark, str(p / "a.warc.gz")).collect()
    }
    assert good[0][good[0].find(b"\r\n\r\n") :] is not None
    assert b"tail-0" * 8 in got_a  # before the damage
    # at least the later records recover (the first record after the
    # bad header is absorbed as its phantom payload — one record lost,
    # not the segment)
    assert {f"tail-{i}".encode() * 8 for i in range(3, 8)} <= got_a

    # (b) junk with NO boundary until a later member; junk ends with
    # CRLF CRLF so the boundary forms exactly at the junk/good seam
    junk = [member(b"J" * 300) for _ in range(8)]
    junk.append(member(b"K" * 100 + b"\r\n\r\n"))
    blob_b = member(good[0]) + member(bad_header) + b"".join(junk) + b"".join(
        member(r) for r in good[1:]
    )
    (p / "b.warc.gz").write_bytes(blob_b)
    got_b = {
        bytes(r["payload"])
        for r in read_warc(spark, str(p / "b.warc.gz")).collect()
    }
    assert b"tail-0" * 8 in got_b
    assert {f"tail-{i}".encode() * 8 for i in range(1, 8)} <= got_b
