"""WARC writer/parser round-trips and framing robustness."""

import pytest

from api_ocr_spark.sources import warc_source as W


def rec(i, payload, ctype="text/html; charset=utf-8"):
    return {
        "record_id": f"urn:md5:rec{i}",
        "target_uri": f"https://example.com/{i}",
        "warc_date": "2026-01-05T03:00:00Z",
        "content_type": ctype,
        "payload": payload,
    }


def test_roundtrip_multi_record():
    recs = [rec(0, "first page body"), rec(1, "segundo documento"),
            rec(2, "", ctype="text/plain; charset=utf-8")]
    out = W.parse_warc(W.build_warc_file(recs))
    assert len(out) == 3
    for i, (r, o) in enumerate(zip(recs, out)):
        assert o["rec_index"] == i
        assert o["record_id"] == r["record_id"]
        assert o["target_uri"] == r["target_uri"]
        assert o["warc_date"] == r["warc_date"]
        assert o["content_type"] == r["content_type"]
        assert o["http_status"] == 200
        assert o["payload"] == r["payload"]


def test_framing_survives_warc_marker_in_payload():
    # offset-driven framing: a payload that CONTAINS a full record separator
    # + version line must not split the record (regex/scan parsers fail this)
    evil = "quoting the spec:\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nend"
    out = W.parse_warc(W.build_warc_file([rec(0, evil), rec(1, "next")]))
    assert [o["payload"] for o in out] == [evil, "next"]


def test_utf8_payload_roundtrip():
    s = "acentuación y ñandú — четыре байта \U0001f600"
    out = W.parse_warc(W.build_warc_file([rec(0, s)]))
    assert out[0]["payload"] == s


def test_truncated_body_raises():
    blob = W.build_warc_file([rec(0, "full body here")])
    with pytest.raises(ValueError):
        W.parse_warc(blob[:-10])


def test_missing_content_length_raises():
    blob = W.build_warc_file([rec(0, "x")]).replace(
        b"Content-Length", b"Content-Elsewhere", 1)
    with pytest.raises(ValueError):
        W.parse_warc(blob)


def test_non_warc_prefix_raises():
    with pytest.raises(ValueError):
        W.parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_non_response_records_skipped():
    # hand-build a warcinfo record followed by a response: only the
    # response surfaces, and Content-Length still frames the skip
    info_body = b"software: test\r\n"
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            + b"Content-Length: " + str(len(info_body)).encode() + b"\r\n\r\n"
            + info_body + b"\r\n\r\n")
    blob = info + W.build_warc_file([rec(7, "the real page")])
    out = W.parse_warc(blob)
    assert len(out) == 1 and out[0]["payload"] == "the real page"


def test_spark_archive_stages(spark):
    rows = [(i, f"urn:r{i}", f"https://h/{i}", "2026-01-01T00:00:00Z",
             "text/html; charset=utf-8", f"body of doc {i} " * (i + 1))
            for i in range(10)]
    df = spark.createDataFrame(
        rows, "doc_id long, record_id string, target_uri string, "
              "warc_date string, content_type string, payload string")
    archives = W.build_warc_archives(df, n_files=3)
    got = {(r.file_id, r.rec_index): r
           for r in W.warc_records(archives).collect()}
    assert len(got) == 10
    for i in range(10):
        fid = i % 3
        idx = sorted(j for j in range(10) if j % 3 == fid).index(i)
        r = got[(fid, idx)]
        assert r.record_id == f"urn:r{i}"
        assert r.payload == f"body of doc {i} " * (i + 1)
        assert r.http_status == 200
