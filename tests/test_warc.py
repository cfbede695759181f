"""WARC ingest: roundtrip, gzip, malformed tolerance, pipeline flow."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sparkspatial import warc


def _records():
    return [
        ("https://a.example/1", "2024-03-01T10:00:00Z", b"<html>alpha</html>"),
        ("https://b.example/2", "2024-03-01T10:05:00.500Z",
         b"<html>beta page</html>"),
        ("https://c.example/3", "2024-03-01T10:10:00Z", b""),
    ]


def test_warc_roundtrip_plain_and_gzip(spark, tmp_path):
    for name, compress in (("a.warc", False), ("a.warc.gz", True)):
        p = tmp_path / name
        p.write_bytes(warc.encode_warc(_records(), compress=compress))
        got = {r.url: (r.warc_ts, bytes(r.html), r.n_bytes)
               for r in warc.read_warc(spark, str(p)).collect()}
        assert set(got) == {u for u, _, _ in _records()}
        assert got["https://a.example/1"] == (
            datetime.datetime(2024, 3, 1, 10, 0, 0),
            b"<html>alpha</html>", 18)
        assert got["https://b.example/2"][0] == \
            datetime.datetime(2024, 3, 1, 10, 5, 0, 500000)
        assert got["https://c.example/3"][1] == b""


def test_warc_skips_non_response_and_malformed(spark, tmp_path):
    good = warc.encode_warc(_records()[:1])
    warcinfo = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    junk = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: oops\r\n\r\n"
    p = tmp_path / "mixed.warc"
    p.write_bytes(warcinfo + good + junk)
    got = warc.read_warc(spark, str(p)).collect()
    assert len(got) == 1 and got[0].url == "https://a.example/1"


def test_warc_resync_ignores_quoted_header_in_body(spark, tmp_path):
    """After a corrupt Content-Length, resync must anchor on a true
    record boundary (\\r\\n\\r\\n + 'WARC/<digit>.'): an HTML body that
    QUOTES a WARC header must not yield a phantom row (ADVICE r2)."""
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://bad.example/\r\n"
           b"Content-Length: oops\r\n\r\n"
           b"<html><pre>a quoted record: WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: https://phantom.example/\r\n"
           b"Content-Length: 4\r\n\r\njunk</pre></html>\r\n\r\n")
    good = warc.encode_warc(_records()[:1])
    p = tmp_path / "resync.warc"
    p.write_bytes(bad + good)
    got = warc.read_warc(spark, str(p)).collect()
    assert [r.url for r in got] == ["https://a.example/1"]


def test_warc_feeds_text_pipeline(spark, tmp_path):
    """WARC -> extract_text -> token counting: the ingest feeds the
    corpus operators (with an exchange separating the Python
    stages)."""
    from sparkspatial import extract, text

    p = tmp_path / "c.warc"
    p.write_bytes(warc.encode_warc(
        [("https://d.example/x", "2024-01-01T00:00:00Z",
          b"<html><body>quick brown fox</body></html>")]))
    # exchange between the two Python stages (ingest parse, text
    # extraction) — never two chained Python stages in one task
    pages = warc.read_warc(spark, str(p)).repartition(2)
    out = extract.extract_text_udf(pages, "html")
    row = out.selectExpr(
        "text_extracted",
        text.token_count_sql("text_extracted", "spark") + " AS n"
    ).collect()[0]
    assert row.text_extracted == "quick brown fox" and row.n == 3
