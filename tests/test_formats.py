"""Source-adapter round-trips on tiny synthetic files — the reference's
reader tests (java/test/org/hedera/TestWikiETLReaders.java,
TestLocalWikiRevisionTextInputFormat.java) translated to Spark sources."""

from __future__ import annotations

import textwrap

MINI_DUMP = textwrap.dedent(
    """\
    <mediawiki>
      <page>
        <title>Alpha</title>
        <ns>0</ns>
        <id>10</id>
        <revision>
          <id>100</id>
          <timestamp>2006-01-01T10:00:00Z</timestamp>
          <contributor><username>alice</username><id>7</id></contributor>
          <comment>start</comment>
          <text>hello world</text>
        </revision>
        <revision>
          <id>101</id>
          <parentid>100</parentid>
          <timestamp>2006-02-01T10:00:00Z</timestamp>
          <contributor><ip>127.0.0.1</ip></contributor>
          <comment>edit</comment>
          <text>hello brave world</text>
        </revision>
      </page>
      <page>
        <title>Talk:Alpha</title>
        <ns>1</ns>
        <id>11</id>
        <revision>
          <id>200</id>
          <timestamp>2007-01-01T00:00:00Z</timestamp>
          <contributor><username>bob</username><id>8</id></contributor>
          <comment>talk</comment>
          <text>discussion</text>
        </revision>
      </page>
    </mediawiki>
    """
)

MINI_WARC = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/a\r\n"
    "WARC-Date: 2009-01-01T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:1>\r\n"
    "Content-Length: 11\r\n"
    "\r\n"
    "hello warc!\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/b\r\n"
    "WARC-Date: 2009-01-02T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:2>\r\n"
    "Content-Length: 6\r\n"
    "\r\n"
    "second\r\n"
)


def test_read_revision_xml(spark, tmp_path):
    from hedera_spark.sources.formats import (
        filter_time_span,
        read_revision_xml,
        skip_non_articles,
    )

    p = tmp_path / "dump.xml"
    p.write_text(MINI_DUMP)
    revs = read_revision_xml(spark, str(p))
    rows = {r["rev_id"]: r for r in revs.collect()}
    assert set(rows) == {100, 101, 200}
    assert rows[100]["page_title"] == "Alpha"
    assert rows[100]["parent_id"] == 0
    assert rows[101]["parent_id"] == 100
    assert rows[101]["user"] == "127.0.0.1"
    assert rows[200]["page_namespace"] == 1
    assert rows[100]["text"] == "hello world"

    arts = skip_non_articles(revs)
    assert {r["rev_id"] for r in arts.collect()} == {100, 101}

    span = filter_time_span(revs, "2006-01-15", "2007-06-01")
    assert {r["rev_id"] for r in span.collect()} == {101, 200}


def test_xml_dump_to_json_roundtrip(spark, tmp_path):
    from hedera_spark.sources.formats import read_json_revisions, xml_dump_to_json

    p = tmp_path / "dump.xml"
    p.write_text(MINI_DUMP)
    out = tmp_path / "json_out"
    xml_dump_to_json(spark, str(p), str(out))
    back = read_json_revisions(spark, str(out))
    assert back.count() == 3
    assert {"page_id", "rev_id", "parent_id", "text"} <= set(back.columns)


def test_read_warc(spark, tmp_path):
    from hedera_spark.sources.formats import read_warc

    p = tmp_path / "mini.warc"
    p.write_text(MINI_WARC)
    recs = read_warc(spark, str(p)).collect()
    assert len(recs) == 2
    by_uri = {r["warc_target_uri"]: r for r in recs}
    assert by_uri["http://example.com/a"]["content_length"] == 11
    assert by_uri["http://example.com/a"]["payload"].startswith("hello warc!")
    assert by_uri["http://example.com/b"]["warc_type"] == "response"


def test_read_filenames(spark, tmp_path):
    from hedera_spark.sources.formats import read_filenames

    (tmp_path / "a.txt").write_text("x")
    (tmp_path / "b.txt").write_text("yz")
    df = read_filenames(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2
    assert {r["path"].rsplit("/", 1)[1] for r in rows} == {"a.txt", "b.txt"}


def test_read_revision_xml_tolerates_malformed_pages(spark, tmp_path):
    """A corrupt page blob must be dropped, not crash the read or emit
    ghost rows."""
    from hedera_spark.sources.formats import read_revision_xml

    corrupt = MINI_DUMP.replace(
        "<title>Talk:Alpha</title>", "<title>Talk:Alpha</badtag>"
    )
    p = tmp_path / "bad.xml"
    p.write_text(corrupt)
    revs = read_revision_xml(spark, str(p)).collect()
    ids = {r["rev_id"] for r in revs}
    assert {100, 101} <= ids  # intact page fully parsed
    assert all(r["page_id"] is not None for r in revs)


def test_read_revision_xml_bz2(spark, tmp_path):
    """The reference's primary real-world input is the bz2-compressed dump
    (io/input/WikiRevision*InputFormat.java run over *.xml.bz2); Spark's
    text source decodes the codec by extension, so the same reader handles
    compressed dumps with no extra code — assert identical parse results."""
    import bz2

    from hedera_spark.sources.formats import read_revision_xml

    plain = tmp_path / "dump.xml"
    plain.write_text(MINI_DUMP)
    packed = tmp_path / "dump2" / "dump.xml.bz2"
    packed.parent.mkdir()
    packed.write_bytes(bz2.compress(MINI_DUMP.encode()))

    a = read_revision_xml(spark, str(plain)).orderBy("rev_id").collect()
    b = read_revision_xml(spark, str(packed)).orderBy("rev_id").collect()
    assert len(a) == 3
    assert a == b


def test_read_pageviews_ez_decodes_compact_timeseries(spark, tmp_path):
    """Hand-built pagecounts-ez lines: the reader must filter non-project
    lines and namespace titles, normalize titles (anchor cut, underscore
    trim, capitalization), and decode the compact day/hour series — day
    'A'=1st .. '_'=31st, hour 'A'=0h .. 'X'=23h."""
    raw = "\n".join(
        [
            "# comment line ignored",
            "de.z Ignored_project 5 AA5",
            "en.z Category:Skipped 9 AA9",
            "en.z main_page#History 33 AB12CX21",  # -> Main_page, day 1
            "en.z _Alan_Turing_ 7 _X7",  # underscore trim, day 31 hour 23
            "en.z Style.css 4 AA4",  # extension filtered
            "en.z Graph 10 BA3,CB7",  # two day segments
        ]
    )
    src = tmp_path / "pagecounts-2014-01-views-ge-5"
    src.write_text(raw)

    from hedera_spark.sources.formats import read_pageviews_ez

    rows = {
        (r["title"], r["day_of_month"], r["hour"]): r
        for r in read_pageviews_ez(spark, str(src)).collect()
    }
    assert set(rows) == {
        ("Main_page", 1, 1),
        ("Main_page", 1, 23),
        ("Alan_Turing", 31, 23),
        ("Graph", 2, 0),
        ("Graph", 3, 1),
    }
    assert rows[("Main_page", 1, 1)]["views"] == 12
    assert rows[("Main_page", 1, 23)]["views"] == 21
    assert rows[("Main_page", 1, 1)]["total"] == 33
    assert rows[("Alan_Turing", 31, 23)]["views"] == 7
    assert rows[("Graph", 2, 0)]["views"] == 3
    assert rows[("Graph", 3, 1)]["views"] == 7


def test_read_common_log(spark, tmp_path):
    """Apache Common Log parity with the reference reader: '-' fields
    become NULL, the request line splits into method/resource/protocol,
    status/size are typed longs, epoch matches the bracketed timestamp,
    and unanchorable lines are dropped (bad-line tolerance)."""
    raw = "\n".join(
        [
            '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
            '"GET /apache_pb.gif HTTP/1.0" 200 2326',
            '10.0.0.5 - - [10/Oct/2000:13:55:37 -0700] '
            '"POST /form HTTP/1.1" 404 -',
            "this line is garbage and must be skipped",
            '192.168.1.9 ident bob [not-a-date] "-" 500 0',
        ]
    )
    src = tmp_path / "access.log"
    src.write_text(raw)

    from hedera_spark.sources.formats import read_common_log

    rows = {r["remote_address"]: r for r in read_common_log(spark, str(src)).collect()}
    assert set(rows) == {"127.0.0.1", "10.0.0.5", "192.168.1.9"}

    r1 = rows["127.0.0.1"]
    assert r1["remote_logname"] is None and r1["user_id"] == "frank"
    assert r1["method"] == "GET" and r1["resource"] == "/apache_pb.gif"
    assert r1["protocol"] == "HTTP/1.0"
    assert r1["status_code"] == 200 and r1["obj_size"] == 2326
    # 2000-10-10 13:55:36 -0700 == 2000-10-10 20:55:36 UTC
    assert r1["epoch_ms"] == 971211336000

    r2 = rows["10.0.0.5"]
    assert r2["obj_size"] is None and r2["status_code"] == 404
    assert r2["method"] == "POST"

    r3 = rows["192.168.1.9"]
    assert r3["request_line"] is None  # quoted "-" → null, ref isNull
    assert r3["method"] is None and r3["epoch_ms"] is None
    assert r3["remote_logname"] == "ident"


# a payload whose second line BEGINS with 'WARC/' — the adversarial case
# the splittable fast path mis-splits and the exact mode must not
TRAP_PAYLOAD = "line one\nWARC/1.0 is mentioned here\nline three"
TRAP_WARC = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/trap\r\n"
    "WARC-Date: 2009-01-01T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:9>\r\n"
    f"Content-Length: {len(TRAP_PAYLOAD.encode())}\r\n"
    "\r\n"
    f"{TRAP_PAYLOAD}\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: http://example.com/after\r\n"
    "WARC-Date: 2009-01-02T00:00:00Z\r\n"
    "WARC-Record-ID: <urn:uuid:10>\r\n"
    "Content-Length: 5\r\n"
    "\r\n"
    "tail!\r\n"
)


def test_read_warc_exact_mode_survives_warc_in_payload(spark, tmp_path):
    """exact=True consumes Content-Length bytes per record, so the
    'WARC/'-prefixed payload line round-trips byte-exact and the record
    count stays 2 — the reference's non-splittable sequential semantics
    (pig/load/ClueWeb09WarcLoader.java)."""
    from hedera_spark.sources.formats import read_warc

    p = tmp_path / "trap.warc"
    p.write_text(TRAP_WARC)
    recs = {r["warc_target_uri"]: r for r in read_warc(spark, str(p), exact=True).collect()}
    assert set(recs) == {"http://example.com/trap", "http://example.com/after"}
    assert recs["http://example.com/trap"]["payload"] == TRAP_PAYLOAD
    assert recs["http://example.com/after"]["payload"] == "tail!"
    # the fast path mis-splits this fixture (documented limitation):
    # the trap record's payload is cut at the embedded version line
    fast = {
        r["warc_target_uri"]: r for r in read_warc(spark, str(p)).collect()
    }
    assert fast["http://example.com/trap"]["payload"] != TRAP_PAYLOAD


def test_read_warc_exact_matches_fast_on_clean_archives(spark, tmp_path):
    """On a well-formed archive the two modes agree row-for-row."""
    from hedera_spark.sources.formats import read_warc

    p = tmp_path / "mini.warc"
    p.write_text(MINI_WARC)
    fast = sorted(
        map(tuple, read_warc(spark, str(p)).collect()),
    )
    exact = sorted(
        map(tuple, read_warc(spark, str(p), exact=True).collect()),
    )
    assert fast == exact
