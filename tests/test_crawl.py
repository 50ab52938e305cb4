"""Hand-built goldens for the crawl front door: HTML main-content
extraction (operators/html.py) and the WARC record source
(sources/warc.py).  The oracle entries in inventory/crawl.py verify
the template round-trip at corpus scale; these tests pin the edge
semantics the template can't reach — entities, nesting, malformed
markup, framing violations."""

from __future__ import annotations

import gzip
import io

import pytest

from robosystems_spark.operators.html import (
    extract_blocks,
    extract_main_text,
)
from robosystems_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_warc_file,
    split_http_response,
)

# ---------------------------------------------------------------------------
# HTML extraction
# ---------------------------------------------------------------------------


def test_html_basic_article_page():
    html = (
        "<html><head><title>T</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<article><h1>Head</h1><p>Main body text here.</p>"
        "<p>Second paragraph.</p></article>"
        "<footer>Copyright <a href='#'>Terms</a></footer></body></html>"
    )
    out = extract_main_text(html)
    assert out["title"] == "T"
    assert out["text"] == "Head\nMain body text here.\nSecond paragraph."
    assert out["n_blocks"] == 5
    assert out["n_boilerplate"] == 2  # nav (chrome) + footer (chrome)


def test_html_script_style_content_never_leaks():
    html = (
        "<body><script>document.write('<p>evil</p>')</script>"
        "<style>p:before{content:'x'}</style>"
        "<noscript><p>enable js</p></noscript>"
        "<template><p>tpl</p></template>"
        "<p>real</p></body>"
    )
    out = extract_main_text(html)
    assert out["text"] == "real"
    assert out["n_blocks"] == 1


def test_html_nested_skip_subtree():
    # an svg containing a <text> node and nested groups
    html = (
        "<body><svg><g><text>axis label</text></g></svg>"
        "<p>content</p></body>"
    )
    assert extract_main_text(html)["text"] == "content"


def test_html_entities_and_charrefs_decode():
    html = "<body><p>A &amp; B &lt;tag&gt; &#233;t&eacute;</p></body>"
    assert extract_main_text(html)["text"] == "A & B <tag> été"


def test_html_whitespace_collapses_like_rendering():
    html = "<body><p>  a\n   b\t\tc  </p></body>"
    assert extract_main_text(html)["text"] == "a b c"


def test_html_inline_markup_stays_in_block():
    html = "<body><p>one <b>two</b> <i>three</i> <span>four</span></p></body>"
    _, blocks = extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0]["text"] == "one two three four"


def test_html_br_breaks_text_not_block():
    _, blocks = extract_blocks("<body><p>a<br>b</p></body>")
    # br flushes 'a' then 'b' flushes at </p>: two blocks, both tag p
    assert [b["text"] for b in blocks] == ["a", "b"]
    assert all(b["tag"] == "p" for b in blocks)


def test_html_link_density_rule():
    # 'Tweet Share' = 11 chars, 10 linked -> density > 0.5 -> boiler
    html = (
        "<body><div><a href='#'>Tweet</a> <a href='#'>Share</a></div>"
        "<p>This paragraph has a <a href='x'>small link</a> inside a lot"
        " of surrounding prose so density stays low.</p></body>"
    )
    out = extract_main_text(html)
    assert out["n_boilerplate"] == 1
    assert out["text"].startswith("This paragraph")


def test_html_chrome_wins_over_heading():
    html = "<body><header><h1>Site Name</h1></header><p>content</p></body>"
    out = extract_main_text(html)
    assert out["text"] == "content"
    assert out["n_boilerplate"] == 1


def test_html_chrome_ends_at_close_tag():
    html = "<body><nav>menu items</nav><p>after nav</p></body>"
    _, blocks = extract_blocks(html)
    assert [(b["text"], b["chrome"]) for b in blocks] == [
        ("menu items", True),
        ("after nav", False),
    ]


def test_html_malformed_never_raises():
    for bad in (
        "",
        "<",
        "<p>unclosed",
        "</p></div>stray closers<p>x</p>",
        "<p>a < b and c > d</p>",
        "<body><p>text<script>open script",
        "\x00\x01<p>bin</p>",
        "<p><p><p>deep</p>",
    ):
        extract_main_text(bad)  # must not raise
    # unclosed tags still yield their text
    assert extract_main_text("<p>unclosed")["text"] == "unclosed"


def test_html_empty_blocks_vanish():
    out = extract_main_text(
        "<body><p></p><p>  </p><div></div><p>kept text</p></body>"
    )
    assert out["n_blocks"] == 1
    assert out["text"] == "kept text"


def test_html_min_chars_rule():
    out = extract_main_text("<body><p>·</p><p>real text</p></body>")
    assert out["text"] == "real text"
    assert out["n_boilerplate"] == 1


def test_html_title_not_a_block():
    out = extract_main_text(
        "<html><head><title>My  Title </title></head>"
        "<body><p>body</p></body></html>"
    )
    assert out["title"] == "My Title"
    assert out["n_blocks"] == 1


def test_html_whole_doc_link_density():
    # all blocks count toward page density, kept or not
    html = "<body><nav><a href='/'>abcde</a></nav><p>abcde</p></body>"
    out = extract_main_text(html)
    assert out["link_density"] == pytest.approx(0.5)


def test_html_extract_distributed(spark):
    from robosystems_spark.operators.html import html_blocks, html_extract

    df = spark.createDataFrame(
        [
            (1, "<body><nav><a href='/'>x</a></nav><p>hello world</p></body>"),
            (2, None),  # NULL html -> empty record, not a crash
        ],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert rows[1]["text"] == "hello world"
    assert rows[1]["n_blocks"] == 2 and rows[1]["n_boilerplate"] == 1
    assert rows[2]["text"] == "" and rows[2]["n_blocks"] == 0

    blocks = html_blocks(df).collect()
    assert [(b["tag"], b["is_boilerplate"]) for b in blocks] == [
        ("nav", True),
        ("p", False),
    ]


# ---------------------------------------------------------------------------
# WARC
# ---------------------------------------------------------------------------

_HTTP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>"


def _two_records(gz: bool) -> bytes:
    return build_warc(
        [
            {
                "warc_type": "warcinfo",
                "content_type": "application/warc-fields",
                "payload": b"software: fixture",
            },
            {
                "warc_type": "response",
                "target_uri": "http://example.com/a",
                "content_type": "application/http; msgtype=response",
                "payload": _HTTP,
            },
        ],
        per_record_gzip=gz,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = list(iter_warc_records(_two_records(gz)))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo",
        "response",
    ]
    assert recs[1]["headers"]["warc-target-uri"] == "http://example.com/a"
    status, headers, body = split_http_response(recs[1]["payload"])
    assert status == 200
    assert headers["content-type"] == "text/html"
    assert body == b"<p>hi</p>"


def test_warc_build_is_deterministic():
    assert _two_records(True) == _two_records(True)
    assert _two_records(False) == _two_records(False)


def test_warc_payload_may_contain_crlf_and_warc_lines():
    # framing is Content-Length-driven: a payload embedding what looks
    # like a record boundary must NOT desync the parser
    evil = b"x\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\ny"
    data = build_warc(
        [
            {"warc_type": "resource", "payload": evil},
            {"warc_type": "resource", "payload": b"tail"},
        ]
    )
    recs = list(iter_warc_records(data))
    assert [r["payload"] for r in recs] == [evil, b"tail"]


def test_warc_framing_violations_raise():
    good = build_warc([{"warc_type": "resource", "payload": b"abc"}])
    with pytest.raises(ValueError, match="CRLFCRLF"):
        list(iter_warc_records(good[:-3]))
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n\r\n\r\n"))
    # payload length pointing past EOF
    bad = good.replace(b"Content-Length: 3", b"Content-Length: 9999")
    with pytest.raises(ValueError, match="past EOF"):
        list(iter_warc_records(bad))


def test_warc_truncated_gzip_member_raises():
    data = _two_records(True)
    with pytest.raises(ValueError, match="gzip"):
        list(iter_warc_records(data[: len(data) - 5]))


def test_warc_non_http_payload_passthrough():
    status, headers, body = split_http_response(b"not http at all")
    assert status is None and headers == {} and body == b"not http at all"


def test_warc_parse_file_poison_row():
    rows = parse_warc_file("f.warc", b"garbage bytes")
    assert len(rows) == 1
    assert rows[0][0] == "f.warc" and rows[0][-1] is not None


def test_warc_read_warc_end_to_end(spark, tmp_path):
    from robosystems_spark.sources.warc import read_warc

    (tmp_path / "a.warc.gz").write_bytes(_two_records(True))
    (tmp_path / "b.warc").write_bytes(
        build_warc(
            [
                {
                    "warc_type": "response",
                    "target_uri": "http://example.com/b",
                    "payload": b"HTTP/1.1 404 Not Found\r\n\r\nmissing",
                }
            ]
        )
    )
    (tmp_path / "c.warc").write_bytes(b"corrupt")
    df = read_warc(spark, str(tmp_path)).cache()
    rows = df.collect()
    by_uri = {r["target_uri"]: r for r in rows if r["target_uri"]}
    assert by_uri["http://example.com/a"]["http_status"] == 200
    assert bytes(by_uri["http://example.com/a"]["body"]) == b"<p>hi</p>"
    assert by_uri["http://example.com/b"]["http_status"] == 404
    poison = [r for r in rows if r["error"] is not None]
    assert len(poison) == 1 and poison[0]["warc_file"].endswith("c.warc")
    # 2 records from a + 1 from b + 1 poison
    assert len(rows) == 4
    df.unpersist()


# ---------------------------------------------------------------------------
# URL canonicalization (operators/urls.py)
# ---------------------------------------------------------------------------


def test_url_normalize_rules(spark):
    from robosystems_spark.operators.urls import (
        normalize_url,
        registered_domain,
    )

    cases = [
        # (raw, canonical, domain)
        ("HTTP://WWW.Example.COM:80/a?b=2&a=1#x",
         "http://www.example.com/a?a=1&b=2", "example.com"),
        ("https://Example.com:443", "https://example.com/", "example.com"),
        # non-default port survives
        ("http://example.com:8080/p", "http://example.com:8080/p",
         "example.com"),
        # tracking params drop; 'referrer' is NOT 'ref'
        ("https://a.b.c.net/p?utm_source=x&utm_medium=y&fbclid=z&referrer=k",
         "https://a.b.c.net/p?referrer=k", "c.net"),
        # valueless tracking param drops too
        ("http://x.org/p?gclid&keep=1", "http://x.org/p?keep=1", "x.org"),
        # all params dropped -> no '?'
        ("http://x.org/p?utm_campaign=c", "http://x.org/p", "x.org"),
        # single-label host: domain is the host
        ("http://localhost:80/", "http://localhost/", "localhost"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(cases)],
        "i long, url string",
    )
    got = (
        df.select(
            "i",
            normalize_url("url").alias("c"),
            registered_domain("url").alias("d"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (_, want_c, want_d) in zip(got, cases):
        assert row["c"] == want_c, (row["c"], want_c)
        assert row["d"] == want_d, (row["d"], want_d)


def test_url_normalize_is_codegen_no_udf(spark):
    from robosystems_spark.operators.urls import normalize_url

    df = spark.createDataFrame([(1, "http://a.com/")], "i long, url string")
    plan = (
        df.select(normalize_url("url"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_domain_caps_bounds_and_determinism(spark):
    from robosystems_spark.operators.urls import domain_caps

    rows = [(i, f"http://site{i % 2}.com/p/{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = domain_caps(df, cap=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert set(by_dom) == {"site0.com", "site1.com"}
    for dom, rs in by_dom.items():
        assert len(rs) == 3
        assert sorted(r["domain_rank"] for r in rs) == [1, 2, 3]
        assert all(r["domain_total"] == 10 for r in rs)
        # lowest ids kept
        assert sorted(r["doc_id"] for r in rs) == sorted(
            [i for i in range(20) if f"site{i % 2}.com" == dom]
        )[:3]


def test_build_warc_duplicate_payloads_get_distinct_record_ids():
    """ADVICE r10: WARC-Record-ID derived from md5(payload) alone gave
    two identical payloads (same-page re-fetches) duplicate ids,
    violating ISO 28500 per-record uniqueness.  The id now mixes the
    record index + target URI + date, staying deterministic."""
    from robosystems_spark.sources.warc import build_warc, iter_warc_records

    recs = [
        {
            "warc_type": "response",
            "target_uri": "http://x.example/a",
            "payload": b"same bytes",
        },
        {
            "warc_type": "response",
            "target_uri": "http://x.example/a",
            "payload": b"same bytes",
        },
    ]
    blob = build_warc(recs)
    ids = [r["headers"]["warc-record-id"] for r in iter_warc_records(blob)]
    assert len(ids) == 2 and ids[0] != ids[1]
    # deterministic: same input -> same bytes
    assert build_warc(recs) == blob
