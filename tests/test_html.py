"""HTML -> text extraction (operators/html.py): parser behavior on messy
real-world markup, the block classifier, and the one-Arrow-stage plan."""

import pytest
from pyspark.sql import functions as F

from tilecloud_chain_spark.operators import html as H


def _extract_local(html_str, **kw):
    """Drive the same kernel the Arrow stage runs, locally."""
    max_ld = kw.get("max_link_density", 0.4)
    min_ch = kw.get("min_block_chars", 25)
    kept, dropped = [], 0
    for text, chars, link_chars in H._parse_blocks(html_str):
        if chars >= min_ch and link_chars <= max_ld * chars:
            kept.append(text)
        else:
            dropped += 1
    return "\n".join(kept), len(kept), dropped


def test_parser_skips_script_style_head_and_comments():
    doc = (
        "<html><head><title>never seen</title>"
        "<style>p { color: red }</style></head><body>"
        "<script>var s = '<p>markup inside a js string</p>';</script>"
        "<!-- a comment with <p>tags</p> inside -->"
        "<p>The only actual paragraph content of this document.</p>"
        "</body></html>"
    )
    want = "The only actual paragraph content of this document."
    assert H._parse_blocks(doc) == [(want, len(want), 0)]


def test_parser_inline_tags_do_not_split_blocks():
    doc = (
        "<p>Inline <b>bold</b>, <i>italic</i>, a <a href='/x'>link here</a>,"
        " and <span>spans</span> stay one block.</p>"
    )
    blocks = H._parse_blocks(doc)
    assert len(blocks) == 1
    text, chars, link_chars = blocks[0]
    assert text == (
        "Inline bold, italic, a link here, and spans stay one block."
    )
    assert link_chars == len("link here")


def test_parser_entities_br_and_unbalanced_markup():
    doc = (
        "<div>Tom &amp; Jerry &copy; 2026<br>second line</div>"
        "</section><p>after a stray close tag</p><p>unclosed final"
    )
    blocks = H._parse_blocks(doc)
    assert blocks[0][0] == "Tom & Jerry © 2026 second line"
    assert [b[0] for b in blocks[1:]] == [
        "after a stray close tag", "unclosed final",
    ]


def test_parser_whitespace_collapse_and_nesting():
    doc = (
        "<div>\n  outer   text\n  <p>  inner\tparagraph  </p>  tail  </div>"
    )
    assert [b[0] for b in H._parse_blocks(doc)] == [
        "outer text", "inner paragraph", "tail",
    ]


def test_extract_boilerplate_rules():
    doc = (
        "<body><nav><a href='/'>home</a> <a href='/a'>about</a> "
        "<a href='/c'>contact</a></nav>"
        "<h1>Short</h1>"
        "<p>A long enough paragraph of genuine article prose right here.</p>"
        "<p>See <a href='/ref'>this reference</a> for the full details of "
        "the argument made above.</p>"
        "<div><a href='/r1'>related post number one</a> "
        "<a href='/r2'>related post number two</a></div>"
        "</body>"
    )
    clean, kept, dropped = _extract_local(doc)
    # nav: link-dense AND short; h1: short; related: long but link-dense
    assert kept == 2 and dropped == 3
    assert clean == (
        "A long enough paragraph of genuine article prose right here.\n"
        "See this reference for the full details of the argument made above."
    )


def test_extract_empty_and_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "<p></p>"), (4, "plain text no markup at all here")],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in H.html_extract(df).collect()}
    for i in (1, 2, 3):
        assert out[i].clean_text == "" and out[i].n_blocks_kept == 0
    assert out[3].n_blocks_dropped == 0
    # bare text outside any tag is the implicit final block
    assert out[4].clean_text == "plain text no markup at all here"


def test_html_blocks_features(spark):
    doc = (
        "<p>first paragraph block</p>"
        "<div><a href='/x'>linked</a> plain</div>"
    )
    df = spark.createDataFrame([(7, doc)], "doc_id long, html string")
    rows = sorted(H.html_blocks(df).collect(), key=lambda r: r.block_idx)
    assert [(r.block_idx, r.text, r.chars, r.link_chars) for r in rows] == [
        (0, "first paragraph block", 21, 0),
        (1, "linked plain", 12, 6),
    ]
    assert rows[1].link_density == pytest.approx(0.5)


def test_extract_single_arrow_stage(spark):
    df = spark.createDataFrame(
        [(i, f"<p>some document body text number {i} long enough to keep</p>")
         for i in range(64)],
        "doc_id long, html string",
    )
    out = H.html_extract(df)
    assert out.filter(F.col("n_blocks_kept") == 1).count() == 64
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Python/Arrow stage, and no shuffle anywhere: the operator
    # is parse-classify-reassemble inside one mapInPandas pass
    assert plan.count("MapInPandas") == 1, plan
    assert "Exchange" not in plan, plan


def test_extract_agrees_with_local_kernel(spark):
    docs = [
        "<body><nav><a href='/'>one</a><a href='/b'>two</a></nav>"
        "<p>genuine prose paragraph long enough to clear the bar.</p></body>",
        "<div>Tom &amp; Jerry in a block that is long enough to keep.</div>",
        "<p>short</p>",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, html string"
    )
    got = {r.doc_id: (r.clean_text, r.n_blocks_kept, r.n_blocks_dropped)
           for r in H.html_extract(df).collect()}
    for i, d in enumerate(docs):
        assert got[i] == _extract_local(d), i
