"""HTML boilerplate strip + main-content extraction (functions/html.py)."""

import pytest
from pyspark.sql import functions as F

from api_ocr_spark.functions import html as H


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        # 0: classic page — article must beat nav/footer/link-list
        (0, "<html><body>"
            "<nav><a href='/'>home</a> <a href='/a'>archive</a></nav>"
            "<div><p>the actual article body with plenty of words to win</p></div>"
            "<div><a href='/1'>wordy link one</a> <a href='/2'>wordy link two</a>"
            " <a href='/3'>wordy link three</a></div>"
            "<footer>contact</footer></body></html>"),
        # 1: script/style/comment content must not leak into any block
        (1, "<html><head><script>var hidden = 'should never appear';</script>"
            "<style>.x { color: red }</style></head><body>"
            "<!-- hidden comment words --><p>visible body text here</p>"
            "</body></html>"),
        # 2: entities + nested inline tags inside the winning block
        (2, "<div><p>fish &amp; chips <b>cost</b> &lt;5&gt; &quot;euros&quot;"
            " &#39;cheap&#39;&nbsp;today</p></div>"),
        # 3: tie between two identical blocks -> earliest wins
        (3, "<div><p>same words here</p><p>same words here</p></div>"),
        # 4: anchor text with nested tags counts fully toward link density
        (4, "<div><a href='/x'><b>bold link words</b></a> tail</div>"
            "<div>plain body words that should win easily</div>"),
    ]
    return spark.createDataFrame(rows, "doc_id long, html string")


@pytest.fixture(scope="module")
def extracted(pages):
    return {r.doc_id: r for r in H.html_main_content(pages).collect()}


def test_article_beats_boilerplate(extracted):
    r = extracted[0]
    assert r.main_text == "the actual article body with plenty of words to win"
    # nav + link-list + footer blocks all exist but lose
    assert r.n_blocks >= 4


def test_script_style_comment_removed(extracted):
    r = extracted[1]
    assert r.main_text == "visible body text here"
    assert "hidden" not in r.main_text


def test_entities_and_inline_tags(extracted):
    assert extracted[2].main_text == "fish & chips cost <5> \"euros\" 'cheap' today"


def test_tie_breaks_to_earliest_block(extracted):
    r = extracted[3]
    assert r.main_text == "same words here"
    assert r.n_blocks == 2


def test_link_density_penalty(extracted):
    r = extracted[4]
    assert r.main_text == "plain body words that should win easily"


def test_anchor_text_len_counts_nested(spark):
    df = spark.createDataFrame(
        [("<a href='/x'><b>ab</b> cd</a> and <a>efg</a>",)], "frag string")
    got = df.select(H.anchor_text_len(F.col("frag")).alias("n")).first().n
    assert got == len("ab cd") + len("efg")


def test_dom_strategy_prefers_article(spark):
    """<article> restricts the argmax even when a bigger block exists
    outside it; pages without a container fall back to density; an
    article holding only links (no visible text after the anchor pass
    still counts as visible here — links ARE text) stays dom-scoped,
    but an EMPTY article falls back."""
    rows = [
        (0, "<article><p>short article text</p></article>"
            "<div>a much longer distractor block outside the article that "
            "would win on raw density</div>"),
        (1, "<div>no container here so density picks this block</div>"),
        (2, "<main><p>main works like article</p></main><div>longer other "
            "text block that density alone would choose</div>"),
        (3, "<article>   </article><div>fallback wins on empty article</div>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in H.html_main_content_dom(df).collect()}
    assert got[0].strategy == "dom"
    assert got[0].main_text == "short article text"
    assert got[1].strategy == "density"
    assert got[1].main_text == "no container here so density picks this block"
    assert got[2].strategy == "dom"
    assert got[2].main_text == "main works like article"
    assert got[3].strategy == "density"
    assert got[3].main_text == "fallback wins on empty article"


def test_dom_strategy_on_synthesized_corpus(spark):
    """Over the oracle fixture: even ids extract via 'dom', odd via
    'density', and BOTH recover the article text."""
    rows = [(i, f"palabra{i} " + "cuerpo del documento " * 4) for i in range(4)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id",
        H.synthesize_html(F.col("text"), F.col("doc_id"),
                          article_when=(F.col("doc_id") % 2 == 0)).alias("html"))
    got = {r.doc_id: r for r in H.html_main_content_dom(wrapped).collect()}
    for i, t in rows:
        assert got[i].main_text == t.strip()
        assert got[i].strategy == ("dom" if i % 2 == 0 else "density")


def test_boilerpipe_tree_branches(spark):
    """Pin the NumWordsRulesClassifier over the synthesized lede fixture:
    block order is title(2w) → nav(4w, ld=1) → lede(6w) → content →
    related(9w, ld=1) → footer(3w). Expected labels trace every branch:
    nav/related die on ld>1/3; title dies in the prev_ld<=0.5556 arm with
    all three counts small; footer dies in the prev_ld>0.5556 arm; the
    lede keeps iff the NEXT block (content) has >17 words; content keeps
    via words>16 when long, else via prev_words(lede)=6>4."""
    long_text = "w" + " w" * 29          # 30 words > 17: lede kept
    short_text = "one two three four"    # 4 words <= 17: lede dropped
    docs = spark.createDataFrame(
        [(0, long_text), (1, short_text)], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id",
        H.synthesize_html(F.col("text"), F.col("doc_id"),
                          lede=True).alias("html"))
    lede = "Editorial summary follows below here today."

    blocks = H.classify_blocks(wrapped).collect()
    labels = {(r.doc_id, r.txt): r.is_content for r in blocks}
    assert labels[(0, lede)] is True          # next_words=30 > 17
    assert labels[(1, lede)] is False         # next_words=4 <= 17
    assert labels[(0, long_text)] is True     # words>16 arm
    assert labels[(1, short_text)] is True    # prev_words=6>4 arm
    for did in (0, 1):
        assert labels[(did, f"doc {did}")] is False        # title
        assert labels[(did, "terms & legal")] is False     # footer

    got = {r.doc_id: r for r in H.html_boilerpipe(wrapped).collect()}
    assert got[0].content_text == f"{lede} {long_text}"
    assert got[0].n_content == 2 and got[0].n_boiler == 4
    assert got[0].content_words == 6 + 30
    assert got[1].content_text == short_text
    assert got[1].n_content == 1 and got[1].n_boiler == 5


def test_boilerpipe_empty_result_is_empty_string(spark):
    """A page whose only block is short and link-dense keeps nothing —
    content_text must be '' (not NULL), matching the oracle's coalesce."""
    df = spark.createDataFrame(
        [(0, "<div><a href='/'>tiny link</a></div>")], "doc_id long, html string")
    r = H.html_boilerpipe(df).first()
    assert r.content_text == "" and r.n_content == 0 and r.n_boiler == 1


def test_boilerpipe_arrays_equals_windowed(spark):
    """The shuffle-free array-native twin must be row-identical to the
    windowed form over the fixture corpus AND degenerate pages (all-empty
    blocks → doc dropped by both; nothing kept → '' by both)."""
    docs = spark.createDataFrame(
        [(i, f"word{i} " + "cuerpo del documento extendido " * (i + 1))
         for i in range(8)], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id",
        H.synthesize_html(F.col("text"), F.col("doc_id"),
                          lede=True).alias("html"))
    degenerate = spark.createDataFrame(
        [(100, "<div>   </div><p></p>"),                 # all-empty blocks
         (101, "<div><a href='/'>x</a></div>")],          # kept-nothing page
        "doc_id long, html string")
    both = wrapped.unionByName(degenerate)
    a = sorted(H.html_boilerpipe(both).collect())
    b = sorted(H.html_boilerpipe_arrays(both).collect())
    assert a == b
    ids = {r.doc_id for r in b}
    assert 100 not in ids and 101 in ids


def test_boilerpipe_streaming_matches_batch(spark, tmp_path):
    """The array-native form has no window/aggregation, so it runs
    unchanged as a stateless Structured Streaming stage — HTML extraction
    joins OCR as a streaming-proven tier. Parity vs batch on the same
    rows."""
    import os

    docs = spark.createDataFrame(
        [(i, f"token{i} " + "contenido principal del documento " * (i + 2))
         for i in range(6)], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id",
        H.synthesize_html(F.col("text"), F.col("doc_id"),
                          lede=True).alias("html"))
    in_dir = os.path.join(str(tmp_path), "bp_stream_in")
    wrapped.write.parquet(in_dir)
    src = spark.readStream.schema(wrapped.schema).parquet(in_dir)
    q = (H.html_boilerpipe_arrays(src)
         .writeStream.format("memory").queryName("bp_stream")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(spark.table("bp_stream").collect())
    batch = sorted(H.html_boilerpipe_arrays(wrapped).collect())
    assert got == batch and len(got) == 6


def test_extract_links(spark):
    """Hrefs + visible anchor text in document order; nested inline tags
    stripped from anchor text; anchors without href are skipped (pattern
    requires the attribute); internal flag on path-relative hrefs."""
    df = spark.createDataFrame(
        [(0, "<nav><a href=\"/home\">go <b>home</b></a>"
             "<a href=\"https://x.example/p\">ext&amp;ernal</a>"
             "<a name='no-href'>skipped</a></nav>"
             "<p><a href=\"/end\">last</a></p>")],
        "doc_id long, html string")
    rows = H.extract_links(df).orderBy("link_pos").collect()
    assert [(r.link_pos, r.href, r.anchor_text, r.is_internal)
            for r in rows] == [
        (0, "/home", "go home", 1),
        (1, "https://x.example/p", "ext&ernal", 0),
        (2, "/end", "last", 1),
    ]


def test_extract_links_on_synthesized_corpus(spark):
    """The oracle fixture yields exactly 5 internal links per doc in nav →
    related order, with doc-borrowed words in the anchor texts."""
    docs = spark.createDataFrame(
        [(3, "palabra inicial del cuerpo")], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id", H.synthesize_html(F.col("text"), F.col("doc_id")).alias("html"))
    rows = H.extract_links(wrapped).orderBy("link_pos").collect()
    assert [r.href for r in rows] == ["/", "/t", "/c", "/r1", "/r2"]
    assert rows[1].anchor_text == "palabra archive"
    assert all(r.is_internal == 1 for r in rows)


def test_extract_metadata(spark):
    """Field extraction incl. absent-field '' convention and heading
    census; title words counted on the VISIBLE title text."""
    rows = [
        (0, "<html lang=\"es\"><head><title> Mi <b>Gran</b> Pagina </title>"
            "<meta name=\"description\" content=\"desc corta\">"
            "<link rel=\"canonical\" href=\"/p/0\"></head>"
            "<body><h1>uno</h1><h2>dos</h2><h3>tres</h3></body></html>"),
        (1, "<html><head></head><body><p>no metadata at all</p></body></html>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r.doc_id: r for r in H.extract_metadata(df).collect()}
    r0 = got[0]
    assert r0.title == "Mi Gran Pagina" and r0.title_words == 3
    assert r0.description == "desc corta"
    assert r0.canonical == "/p/0"
    assert r0.lang == "es"
    assert r0.n_headings == 3
    r1 = got[1]
    assert (r1.title, r1.description, r1.canonical, r1.lang) == ("", "", "", "")
    assert r1.n_headings == 0 and r1.title_words == 0


def test_chunk_pack(spark):
    """Prefix-sum packing: sentences never split; chunk_id advances when
    the words-before prefix crosses the cap; single-sentence overruns stay
    one chunk."""
    from api_ocr_spark.functions import text as T

    rows = [
        # 4 sentences of 3 words each, cap 6 → prefix 0,3,6,9 → chunks 0,0,1,1
        (0, "a b c. d e f. g h i. j k l."),
        # one 10-word sentence, cap 6 → one chunk, overrun allowed
        (1, "w w w w w w w w w w"),
        # boundary punctuation variants and double spaces
        (2, "uno dos! tres cuatro? cinco seis."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.chunk_pack(df, cap_words=6)
    got = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert got[(0, 0)].chunk_text == "a b c. d e f."
    assert got[(0, 1)].chunk_text == "g h i. j k l."
    assert got[(0, 0)].n_sentences == 2 and got[(0, 0)].n_words == 6
    assert got[(1, 0)].n_words == 10 and got[(1, 0)].n_sentences == 1
    assert got[(2, 0)].chunk_text == "uno dos! tres cuatro? cinco seis."
    assert got[(2, 0)].n_sentences == 3
    assert len(got) == 4


def test_split_sentences_keeps_punct_and_drops_empties(spark):
    from api_ocr_spark.functions import text as T

    df = spark.createDataFrame([("Hola. Que tal? Bien!  ",)], "t string")
    got = df.select(T.split_sentences(F.col("t")).alias("s")).first().s
    assert got == ["Hola.", "Que tal?", "Bien!"]


def test_synthesized_wrapper_recovers_text(spark):
    """End-to-end over the oracle fixture: the extractor recovers the
    article text from the synthesized wrapper for corpus-length docs."""
    rows = [(7, "alpha beta gamma " * 4), (8, "uno dos tres cuatro " * 5)]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string")
    wrapped = docs.select(
        "doc_id", H.synthesize_html(F.col("text"), F.col("doc_id")).alias("html"))
    out = {r.doc_id: r.main_text for r in H.html_main_content(wrapped).collect()}
    assert out == {i: t.strip() for i, t in rows}


def test_extract_tables_structure_and_edge_shapes(spark):
    html = (
        '<body>'
        # decoy inside a script must not be extracted
        '<script>var x="<table><tr><td>ghost</td></tr></table>";</script>'
        # thead/tbody wrappers are transparent (attrs must start with
        # whitespace, so <thead> cannot match the <t[dh]> cell shape)
        '<table id="a"><thead><tr><th>H1</th><th scope="col">H2</th></tr>'
        '</thead><tbody>'
        '<tr><td><b>bold</b> tail</td><td></td><td>c &amp; d</td></tr>'
        '</tbody></table>'
        '<TABLE><TR><TD>upper</TD></TR></TABLE>'
        '</body>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = sorted(
        ((r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell_text)
         for r in H.extract_tables(df).collect()))
    assert rows == [
        (0, 0, 0, True, "H1"),
        (0, 0, 1, True, "H2"),
        (0, 1, 0, False, "bold tail"),   # inline tag flattened
        (0, 1, 1, False, ""),            # empty cell
        (0, 1, 2, False, "c & d"),       # entity unescaped; ragged row
        (1, 0, 0, False, "upper"),       # case-insensitive tags
    ]


def test_extract_tables_no_tables_yields_no_rows(spark):
    df = spark.createDataFrame(
        [(1, "<body><p>tableau, not a table tag</p></body>")],
        "doc_id long, html string")
    assert H.extract_tables(df).count() == 0


def test_extract_outline_numbering_resets_and_skips(spark):
    html = ("<body><h1>One</h1><p>a b c</p>"
            "<h2>One-A</h2><p>d e</p>"
            "<h3>One-A-i</h3>x"
            "<h2>One-B</h2>y z"
            "<h1>Two</h1><p>fin</p>"
            "<h3>Two-skip</h3>tail</body>")
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = [(r.pos, r.level, r.section_path, r.title, r.n_body_words)
            for r in H.extract_outline(df).orderBy("pos").collect()]
    assert rows == [
        (0, 1, "1", "One", 3),
        (1, 2, "1.1", "One-A", 2),
        (2, 3, "1.1.1", "One-A-i", 1),
        (3, 2, "1.2", "One-B", 2),      # h3 above does not break h2 numbering
        (4, 1, "2", "Two", 1),          # second h1 resets h2/h3 counters
        (5, 3, "2.0.1", "Two-skip", 1),  # skipped level -> 0 placeholder
    ]


def test_tables_to_markdown_exact(spark):
    """Exact GFM output: header separator, ragged-row padding to max
    width, pipe escaping inside cells, and no separator without <th>."""
    from api_ocr_spark.functions import html as H

    page = ('<table><tr><th>a</th><th>b|c</th></tr>'
            '<tr><td>1</td></tr>'
            '<tr><td>x</td><td>y</td><td>z</td></tr></table>'
            '<table><tr><td>p</td><td>q</td></tr></table>')
    df = spark.createDataFrame([(7, page)], "doc_id bigint, html string")
    out = {r.table_idx: r for r in
           H.tables_to_markdown(H.extract_tables(df)).collect()}
    t0 = out[0]
    assert (t0.n_rows, t0.n_cols) == (3, 3)
    assert t0.markdown == (
        "| a | b\\|c |  |\n"
        "| --- | --- | --- |\n"
        "| 1 |  |  |\n"
        "| x | y | z |")
    t1 = out[1]
    assert (t1.n_rows, t1.n_cols) == (1, 2)
    assert t1.markdown == "| p | q |"
