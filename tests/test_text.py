"""Text extraction: byte-identical invariant vs reference semantics.

Reference rules: src/text_filter.cpp:14-45 (join rule, script/style skip,
>=1000 errors => empty), src/parser.cpp:193-225 (HTTP header strip).
"""

from pisa_spark.functions.text import (
    count_parse_errors,
    extract_text_batch,
    strip_html,
    strip_http_headers,
)
from pisa_spark.sources.webtext import generate_pandas


def test_join_rule_space_between_nonempty_siblings():
    assert strip_html("<div>A<span>B</span>C</div>") == "A B C"


def test_join_rule_empty_child_adds_no_space():
    assert strip_html("<div>A<span></span>C</div>") == "A C"
    assert strip_html("<div><span></span>A</div>") == "A"


def test_whitespace_only_text_nodes_dropped():
    assert strip_html("<div><span>A</span> <span>B</span></div>") == "A B"
    assert strip_html("<body>\n<p>A</p>\n<p>B</p>\n</body>") == "A B"


def test_literal_inner_spaces_kept():
    # text nodes with non-whitespace content keep their raw spacing, and the
    # join rule still inserts a space before the next non-empty sibling
    assert strip_html("<p>Hello <b>world</b></p>") == "Hello  world"


def test_script_style_skipped():
    html = "<html><head><script>var x=1;</script><style>.c{}</style></head><body>hi</body></html>"
    assert strip_html(html) == "hi"


def test_entities_decoded():
    assert strip_html("<p>a &amp; b &lt;ok&gt;</p>") == "a & b <ok>"


def test_too_many_errors_returns_empty():
    broken = "<p>" + "& " * 1100 + "</p>"
    assert count_parse_errors(broken) >= 1000
    assert strip_html(broken) == ""


def test_http_header_strip():
    content = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    assert strip_http_headers(content) == "<p>x</p>"
    assert strip_http_headers("<p>x</p>") == "<p>x</p>"


def test_corpus_extraction_byte_identical():
    pdf = generate_pandas(400, seed=13)
    extracted = extract_text_batch(pdf["html"])
    mismatches = (extracted != pdf["text"]).sum()
    assert mismatches == 0


def test_broken_page_in_corpus_extracts_empty():
    pdf = generate_pandas(100, seed=13)
    assert (pdf["text"] == "").any()


# ---- fast scanner == DOM-oracle equivalence (strip_html is the linear
# scanner; strip_html_dom is the html.parser implementation of the same
# reference semantics, kept as the oracle)

_ADVERSARIAL = [
    "", "<", ">", "</>", "</ p >", "< notatag", "x<y", "5 < 6 > 3",
    "<em", "<a b='un", '<a b="unterminated<p>more</p>',
    "<a =b>", "<a 'x'>", "<123>", "<!>", "<!x>", "<!DOCTYPE", "<![",
    "<![CDATA[ x > y ]]>", "<![CDATA[", "<![if x]> y <![endif]>",
    "<![bogus z]>", "<?php echo '>' ?>", "<?", "<!--", "-->",
    "<!-- a -- >x", "<script>var x='</p>';</script>tail",
    "<script src='x'/>text", "<script>never closed",
    "<sCrIpT>x</ScRiPt>y", "</ script >", "<style>a{}</style>b",
    '<a href="y>z">w</a>', "<a b=c>", "<br/>", "a&amp;b", "&bogus;",
    "&nbsp;", "&#65;", "&", "a & b", "\x00", "  \t\n ",
]


def test_fast_scanner_equals_dom_on_vectors():
    from pisa_spark.functions.text import strip_html_dom

    for doc in _ADVERSARIAL:
        assert strip_html(doc) == strip_html_dom(doc), repr(doc)
    # and on concatenated pairs (boundary interactions)
    for a in _ADVERSARIAL[:20]:
        for b in _ADVERSARIAL[:20]:
            assert strip_html(a + b) == strip_html_dom(a + b), repr(a + b)


def test_fast_scanner_equals_dom_fuzz():
    import random

    from pisa_spark.functions.text import strip_html_dom

    random.seed(1234)
    for _ in range(4000):
        doc = "".join(random.choice(_ADVERSARIAL)
                      for _ in range(random.randint(1, 10)))
        assert strip_html(doc) == strip_html_dom(doc), repr(doc)
    alpha = list("<>!?/abA='\"& ;#-[]x\t\n\x00stylecriptCDATA")
    for _ in range(4000):
        doc = "".join(random.choice(alpha)
                      for _ in range(random.randint(0, 60)))
        assert strip_html(doc) == strip_html_dom(doc), repr(doc)


def test_fast_scanner_equals_dom_on_corpus():
    from pisa_spark.functions.text import strip_html_dom

    pdf = generate_pandas(300, seed=99)
    for b in pdf["html"]:
        h = bytes(b).decode("utf-8", "replace")
        assert strip_html(h) == strip_html_dom(h)
