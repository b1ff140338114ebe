"""One-off sanitizer element/attribute behaviors (reference:
test/selma_sanitizer_elements_test.rb and test/selma_sanitizer_test.rb)."""

import pytest

from selma_spark import sanitizer as S
from selma_spark.rewriter import Rewriter


def rw(html, config=None, **kw):
    if config is None and "sanitizer" not in kw:
        return Rewriter().rewrite(html)
    if config is not None:
        return Rewriter(sanitizer=config).rewrite(html)
    return Rewriter(**kw).rewrite(html)


# --- default config (selma_sanitizer_elements_test.rb:9-80) ---------------

def test_remove_nonallowlisted_leaving_safe_contents():
    assert rw('foo <b>bar</b> <strong><a href="#a">baz</a></strong> quux') == \
        "foo bar baz quux"
    assert rw('<script>alert("<xss>");</script>') == ""
    assert rw('<<script>script>alert("<xss>");</<script>>') == ""
    assert rw('< script <>> alert("<xss>");</script>') == \
        '< script <>> alert("");</script>'


def test_whitespace_wrapping():
    assert rw("foo<div>bar</div>baz") == "foo bar baz"
    assert rw("foo<br>bar<br>baz") == "foo bar baz"
    assert rw("foo<hr>bar<hr>baz") == "foo bar baz"


def test_several_imgs_in_a_row():
    src = '<img src="http://www.google.com/intl/en_ALL/images/logo.gif">' * 4
    assert rw(src) == ""


@pytest.mark.parametrize("tag", [
    "iframe", "math", "noembed", "noframes", "noscript", "svg", "xmp",
])
def test_remove_contents_of_removed_elements(tag):
    assert rw(f"<{tag}>hello! <script>alert(0)</script></{tag}>") == ""


def test_remove_contents_of_plaintext():
    assert rw("<plaintext>hello! <script>alert(0)</script>") == ""


def test_remove_contents_of_script():
    # embedded script start confuses the raw-text scan (pinned quirk)
    assert rw("<script>hello! <script>alert(0)</script></script>") == "</script>"


def test_remove_contents_of_style():
    assert rw("<style>hello! <script>alert(0)</script></style>") == ""


# --- basic config extras (elements_test.rb:118-130) -----------------------

def test_valueless_attributes():
    assert rw("foo <a href>foo</a> bar", S.BASIC) == "foo <a href>foo</a> bar"


def test_attribute_names_downcased_for_checks():
    assert rw('<a HREF="javascript:alert(\'foo\')">bar</a>', S.BASIC) == "<a>bar</a>"


# --- relaxed config extras (elements_test.rb:150-155) ---------------------

def test_special_chars_encoded_in_attribute_values():
    got = rw(
        '<a href="http://example.com" title="<b>&eacute;xamples</b> & things">foo</a>',
        S.RELAXED,
    )
    assert got == (
        '<a href="http://example.com" title="&lt;b&gt;éxamples&lt;/b&gt; '
        "&amp; things\">foo</a>"
    )


# --- custom configs (elements_test.rb:170-434) -----------------------------

def test_attributes_allowed_under_all_pseudo_element():
    assert rw("<p>bar</p>") == " bar "
    assert rw("<p>bar</p>", {"elements": ["p"], "attributes": {"all": ["class"]}}) == \
        "<p>bar</p>"
    assert rw("<p>bar</p>", {"elements": ["p"], "attributes": {"div": ["class"]}}) == \
        "<p>bar</p>"
    assert rw(
        "<p>bar</p>",
        {"elements": ["p"], "attributes": {"p": ["title"], "all": ["class"]}},
    ) == "<p>bar</p>"


def test_relative_urls_rejected_without_relative():
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": ["http"]}}}
    assert rw('<a href="/foo/bar">Link</a>', cfg) == "<a>Link</a>"


def test_relative_url_with_colon_in_later_path_segment():
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": [S.RELATIVE]}}}
    assert rw('<a href="/wiki/Special:Random">Random Page</a>', cfg) == \
        '<a href="/wiki/Special:Random">Random Page</a>'


def test_anchor_and_colon_cases():
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": [S.RELATIVE]}}}
    assert rw('<a href="#fn:1">Footnote 1</a>', cfg) == '<a href="#fn:1">Footnote 1</a>'
    assert rw('<a href="somepage#fn:1">Footnote 1</a>', cfg) == \
        '<a href="somepage#fn:1">Footnote 1</a>'
    assert rw('<a href="fn:1">Footnote 1</a>', cfg) == "<a>Footnote 1</a>"


def test_all_protocols_allowed_when_asked():
    html = (
        '<a href="/foo/bar">Link</a>\n'
        '<a href="http://wow.com/foo/bar">Link</a>\n'
        '<a href="https://wow.com/foo/bar">Link</a>\n'
        '<a href="ftp://wow.com/foo/bar">Link</a>\n'
        '<a href="ssh://127.0.0.1">Link</a>\n'
    )
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": S.ALL}}}
    assert rw(html, cfg) == html


def test_remove_contents_true_removes_all_filtered_subtrees():
    assert rw("foo bar <div>baz<span>quux</span></div>",
              {"remove_contents": True}) == "foo bar "


def test_remove_contents_array():
    assert rw(
        'foo bar <div>baz<span>quux</span> <b>hi</b><script>alert("hello!");</script></div>',
        {"remove_contents": ["script", "span"]},
    ) == "foo bar baz hi"


def test_remove_contents_rejects_non_bool_non_array():
    with pytest.raises(ValueError):
        Rewriter(sanitizer={"remove_contents": {"script"}})


def test_allowlisted_iframe_contents_emptied():
    assert rw("<iframe>hi <script>hello</script></iframe>",
              {"elements": ["iframe"]}) == "<iframe> </iframe>"


def test_data_attributes_not_allowed_by_default():
    assert rw('<b data-foo="bar"></b>', {"elements": ["b"]}) == "<b></b>"
    assert rw('<b class="foo" data-foo="bar"></b>',
              {"elements": ["b"], "attributes": {"b": ["class"]}}) == \
        '<b class="foo"></b>'


def test_explicit_data_attributes_allowed():
    cfg = {"elements": ["b"], "attributes": {"b": ["data-foo", "data-bar"]}}
    s = '<b data-foo="valid" data-bar="valid"></b>'
    assert rw(s, cfg) == s
    for bad in ('<b data-="invalid"></b>', '<b data-xml="invalid"></b>',
                '<b data-xmlfoo="invalid"></b>', '<b data-f:oo="valid"></b>',
                '<b data-f/oo="partial"></b>', '<b data-éfoo="valid"></b>'):
        assert rw(bad, cfg) == "<b></b>"


def test_protocols_case_insensitive():
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": ["https"]}}}
    html = '<a href="hTTpS://foo.com/">Text</a>'
    assert rw(html, cfg) == html
    assert rw('<a href="mailto:someone@example.com?Subject=Hello">Text</a>', cfg) == \
        "<a>Text</a>"


def test_protocols_checked_in_data_attributes():
    html = '<a data-url="mailto:someone@example.com">Text</a>'
    assert rw(html, {"elements": ["a"], "attributes": {"a": ["data-url"]},
                     "protocols": {"a": {"data-url": ["https"]}}}) == "<a>Text</a>"
    assert rw(html, {"elements": ["a"], "attributes": {"a": ["data-url"]},
                     "protocols": {"a": {"data-url": ["mailto"]}}}) == html


def test_meta_charset_forced_to_utf8():
    cfg = {"elements": ["html", "head", "meta", "body"],
           "attributes": {"meta": ["charset"]}}
    assert rw('<html><head><meta charset="utf-8"></head><body>Howdy!</body></html>',
              cfg) == '<html><head><meta charset="utf-8"></head><body>Howdy!</body></html>'
    cfg2 = {"elements": ["html", "meta"], "attributes": {"meta": ["charset"]}}
    assert rw('<html><meta charset="utf-8">Howdy!</html>', cfg2) == \
        '<html><meta charset="utf-8">Howdy!</html>'
    assert rw('<html><meta charset="us-ascii">Howdy!</html>', cfg2) == \
        '<html><meta charset="utf-8">Howdy!</html>'


def test_all_protocol_symbol_inside_array_raises():
    # reference: test/selma_maliciousness_test.rb:157-165
    with pytest.raises(ValueError):
        Rewriter(sanitizer={
            "elements": ["a"],
            "attributes": {"a": ["href"]},
            "protocols": {"a": {"href": [S.ALL]}},
        })


# --- selma_sanitizer_test.rb ------------------------------------------------

def test_keep_and_normalize_attributes():
    cfg = {"elements": ["a"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": ["ftp", "http", "https", "mailto", S.RELATIVE]}}}
    assert rw("<a href='https://google.com'>wow!</a>", cfg) == \
        '<a href="https://google.com">wow!</a>'
    assert rw("<a href='https://google.com' class='very'>wow!</a>", cfg) == \
        '<a href="https://google.com">wow!</a>'


def test_nil_sanitizer_without_handlers_raises():
    with pytest.raises(ValueError):
        Rewriter(sanitizer=None)


def test_non_standard_elements_share_the_unknown_slot():
    frag = (
        '<svg height="100" width="100">\n'
        '<circle cx="50" cy="50" r="40" stroke="black" stroke-width="3" fill="red" />\n'
        "</svg>\n"
    )
    cfg = {"elements": ["svg", "circle"],
           "attributes": {"svg": ["width"], "circle": ["cx", "cy", "r"]}}
    assert rw(frag, cfg) == \
        '<svg width="100">\n<circle cx="50" cy="50" r="40" />\n</svg>\n'


def test_fragment_with_limited_allowlist():
    got = rw(
        '<b>Lo<!-- comment -->rem</b> <a href="pants" title="foo">ipsum</a> '
        '<a href="http://foo.com/"><strong>dolor</strong></a> sit<br/>amet '
        '<script>alert("hello world");</script>',
        {"elements": ["html"]},
    )
    assert got == "Lorem ipsum dolor sitamet "


def test_fragments_containing_html_or_body():
    assert rw("<html><b>foo</b></html>") == "foo"
    assert rw("<body><b>foo</b></body>") == "foo"
    assert rw("<html><body><b>foo</b></body></html>") == "foo"
    assert rw("<!DOCTYPE html><html><body><b>foo</b></body></html>") == "foo"


def test_dangerous_iframe_contents_removed():
    assert rw(
        '<iframe src="https://www.youtube.com/embed/dXBohfjc4WA" width="680" '
        'height="480" allowfullscreen>hackerman</iframe>'
    ) == ""
