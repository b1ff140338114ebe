"""Comment / doctype / parser edge cases (reference:
test/selma_sanitizer_comments_test.rb, test/selma_sanitizer_doctype_test.rb,
test/selma_sanitizer_parser_test.rb)."""

from selma_spark.rewriter import Rewriter


def rw(html, config):
    return Rewriter(sanitizer=config).rewrite(html)


NO_COMMENTS = {"allow_comments": False, "elements": ["div"]}
COMMENTS = {"allow_comments": True, "elements": ["div"]}


def test_removes_comments():
    assert rw("foo <!-- comment --> bar", NO_COMMENTS) == "foo  bar"
    assert rw("foo <!-- ", NO_COMMENTS) == "foo "
    assert rw("foo <!-- - -> bar", NO_COMMENTS) == "foo "
    assert rw("foo <!--\n\n\n\n-->bar", NO_COMMENTS) == "foo bar"
    assert rw("foo <!-- <!-- <!-- --> --> -->bar", NO_COMMENTS) == "foo  --> -->bar"
    assert rw("foo <div <!-- comment -->>bar</div>", NO_COMMENTS) == "foo "
    # comment markup inside <script> is text, not a comment
    assert rw("<script><!-- comment --></script>", NO_COMMENTS) == ""
    assert rw("<script><!-- comment --></script>",
              {"allow_comments": False, "elements": ["script"]}) == \
        "<script><!-- comment --></script>"


def test_keeps_comments():
    assert rw("foo <!-- comment --> bar", COMMENTS) == "foo <!-- comment --> bar"
    assert rw("foo <!-- ", COMMENTS) == "foo <!-- "
    assert rw("foo <!-- - -> bar", COMMENTS) == "foo <!-- - -> bar"
    assert rw("foo <!--\n\n\n\n-->bar", COMMENTS) == "foo <!--\n\n\n\n-->bar"
    assert rw("foo <!-- <!-- <!-- --> --> -->bar", COMMENTS) == \
        "foo <!-- <!-- <!-- --> --> -->bar"
    assert rw("foo <div <!-- comment -->>bar</div>", COMMENTS) == "foo "
    assert rw("<script><!-- comment --></script>",
              {"allow_comments": True, "elements": ["script"]}) == \
        "<script><!-- comment --></script>"


def test_removes_doctype():
    cfg = {"allow_doctype": False, "elements": ["html"]}
    assert rw("<!DOCTYPE html><html>foo</html>", cfg) == "<html>foo</html>"
    assert rw("<!DOCTYPE html>foo", cfg) == "foo"


def test_allows_doctype():
    cfg = {"allow_doctype": True, "elements": ["html"]}
    assert rw("<!DOCTYPE html><html>foo</html>", cfg) == \
        "<!DOCTYPE html><html>foo</html>"
    assert rw('<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><html>foo</html>',
              cfg) == '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.01//EN"><html>foo</html>'


def test_entities_left_alone():
    assert Rewriter().rewrite("&apos;&eacute;&amp;") == "&apos;&eacute;&amp;"
    assert Rewriter().rewrite("at&t") == "at&t"


def test_no_newlines_added():
    cfg = {"elements": ["div", "p"]}
    src = "<div>foo\n\n<p>bar</p><div>\nbaz</div></div><div>quux</div>"
    assert rw(src, cfg) == src


def test_unterminated_script_and_style():
    assert Rewriter().rewrite("foo <script>bar") == "foo "
    assert Rewriter().rewrite("foo <style>bar") == "foo "


def test_ambiguous_non_tag_brackets():
    assert Rewriter().rewrite("1 > 2 and 2 < 1") == "1 > 2 and 2 < 1"
    assert Rewriter().rewrite("OMG HAPPY BIRTHDAY! *<:-D") == \
        "OMG HAPPY BIRTHDAY! *<:-D"


def test_ws_after_equals_takes_next_run_as_value():
    # HTML5 before-attribute-value: whitespace after '=' is skipped and
    # the next run is the value (all tokenizer paths agree; was a latent
    # fast-path/general-path inconsistency)
    from selma_spark import tokenizer as tk

    for need_spans in (False, True):
        toks = tk.tokenize('<a Y= ec=1>x</a>', need_spans=need_spans)
        attrs = [(a.name, a.value, a.has_value) for a in toks[0].attrs]
        assert attrs == [("y", "ec=1", True)], attrs
