"""Handler/rewriter behaviors (reference:
test/selma_rewriter_match_element_test.rb, test/selma_rewriter_text_test.rb,
test/selma_rewriter_match_attribute_test.rb, test/selma_rewriter_test.rb,
test/selma_selector_test.rb, test/selma_maliciousness_test.rb)."""

import re

import pytest

from selma_spark.rewriter import MemoryLimitError, RewriteError, Rewriter
from selma_spark.selector import Selector, SelectorError


class H:
    """Declarative test handler."""

    def __init__(self, selector, element=None, text=None, end_tag=None):
        self._selector = selector
        if element is not None:
            self.handle_element = lambda el: element(self, el)
        if text is not None:
            self.handle_text_chunk = lambda t: text(self, t)
        if end_tag is not None:
            self.on_end_tag = lambda e: end_tag(self, e)

    def selector(self):
        return self._selector


def rewrite(html, *handlers, sanitizer=None):
    return Rewriter(sanitizer=sanitizer, handlers=list(handlers)).rewrite(html)


# --- element ops -----------------------------------------------------------

def test_set_attribute():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.set_attribute("class", "boldy"))
    assert rewrite("<strong>Wow!</strong>", h) == '<strong class="boldy">Wow!</strong>'


def test_with_sanitizer_rewriting_still_applies():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.set_attribute("class", "boldy"))
    got = Rewriter(sanitizer={"elements": ["strong"]}, handlers=[h]).rewrite(
        "<malarky><strong><junk>Wow!</junk></strong></malarky>"
    )
    assert got == '<strong class="boldy">Wow!</strong>'


def test_handlers_run_in_order():
    first = H(Selector(match_element="div"),
              element=lambda s, el: el.set_attribute("class", "boldy"))

    def second_fn(s, el):
        if el["class"] == "boldy":
            el["class"] += " boldy2"

    second = H(Selector(match_element="div"), element=second_fn)
    frag = "<div>Wow!</div>"
    assert rewrite(frag, first) == '<div class="boldy">Wow!</div>'
    assert rewrite(frag, second) == frag
    assert rewrite(frag, first, second) == '<div class="boldy boldy2">Wow!</div>'


def test_ancestors():
    seen = []
    h = H(Selector(match_element="strong"),
          element=lambda s, el: seen.append(el.ancestors))
    rewrite("<div><p><foo><strong>Wow!</strong></foo></p></div>", h)
    assert seen == [["div", "p", "foo"]]


def test_empty_ancestors():
    seen = []
    h = H(Selector(match_element="strong"),
          element=lambda s, el: seen.append((el.tag_name, el.ancestors)))
    rewrite("<strong>Wow!</strong>", h)
    assert seen == [("strong", [])]


def test_append_html():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.append("<em>Gee!</em>", as_="html"))
    assert rewrite("<strong>Wow!</strong>", h) == "<strong>Wow!<em>Gee!</em></strong>"


def test_append_text_is_escaped():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.append("<em>Gee!</em>", as_="text"))
    assert rewrite("<strong>Wow!</strong>", h) == \
        "<strong>Wow!&lt;em&gt;Gee!&lt;/em&gt;</strong>"


def test_before_html():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.before("<span>wow?</span>", as_="html"))
    assert rewrite("<strong>Wow!</strong>", h) == \
        "<span>wow?</span><strong>Wow!</strong>"


def test_after_html():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.after("<span>ok?</span>", as_="html"))
    assert rewrite("<strong>Wow!</strong>", h) == \
        "<strong>Wow!</strong><span>ok?</span>"


def test_set_inner_content():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.set_inner_content("Gee!", as_="text"))
    assert rewrite("<strong>Wow!</strong>", h) == "<strong>Gee!</strong>"


def test_handler_errors_abort_the_rewrite():
    def boom(s, el):
        raise ValueError("boom!")

    h = H(Selector(match_element="strong"), element=boom)
    with pytest.raises(RuntimeError):
        rewrite("<strong>Wow!</strong>", h)


def test_set_tag_name():
    def rename(s, el):
        el.tag_name = "bold"

    h = H(Selector(match_element="strong"), element=rename)
    assert rewrite("<strong>Wow!</strong>", h) == "<bold>Wow!</bold>"


def test_has_attribute():
    seen = []
    h = H(Selector(match_element="strong"),
          element=lambda s, el: seen.append(el.has_attribute("class")))
    rewrite('<strong class="urgent">Wow!</strong>', h)
    assert seen == [True]


def test_remove():
    removed_flags = []

    def f(s, el):
        el.remove()
        removed_flags.append(el.removed)

    h = H(Selector(match_element="strong"), element=f)
    assert rewrite("<div>Wow<strong>!</strong></div>", h) == "<div>Wow</div>"
    assert removed_flags == [True]


def test_remove_and_keep_content():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.remove_and_keep_content())
    assert rewrite("<div>Wow<strong>!</strong></div>", h) == "<div>Wow!</div>"


# --- attribute ops (match_attribute_test.rb) --------------------------------

def test_remove_attribute_scoped_to_selector():
    h = H(Selector(match_element="a"),
          element=lambda s, el: el.remove_attribute("foo"))
    assert rewrite("<a foo='bleh'><span foo='keep'>Wow!</span></a>", h) == \
        "<a><span foo='keep'>Wow!</span></a>"


def test_attributes_hash():
    seen = []
    h = H(Selector(match_element="div"),
          element=lambda s, el: seen.append(el.attributes))
    rewrite("<article><div class='a b c 1 2 3' data-foo='baz'>Wow!</div></article>", h)
    assert seen == [{"class": "a b c 1 2 3", "data-foo": "baz"}]


# --- text ops (text_test.rb) -------------------------------------------------

def test_text_rewrite_all():
    h = H(Selector(match_text_within="*"),
          text=lambda s, t: t.replace(t.to_s().replace("Wow", "MEOW!", 1), as_="text"))
    assert rewrite("<div>Wow!</div><span>Wow!</span><a>Wow!</a>", h) == \
        "<div>MEOW!!</div><span>MEOW!!</span><a>MEOW!!</a>"


def test_rc_data_text_type():
    seen = []
    h = H(Selector(match_text_within="*"),
          text=lambda s, t: seen.append(t.text_type))
    rewrite("<title>Howdy</title>", h)
    assert seen == ["rc_data"]


def test_text_scoped_to_elements():
    h = H(Selector(match_text_within="a, div"),
          text=lambda s, t: t.replace(t.to_s().replace("Wow", "MEOW!", 1), as_="text"))
    assert rewrite("<div>Wow!</div><span>Wow!</span><a>Wow!</a>", h) == \
        "<div>MEOW!!</div><span>Wow!</span><a>MEOW!!</a>"


def test_text_before():
    h = H(Selector(match_text_within="div"),
          text=lambda s, t: t.before("MEOW! ", as_="text"))
    assert rewrite("<div>Wow!</div>", h) == "<div>MEOW! Wow!</div>"


def test_text_after():
    h = H(Selector(match_text_within="div"),
          text=lambda s, t: t.after(" MEOW!", as_="text"))
    assert rewrite("<div>Wow!</div>", h) == "<div>Wow! MEOW!</div>"


def test_element_and_text_combined():
    h = H(Selector(match_element="div", match_text_within="div, p, a"),
          element=lambda s, el: el.set_attribute("class", "neato"),
          text=lambda s, t: t.replace(t.to_s().replace("you", "y'all", 1), as_="html"))
    frag = "<div><p>Could you visit <a>this link and tell me what you think?</a> Thank you!</div>"
    assert rewrite(frag, h) == (
        '<div class="neato"><p>Could y\'all visit <a>this link and tell me '
        "what y'all think?</a> Thank y'all!</div>"
    )


def test_ignore_text_within():
    h = H(Selector(match_text_within="*", ignore_text_within=["code", "pre"]),
          text=lambda s, t: t.replace(
              t.to_s().replace("@gjtorik", "@gjtorikian", 1), as_="text"))
    frag = '<div><p>Hello @gjtorik: <code>@gjtorik</code></p><br/> <pre>@gjtorik</pre></div>'
    assert rewrite(frag, h) == (
        '<div><p>Hello @gjtorikian: <code>@gjtorik</code></p><br/> '
        "<pre>@gjtorik</pre></div>"
    )


def test_ignore_text_within_considers_indirect_ancestors():
    h = H(Selector(match_text_within="*", ignore_text_within=["code"]),
          text=lambda s, t: t.replace(t.to_s().replace("foo", "bar", 1), as_="html"))
    frag = '<p>foo</p><code>foo<span class="highlight">foo</span></code>'
    assert rewrite(frag, h) == \
        '<p>bar</p><code>foo<span class="highlight">foo</span></code>'


def test_text_replace_chaining_across_handlers():
    one = H(Selector(match_text_within="*"),
            text=lambda s, t: t.replace(t.to_s().replace("1", "2"), as_="text"))
    two = H(Selector(match_text_within="*"),
            text=lambda s, t: t.replace(t.to_s().replace("2", "3"), as_="text"))
    assert rewrite("<div>1 + 2 = 6</div>", one, two) == "<div>3 + 3 = 6</div>"


def test_html_replace_stacking():
    one = H(Selector(match_text_within="*"),
            text=lambda s, t: t.replace(
                t.to_s().replace("1", "<strong>1</strong>", 1), as_="html"))
    two = H(Selector(match_text_within="*"),
            text=lambda s, t: t.replace(
                t.to_s().replace("2", "<em>2</em>", 1), as_="html"))
    assert rewrite("<div>1 + 2 = 3</div>", one, two) == \
        "<div><strong>1</strong> + <em>2</em> = 3</div>"


# --- rewriter_test.rb ---------------------------------------------------------

def test_memory_options_validation():
    with pytest.raises(ValueError):
        Rewriter(options={"memory": {"max_allowed_memory_usage": 4}}).rewrite("12345")


def test_memory_limit_exceeded():
    html = "<p>" + "x" * 4096 + "</p>"
    r = Rewriter(options={"memory": {
        "max_allowed_memory_usage": len(html) // 2,
        "preallocated_parsing_buffer_size": len(html) // 4,
    }})
    with pytest.raises(MemoryLimitError):
        r.rewrite(html)


def test_rewritten_text_chunk_is_not_sanitized():
    def mention(s, t):
        content = t.to_s()
        if "@" not in content:
            return
        html = re.sub(
            r"@(\w+)",
            r'<a href="https://yetto.app/\1" class="user-mention">@\1</a>',
            content,
        )
        t.replace(html, as_="html")

    h = H(Selector(match_text_within="*"), text=mention)
    cfg = {"elements": ["a", "p"], "attributes": {"a": ["href"]},
           "protocols": {"a": {"href": ["https"]}}}
    got = Rewriter(sanitizer=cfg, handlers=[h]).rewrite(
        "<p>Hey there, @gjtorikian is here.</p>"
    )
    assert got == (
        '<p>Hey there, <a href="https://yetto.app/gjtorikian" '
        'class="user-mention">@gjtorikian</a> is here.</p>'
    )


# --- selector_test.rb ----------------------------------------------------------

def test_invalid_css_raises():
    with pytest.raises(SelectorError):
        Selector(match_element="a[href=]")


def test_empty_css_raises():
    with pytest.raises(SelectorError):
        Selector(match_element="")


def test_nested_not_accepted():
    Selector(match_element="div:not(:not(.foo))")
    Selector(match_element=":not(:not(:not(span)))")


def test_nested_not_matching():
    h = H(Selector(match_element="a:not(:not(.keep))"),
          element=lambda s, el: el.set_attribute("data-matched", "true"))
    assert rewrite('<a class="keep">yes</a><a class="other">no</a>', h) == \
        '<a class="keep" data-matched="true">yes</a><a class="other">no</a>'


def test_not_with_attribute():
    h = H(Selector(match_element='a:not([class="anchor"])'),
          element=lambda s, el: el.remove_attribute("class"))
    assert rewrite('<a class="x">1</a><a class="anchor">2</a>', h) == \
        "<a>1</a><a class=\"anchor\">2</a>"


# --- maliciousness_test.rb ------------------------------------------------------

def test_missing_selector_raises():
    class NoSelector:
        def handle_element(self, el):
            pass

    with pytest.raises(AttributeError):
        Rewriter(sanitizer=None, handlers=[NoSelector()])


def test_missing_handle_element_tolerated():
    h = H(Selector(match_element="b"))
    assert rewrite("<span>Wow!</span>", h) == "<span>Wow!</span>"
    assert rewrite("<b>Wow!</b>", h) == "<b>Wow!</b>"


# --- fast-skip dispatch: ancestor matching over inert stack entries --------

def test_descendant_combinators_match_through_inert_ancestors():
    """When every selector is tag-prefiltered (sanitizer off), non-
    matching start tags take the lightweight inert stack path — but
    descendant/child combinators must still inspect those ancestors'
    tags, classes, and attrs."""
    hits = []
    h = H(Selector(match_element="div.wrap > p a[href^='http']"),
          element=lambda s, el: hits.append(el["href"]))
    rewrite(
        '<div class="wrap"><p><a href="http://x">y</a></p></div>'
        '<div><p><a href="http://no">n</a></p></div>'
        '<div class="wrap"><section><a href="http://notp">n</a></section></div>',
        h,
    )
    assert hits == ["http://x"]


def test_rename_into_required_tags_only_from_matched_elements():
    """A handler CAN rename an element into another selector's required
    tags; the renamed element took the full path (its own selector
    matched it), so later handlers still see the rename."""
    one = H(Selector(match_element="section"),
            element=lambda s, el: setattr(el, "tag_name", "article"))
    seen = []
    two = H(Selector(match_element="article"),
            element=lambda s, el: seen.append(el.tag_name))
    out = rewrite("<section>x</section><p>y</p>", one, two)
    assert out == "<article>x</article><p>y</p>"
    assert seen == ["article"]


# --- CDATA sections in foreign content (reference text_chunk.rs:63-70) -----

def test_cdata_section_text_type_in_svg():
    seen = []

    def text(s, t):
        seen.append((t.text_type, t.content))

    h = H(Selector(match_text_within="svg"), text=text)
    out = rewrite("<svg><![CDATA[x]]></svg>", h)
    assert out == "<svg><![CDATA[x]]></svg>"
    assert ("cdata_section", "x") in seen


def test_cdata_section_mutation_keeps_delimiters():
    def text(s, t):
        if t.text_type == "cdata_section":
            t.replace("y", as_="text")

    h = H(Selector(match_text_within="math"), text=text)
    assert rewrite("<math><![CDATA[x]]></math>", h) == "<math><![CDATA[y]]></math>"


def test_cdata_outside_foreign_content_stays_comment():
    seen = []
    h = H(Selector(match_text_within="*"),
          text=lambda s, t: seen.append(t.text_type))
    out = rewrite("<div><![CDATA[x]]></div>", h)
    # HTML content: a bogus comment, NOT character data — no cdata
    # dispatch, construct passes through verbatim (handlers-only path)
    assert out == "<div><![CDATA[x]]></div>"
    assert "cdata_section" not in seen


def test_cdata_empty_is_suppressed_like_empty_text():
    seen = []
    h = H(Selector(match_text_within="svg"),
          text=lambda s, t: seen.append(t.text_type))
    out = rewrite("<svg><![CDATA[]]></svg>", h)
    assert out == "<svg><![CDATA[]]></svg>"
    assert "cdata_section" not in seen  # empty-chunk suppression


def test_cdata_with_gt_in_data_is_one_chunk_in_foreign_content():
    """r5: CDATA whose data contains '>' inside an open svg/math subtree
    is repaired to ONE cdata_section chunk running to the literal ']]>'
    (lol-html's stateful scan), closing DIVERGENCES.md #1's residual."""
    seen = []
    h = H(Selector(match_text_within="svg"),
          text=lambda s, t: seen.append((t.text_type, t.content)))
    out = rewrite('<svg><![CDATA[a > b > c]]><b>x</b></svg>tail', h)
    assert out == '<svg><![CDATA[a > b > c]]><b>x</b></svg>tail'
    assert ("cdata_section", "a > b > c") in seen


def test_cdata_with_gt_mutation_keeps_delimiters():
    def text(s, t):
        if t.text_type == "cdata_section":
            t.replace("Z", as_="text")

    h = H(Selector(match_text_within="math"), text=text)
    assert rewrite('<math><![CDATA[p>q]]></math>', h) == \
        '<math><![CDATA[Z]]></math>'


def test_cdata_terminator_inside_later_attr_relexes_remainder():
    """']]>' landing inside what the bogus-comment lexing saw as a later
    tag: data runs to the terminator, and the remainder of the document
    re-lexes fresh from after it."""
    seen = []
    h = H(Selector(match_text_within="svg"),
          text=lambda s, t: seen.append(t.content))
    out = rewrite('<svg><![CDATA[x > <b a="]]>">rest</svg>', h)
    assert out == '<svg><![CDATA[x > <b a="]]>">rest</svg>'
    assert seen == ['x > <b a="', '">rest']


def test_cdata_unterminated_at_eof_keeps_bogus_comment_lexing():
    h = H(Selector(match_text_within="svg"), text=lambda s, t: None)
    assert rewrite('<svg><![CDATA[x > y', h) == '<svg><![CDATA[x > y'


def test_cdata_with_gt_outside_foreign_content_unchanged():
    seen = []
    h = H(Selector(match_text_within="*"),
          text=lambda s, t: seen.append(t.text_type))
    out = rewrite('<div><![CDATA[a > b]]></div>', h)
    assert out == '<div><![CDATA[a > b]]></div>'
    assert "cdata_section" not in seen


def test_cdata_is_character_data_in_sanitize_only_pass():
    """CDATA in an open svg/math subtree takes character-data semantics
    in the sanitize-only fast pass too — kept verbatim under
    allow_comments=False, '>'-containing data repaired to ']]>', with NO
    handlers attached (lexing must not depend on handler presence)."""
    from selma_spark.sanitizer import Sanitizer

    san = Sanitizer({
        "elements": ["svg"],
        "allow_comments": False,
        "escape_tagfilter": False,
    })
    out = Rewriter(sanitizer=san).rewrite(
        '<svg><![CDATA[a > b]]></svg><!-- gone -->')
    assert out == '<svg><![CDATA[a > b]]></svg>'


def test_cdata_empty_survives_comment_stripping_sanitizer():
    """Empty <![CDATA[]]> in foreign content is character data, not a
    comment: a sanitizer with allow_comments=False must preserve it just
    like the non-empty case (ADVICE r4 #3 — empty shells previously fell
    through to the comment-removal branch)."""
    from selma_spark.sanitizer import Sanitizer

    san = Sanitizer({
        "elements": ["svg"],
        "allow_comments": False,
        "escape_tagfilter": False,
    })
    h = H(Selector(match_text_within="svg"),
          text=lambda s, t: None)
    empty = Rewriter(sanitizer=san, handlers=[h]).rewrite(
        "<svg><![CDATA[]]></svg>")
    nonempty = Rewriter(sanitizer=san, handlers=[h]).rewrite(
        "<svg><![CDATA[x]]></svg>")
    assert empty == "<svg><![CDATA[]]></svg>"
    assert nonempty == "<svg><![CDATA[x]]></svg>"


def test_concurrent_rewrites_keep_gc_paused_until_last_exit():
    """ADVICE r4 #2: GC must stay disabled while ANY rewrite() is
    in-flight across threads, and re-enable when the last exits."""
    import gc
    import threading

    assert gc.isenabled()
    states = []
    barrier = threading.Barrier(4)

    class Probe:
        def selector(self):
            return Selector(match_element="b")

        def handle_element(self, el):
            barrier.wait(timeout=10)  # all 4 calls mid-rewrite at once
            states.append(gc.isenabled())
            barrier.wait(timeout=10)

    ts = [
        threading.Thread(
            target=lambda: Rewriter(handlers=[Probe()]).rewrite("<b>x</b>"))
        for _ in range(4)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert states == [False, False, False, False]
    assert gc.isenabled()


def test_missing_handle_text_chunk_raises():
    h = H(Selector(match_text_within="strong"))
    with pytest.raises(RuntimeError):
        rewrite("<strong>Wow!</strong>", h)


def test_blank_handlers_and_nil_sanitizer_raises():
    with pytest.raises(ValueError):
        Rewriter(sanitizer=None, handlers=[])


def test_non_list_handlers_raises():
    with pytest.raises(TypeError):
        Rewriter(sanitizer=None, handlers=818)


def test_wrong_handler_type_raises():
    with pytest.raises((AttributeError, TypeError)):
        Rewriter(sanitizer=None, handlers=[562])


def test_selector_with_no_options_raises():
    with pytest.raises(ValueError):
        Selector()


def test_selector_wrong_types_raise():
    with pytest.raises(TypeError):
        Selector(match_element=42)
    with pytest.raises(TypeError):
        Selector(match_text_within=42)


# --- attribute source locations (attribute_source_location_test.rb) -----------

def test_attr_source_locations():
    locs = {}
    h = H(Selector(match_element="a, input, div"),
          element=lambda s, el: locs.update({
              n: el.attribute_source_location(n)
              for n in ("href", "disabled", "nope", "class", "data-foo")
          }))
    html = '<p>hi <a href="/world">link</a></p>'
    rewrite(html, h)
    loc = locs["href"]
    assert html[loc["name"][0]:loc["name"][1]] == "href"
    assert html[loc["value"][0]:loc["value"][1]] == "/world"
    assert locs["nope"] is None

    locs.clear()
    html = '<input disabled="">'
    rewrite(html, h)
    loc = locs["disabled"]
    assert html[loc["name"][0]:loc["name"][1]] == "disabled"
    assert html[loc["value"][0]:loc["value"][1]] == ""

    locs.clear()
    rewrite("<input disabled>", h)
    assert locs["disabled"] is None

    locs.clear()
    html = '<div class="a b" data-foo="baz">x</div>'
    rewrite(html, h)
    assert html[slice(*locs["class"]["value"])] == "a b"
    assert html[slice(*locs["data-foo"]["value"])] == "baz"
    assert locs["class"]["name"] != locs["data-foo"]["name"]


def test_attr_source_locations_are_byte_ranges_on_multibyte_input():
    """The reference returns BYTE ranges over UTF-8 (element.rs:117-156,
    consumed with Ruby's byteslice). Multibyte characters BEFORE and
    INSIDE the attribute value must shift/widen the ranges accordingly."""
    locs = {}
    h = H(Selector(match_element="a"),
          element=lambda s, el: locs.update({
              n: el.attribute_source_location(n) for n in ("href", "title")
          }))
    # 日本語 = 9 UTF-8 bytes / 3 chars before the tag; émoji in the value
    html = '<p>日本語 <a href="/wörld" title="✓ ok">link</a></p>'
    rewrite(html, h)
    raw = html.encode("utf-8")
    loc = locs["href"]
    assert raw[loc["name"][0]:loc["name"][1]] == b"href"
    assert raw[loc["value"][0]:loc["value"][1]] == "/wörld".encode()
    loc = locs["title"]
    assert raw[loc["name"][0]:loc["name"][1]] == b"title"
    assert raw[loc["value"][0]:loc["value"][1]] == "✓ ok".encode()


def test_attr_source_locations_every_element_incremental_cursor():
    """Querying EVERY element of a non-ASCII document exercises the
    shared per-pass byte cursor (incremental prefix encodes — the naive
    per-node full-prefix encode is O(n^2) on this access pattern). Every
    returned range must still byteslice to the exact name/value,
    including repeated queries of the same element."""
    locs = []

    def f(s, el):
        loc = el.attribute_source_location("data-i")
        # second query of the same node takes the memoized path
        assert el.attribute_source_location("data-i") == loc
        locs.append(loc)

    h = H(Selector(match_element="span"), element=f)
    html = "日本語".join(
        f'<span data-i="v{i}-ü">x</span>' for i in range(50)
    )
    rewrite(html, h)
    raw = html.encode("utf-8")
    assert len(locs) == 50
    for i, loc in enumerate(locs):
        assert raw[slice(*loc["name"])] == b"data-i"
        assert raw[slice(*loc["value"])] == f"v{i}-ü".encode()


def test_added_attribute_has_no_source_location():
    captured = {}

    def f(s, el):
        el.set_attribute("data-new", "x")
        captured["added"] = el.attribute_source_location("data-new")
        captured["orig"] = el.attribute_source_location("href")

    h = H(Selector(match_element="a"), element=f)
    html = '<a href="/x">link</a>'
    rewrite(html, h)
    assert captured["added"] is None
    assert html[slice(*captured["orig"]["value"])] == "/x"


# --- remaining element/end-tag surface ---------------------------------------

def test_prepend():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.prepend("<em>Hey!</em>", as_="html"))
    assert rewrite("<strong>Wow!</strong>", h) == \
        "<strong><em>Hey!</em>Wow!</strong>"


def test_prepend_text_escaped():
    h = H(Selector(match_element="strong"),
          element=lambda s, el: el.prepend("<em>", as_="text"))
    assert rewrite("<strong>Wow!</strong>", h) == "<strong>&lt;em&gt;Wow!</strong>"


def test_on_end_tag_fires_with_name():
    seen = []
    h = H(Selector(match_element="div"),
          element=lambda s, el: None,
          end_tag=lambda s, e: seen.append(e.tag_name))
    rewrite("<div>hi</div><span>no</span>", h)
    assert seen == ["div"]


def test_on_end_tag_remove():
    h = H(Selector(match_element="div"),
          element=lambda s, el: None,
          end_tag=lambda s, e: e.remove())
    assert rewrite("<div>hi</div>", h) == "<div>hi"


def test_on_end_tag_not_fired_for_implicit_close():
    seen = []
    h = H(Selector(match_element="strong"),
          element=lambda s, el: None,
          end_tag=lambda s, e: seen.append(e.tag_name))
    # </a> implicitly closes strong; strong's own end tag never arrives
    out = rewrite("<a><strong>x</a></strong>", h)
    assert seen == []
    assert out == "<a><strong>x</a></strong>"


def test_self_closing_flag():
    seen = []
    h = H(Selector(match_element="img, br"),
          element=lambda s, el: seen.append((el.tag_name, el.self_closing)))
    rewrite("<img src='x'/><br>", h)
    assert seen == [("img", True), ("br", False)]


def test_renamed_end_tag_follows():
    def f(s, el):
        el.tag_name = "section"

    h = H(Selector(match_element="div"), element=f)
    assert rewrite("<div>a<span>b</span></div>", h) == \
        "<section>a<span>b</span></section>"


def test_available_is_not_removed():
    seen = []

    def f(s, el):
        seen.append(el.available)
        el.remove()
        seen.append(el.available)

    h = H(Selector(match_element="b"), element=f)
    rewrite("<b>x</b>", h)
    assert seen == [True, False]


# --- r6: lazy chunked re-lex after CDATA repair (ADVICE r5 medium) ---------

def test_cdata_repair_run_is_linear_not_quadratic():
    """Adversarial '<![CDATA[>]]>'-runs force one repair per construct;
    pre-r6 each repair re-lexed the WHOLE document remainder (O(n^2):
    12.9s at 52KB measured). The chunked lazy re-lex must stay ~linear:
    doubling the input must not quadruple the time. Generous 3x bound
    per doubling absorbs host throttle-phase noise on a comfortably
    sub-second workload (~0.2s/0.4s post-fix at these sizes)."""
    import time

    from selma_spark.sanitizer import RELAXED

    r = Rewriter(sanitizer=RELAXED)
    seen = []

    def sample(n):
        doc = "<svg>" + "a<![CDATA[>]]>" * n
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = r.rewrite(doc)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        seen.append(out)
        return best

    t_small, t_big = sample(4000), sample(8000)
    assert t_big < 3 * t_small + 0.05, (t_small, t_big)


def test_cdata_repair_chunked_relex_output_matches_one_shot():
    """The lazy chunked re-lex must produce byte-identical output to a
    one-shot lex: repaired CDATA constructs interleaved with every
    construct family (tags, comments, rawtext, literal '<' text runs
    that the chunk-boundary TEXT extension must keep whole)."""
    seen = []

    def text(s, t):
        seen.append((t.text_type, t.content))

    h = H(Selector(match_text_within="svg"), text=text)
    mid = '<b x="1">t</b><!--c--><script>s</script>< lit <p>par</p>'
    doc = ("<svg>" + ("<![CDATA[a>b]]>" + mid) * 40
           + "<![CDATA[tail>]]></svg>done")
    out = rewrite(doc, h)
    assert out == doc  # untouched handlers: verbatim passthrough
    # every repaired construct dispatched exactly once as cdata_section
    cdata = [c for tt, c in seen if tt == "cdata_section"]
    assert cdata.count("a>b") == 40 and cdata.count("tail>") == 1
    # sanitize pass drives the same chunked machinery
    from selma_spark.sanitizer import RELAXED
    sv = Rewriter(sanitizer=RELAXED).rewrite(doc)
    assert isinstance(sv, str)
