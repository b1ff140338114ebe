"""Security corpus (reference: test/selma_sanitizer_malicious_html_test.rb),
all under the RELAXED config."""

import pytest

from selma_spark import sanitizer as S
from selma_spark.rewriter import Rewriter


def rw(html):
    return Rewriter(sanitizer=S.RELAXED).rewrite(html)


def test_no_script_injection_via_conditional_comments():
    assert rw("<!--[if gte IE 4]>\n<script>alert('XSS');</script>\n<![endif]-->") == ""


def test_malformed_event_attribute():
    assert rw(
        '<html><head></head><body onload!#$%&()*~+-_.,:;?@[/|\\]^`=alert("XSS")></body></html>'
    ) == "<html><head></head><body></body></html>"


def test_improperly_closed_iframe():
    assert rw("<iframe src=http://ha.ckers.org/scriptlet.html <") == ""


def test_unquoted_img_src_js():
    assert rw('<img src=javascript:alert("XSS")>') == "<img>"


def test_grave_accent_img_src():
    assert rw('<img src=`javascript:alert("XSS")`>') == "<img>"


def test_malformed_img_tag():
    assert rw('<img """><script>alert("XSS")</script>">') == '<img>">'


@pytest.mark.parametrize("html", [
    "<img src=&#106;&#97;&#118;&#97;&#115;&#99;&#114;&#105;&#112;&#116;&#58;&#97;&#108;&#101;&#114;&#116;&#40;&#39;&#88;&#83;&#83;&#39;&#41;>",
    "<img src=&#0000106&#0000097&#0000118&#0000097&#0000115&#0000099&#0000114&#0000105&#0000112&#0000116&#0000058&#0000097&#0000108&#0000101&#0000114&#0000116&#0000040&#0000039&#0000088&#0000083&#0000083&#0000039&#0000041>",
    "<img src=&#x6A&#x61&#x76&#x61&#x73&#x63&#x72&#x69&#x70&#x74&#x3A&#x61&#x6C&#x65&#x72&#x74&#x28&#x27&#x58&#x53&#x53&#x27&#x29>",
    '<img src="jav&#x09;ascript:alert(\'XSS\');">',
    '<img src="jav&#x0A;ascript:alert(\'XSS\');">',
    '<img src="jav&#x0D;ascript:alert(\'XSS\');">',
    '<img src=java\0script:alert("XSS")>',
    "<img src=\" &#14;  javascript:alert('XSS');\">",
    "<img src=\"j\na v\tascript://alert('XSS');\">",
    "<img src=\"jav\tascript:alert('XSS');\">",
])
def test_protocol_based_js_vectors(html):
    assert rw(html) == "<img>"


def test_half_open_img_tag():
    assert rw("<img src=\"javascript:alert('XSS')\"") == ""


def test_malformed_nonalphanumeric_tag_name():
    assert rw('<script/xss src="http://ha.ckers.org/xss.js">alert(1)</script>') == ""


def test_extraneous_open_brackets():
    assert rw('<<script>alert("XSS");//<</script>') == ""


@pytest.mark.parametrize("container", ["math", "svg"])
@pytest.mark.parametrize("tag", [
    "iframe", "noembed", "noframes", "noscript", "plaintext", "script",
    "style", "xmp",
])
def test_foreign_content_bypass(container, tag):
    # GHSA-p4x4-rw2p-8j8m defense via the second sanitization pass
    html = f"<{container}><{tag}>/*&lt;/{tag}&gt;&lt;img src onerror=alert(1)>*/"
    assert rw(html) == ""
