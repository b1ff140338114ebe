"""Main-content extraction handlers.

The boilerplate-stripping / metadata-capture pattern the pipeline's
north rule calls for, modeled on the reference's own ContentExtractor
(reference: test/selma_maliciousness_test.rb:167-221) and TagRemover /
ContentBreaker (test/selma_maliciousness_test.rb:223-261).
"""

from __future__ import annotations

from .sanitizer import DEFAULT
from .selector import Selector

BOILERPLATE_TAGS = frozenset(
    ("pre", "code", "form", "style", "noscript", "script", "svg")
)

_BLOCK_TAGS = frozenset(DEFAULT["whitespace_elements"])


class ContentExtractor:
    """Strips boilerplate elements, captures <title> text and <meta>
    name/content pairs, and unwraps everything else — leaving the
    document's readable text (plus sanitizer-allowed markup if a
    sanitizer is configured upstream)."""

    SELECTOR = Selector(match_element="*", match_text_within="title")

    def __init__(self):
        self.title = ""
        self.meta: dict[str, str] = {}
        self._within_title = False

    def selector(self):
        return self.SELECTOR

    def handle_element(self, element):
        tag = element.tag_name
        if tag in BOILERPLATE_TAGS:
            element.remove()
        elif tag == "title":
            self._within_title = True
            element.remove()
        elif tag == "meta":
            name = element.attributes.get("name")
            if name is None:
                return
            self.meta[name] = element.attributes.get("content")
        else:
            element.remove_and_keep_content()

    def handle_text_chunk(self, text):
        if self._within_title:
            self._within_title = False
            self.title = text.to_s()


class TextBreaker:
    """Unwraps every element, appending a newline after block-level ones —
    turns HTML into newline-separated plain text (reference ContentBreaker,
    test/selma_maliciousness_test.rb:248-261)."""

    SELECTOR = Selector(match_element="*")

    def selector(self):
        return self.SELECTOR

    def handle_element(self, element):
        if element.tag_name in _BLOCK_TAGS and not element.removed:
            element.append("\n", as_="text")
        element.remove_and_keep_content()


class HrefToGopher:
    """Reference benchmark handler 1 (test/benchmark/selma_config.rb:4-14):
    rewrite http(s): hrefs to gopher:. (The reference selector is the tag
    "href" — a quirk preserved there; ours targets a[href] so the handler
    actually exercises attribute rewriting.)"""

    SELECTOR = Selector(match_element="a[href]")

    def selector(self):
        return self.SELECTOR

    def handle_element(self, element):
        href = element["href"]
        if href and (href.startswith("http:") or href.startswith("https:")):
            element["href"] = "gopher:" + href.split(":", 1)[1]


class SpanTextDup:
    """Reference benchmark handler 2 (selma_config.rb:16-26): duplicate
    non-empty span text after the chunk as a <div>."""

    SELECTOR = Selector(match_text_within="span")

    def selector(self):
        return self.SELECTOR

    def handle_text_chunk(self, text_chunk):
        content = text_chunk.to_s()
        if content.strip():
            text_chunk.after(f"<div>{content}</div>", as_="html")


class ImgRemove:
    """Reference benchmark handler 3 (selma_config.rb:28-38): remove imgs."""

    SELECTOR = Selector(match_element="img")

    def selector(self):
        return self.SELECTOR

    def handle_element(self, element):
        element.remove()


def reference_bench_handlers():
    """The reference's rewrite-benchmark handler set
    (test/benchmark.rb:87-93 runs them with sanitizer: nil)."""
    return [HrefToGopher(), SpanTextDup(), ImgRemove()]
