"""Static HTML tag table.

Mirrors the reference's per-tag metadata (reference: ext/selma/src/tags.rs):
the 151-slot canonical tag table (tags.rs:15-168, TAG_COUNT at tags.rs:171),
the void/"self-closing" set (tags.rs per-tag ``self_closing`` fields), the
text-content set (tags.rs:175-180), and the escapeworthy set used by the
final sanitization pass (tags.rs:193-209).

Unknown tag names collapse onto one shared UNKNOWN slot (tags.rs:972-976) —
this is observable behavior: allow-listing one unknown element allows *all*
unknown elements, which the reference's own svg/circle test relies on
(test/selma_sanitizer_test.rb:70-88).
"""

from __future__ import annotations

# Canonical tag order; index = position. 150 named tags + UNKNOWN = 151 slots.
TAG_NAMES: tuple[str, ...] = (
    "html", "head", "title", "base", "link", "meta", "style", "script",
    "noscript", "template", "body", "article", "section", "nav", "aside",
    "h1", "h2", "h3", "h4", "h5", "h6", "hgroup", "header", "footer",
    "address", "p", "hr", "pre", "blockquote", "ol", "ul", "li", "dl",
    "dt", "dd", "figure", "figcaption", "main", "div", "a", "em", "strong",
    "small", "s", "cite", "q", "dfn", "abbr", "data", "time", "code",
    "var", "samp", "kbd", "sub", "sup", "i", "b", "u", "mark", "ruby",
    "rt", "rp", "bdi", "bdo", "span", "br", "wbr", "ins", "del", "image",
    "img", "iframe", "embed", "object", "param", "video", "audio",
    "source", "track", "canvas", "map", "area", "math", "mi", "mo", "mn",
    "ms", "mtext", "mglyph", "malignmark", "annotation", "svg",
    "foreignobject", "desc", "table", "caption", "colgroup", "col",
    "tbody", "thead", "tfoot", "tr", "td", "th", "form", "fieldset",
    "legend", "label", "input", "button", "select", "datalist", "optgroup",
    "option", "textarea", "keygen", "output", "progress", "meter",
    "details", "summary", "menu", "menuitem", "applet", "acronym",
    "bgsound", "dir", "frame", "frameset", "noframes", "listing", "xmp",
    "nextid", "noembed", "plaintext", "rb", "strike", "basefont", "big",
    "blink", "center", "font", "marquee", "multicol", "nobr", "spacer",
    "tt", "rtc", "dialog",
)

TAG_COUNT = 151
UNKNOWN_INDEX = 150

TAG_INDEX: dict[str, int] = {name: i for i, name in enumerate(TAG_NAMES)}


def tag_index(name_lower: str) -> int:
    """Canonical table index for a lowercase tag name (unknown -> 150)."""
    return TAG_INDEX.get(name_lower, UNKNOWN_INDEX)


# Tags whose ``self_closing`` field is true in the reference table
# (tags.rs: base,link,meta,hr,br,wbr,img,embed,param,source,track,col,
#  input,keygen,menuitem,bgsound,frame,basefont,area). Note: "image" is a
# distinct, NON-void tag (tags.rs:572-576).
VOID_TAGS: frozenset[str] = frozenset((
    "base", "link", "meta", "hr", "br", "wbr", "img", "embed", "param",
    "source", "track", "col", "input", "keygen", "menuitem", "bgsound",
    "frame", "basefont", "area",
))

# Tags whose contents are "text nodes" and are therefore always removed
# together with a disallowed element (tags.rs:175-180).
TEXT_CONTENT_TAGS: frozenset[str] = frozenset(("script", "style", "math", "svg"))

# Tags force-removed by the second sanitization pass unless explicitly
# allowed (tags.rs:193-209, ESCAPEWORTHY_TAGS_CSS).
ESCAPEWORTHY_TAGS: frozenset[str] = frozenset((
    "title", "textarea", "style", "xmp", "iframe", "noembed", "noframes",
    "script", "plaintext",
))

# Tokenizer content modes (HTML5):
#   rawtext:   content is raw text until the matching close tag
#   rcdata:    like rawtext but (conceptually) entity-decoded
#   script:    script-data
#   plaintext: rest of input is text
RAWTEXT_TAGS: frozenset[str] = frozenset(
    ("style", "xmp", "iframe", "noembed", "noframes", "noscript")
)
RCDATA_TAGS: frozenset[str] = frozenset(("title", "textarea"))

# text_type values (reference: ext/selma/src/html/text_chunk.rs:63-70)
TEXT_TYPE_DATA = "data"
TEXT_TYPE_PLAIN = "plain_text"
TEXT_TYPE_RAW = "raw_text"
TEXT_TYPE_SCRIPT = "script"
TEXT_TYPE_RCDATA = "rc_data"
TEXT_TYPE_CDATA = "cdata_section"


def text_type_for(tag_lower: str) -> str:
    if tag_lower == "script":
        return TEXT_TYPE_SCRIPT
    if tag_lower in RCDATA_TAGS:
        return TEXT_TYPE_RCDATA
    if tag_lower == "plaintext":
        return TEXT_TYPE_PLAIN
    if tag_lower in RAWTEXT_TAGS:
        return TEXT_TYPE_RAW
    return TEXT_TYPE_DATA
