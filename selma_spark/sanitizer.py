"""Allowlist sanitizer: config compilation + per-element decision logic.

Reimplements, in Python, the semantics of the reference sanitizer
(reference: ext/selma/src/sanitizer.rs):

* config compilation into a 151-slot per-tag flag table + attribute /
  protocol allowlists (sanitizer.rs:46-276);
* element keep/remove decisions with REMOVE_CONTENTS / WRAP_WHITESPACE
  handling and the always-remove-contents rule for text-content tags
  (sanitizer.rs:628-678);
* attribute sanitization: trim -> entity-unescape -> allowlist check ->
  protocol check -> re-escape (sanitizer.rs:400-490), the ``<!--`` attr
  force-removal (sanitizer.rs:418-425), and the meta-charset override
  (sanitizer.rs:448-458);
* protocol matching incl. ``:relative`` -> ["#", "/"] expansion
  (sanitizer.rs:352-390, 549-581);
* class allowlist filtering (sanitizer.rs:583-619);
* the four built-in configs (lib/selma/sanitizer/config/*.rb) and deep
  merge/freeze helpers (lib/selma/sanitizer/config.rb:10-52).

The compiled config is a plain frozen Python object: cheap to pickle once
per Spark task and safe to share via closure capture / broadcast.
"""

from __future__ import annotations

import html as _htmlmod
import re as _re
from collections.abc import Mapping
from types import MappingProxyType

from .tags import TAG_COUNT, TEXT_CONTENT_TAGS, tag_index

ALLOW = 1
REMOVE_CONTENTS = 4
WRAP_WHITESPACE = 8

# sentinel strings standing in for Ruby symbols in config dicts
ALL = "all"          # :all
RELATIVE = "relative"  # :relative


def deep_merge(base: dict, other: dict) -> dict:
    """Deep merge for deriving custom configs
    (reference: lib/selma/sanitizer/config.rb:26-52; non-hash args raise,
    pinned by test/selma_sanitizer_config_test.rb:52-55)."""
    if not isinstance(base, Mapping) or not isinstance(other, Mapping):
        raise TypeError("Both arguments must be dicts")
    out = dict(base)
    for k, v in other.items():
        # Mapping, not dict: frozen configs hold MappingProxyType values
        # and must still merge deeply (the reference merges frozen
        # hashes, config.rb:26-52)
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def freeze_config(cfg: dict):
    """Recursively freeze a config dict
    (reference: lib/selma/sanitizer/config.rb:10-19)."""
    def _freeze(v):
        if isinstance(v, dict):
            return MappingProxyType({k: _freeze(x) for k, x in v.items()})
        if isinstance(v, list):
            return tuple(_freeze(x) for x in v)
        return v
    return _freeze(cfg)


# Built-in configs, field-for-field from the reference
# (lib/selma/sanitizer/config/{default,restricted,basic,relaxed}.rb).
DEFAULT = freeze_config({
    "allow_comments": False,
    "allow_doctype": False,
    "attributes": {},
    "elements": [],
    "protocols": {},
    "remove_contents": [
        "iframe", "math", "noembed", "noframes", "noscript", "plaintext",
        "script", "style", "svg", "xmp",
    ],
    "whitespace_elements": [
        "address", "article", "aside", "blockquote", "br", "dd", "div",
        "dl", "dt", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "header",
        "hgroup", "hr", "li", "nav", "ol", "p", "pre", "section", "ul",
    ],
})

RESTRICTED = freeze_config({
    "elements": ["b", "em", "i", "strong", "u"],
    "whitespace_elements": list(DEFAULT["whitespace_elements"]),
})

BASIC = freeze_config({
    "elements": [
        "a", "abbr", "blockquote", "b", "br", "cite", "code", "dd", "dfn",
        "dl", "dt", "em", "i", "kbd", "li", "mark", "ol", "p", "pre", "q",
        "s", "samp", "small", "strike", "strong", "sub", "sup", "time",
        "u", "ul", "var",
    ],
    "attributes": {
        "a": ["href"],
        "abbr": ["title"],
        "blockquote": ["cite"],
        "dfn": ["title"],
        "q": ["cite"],
        "time": ["datetime", "pubdate"],
    },
    "protocols": {
        "a": {"href": ["ftp", "http", "https", "mailto", RELATIVE]},
        "blockquote": {"cite": ["http", "https", RELATIVE]},
        "q": {"cite": ["http", "https", RELATIVE]},
    },
})

RELAXED = freeze_config(deep_merge(dict(BASIC), {
    "elements": list(BASIC["elements"]) + [
        "address", "article", "aside", "bdi", "bdo", "body", "caption",
        "col", "colgroup", "data", "del", "details", "div", "figcaption",
        "figure", "footer", "h1", "h2", "h3", "h4", "h5", "h6", "head",
        "header", "hgroup", "hr", "html", "img", "ins", "main", "nav",
        "rp", "rt", "ruby", "section", "span", "style", "summary", "sup",
        "table", "tbody", "td", "tfoot", "th", "thead", "title", "tr",
        "wbr",
    ],
    "allow_doctype": True,
    "attributes": deep_merge(dict(BASIC["attributes"]), {
        ALL: ["class", "dir", "hidden", "id", "lang", "style", "tabindex",
              "title", "translate"],
        "a": ["href", "hreflang", "name", "rel"],
        "col": ["span", "width"],
        "colgroup": ["span", "width"],
        "data": ["value"],
        "del": ["cite", "datetime"],
        "img": ["align", "alt", "border", "height", "src", "srcset", "width"],
        "ins": ["cite", "datetime"],
        "li": ["value"],
        "ol": ["reversed", "start", "type"],
        "style": ["media", "scoped", "type"],
        "table": ["align", "bgcolor", "border", "cellpadding", "cellspacing",
                  "frame", "rules", "sortable", "summary", "width"],
        "td": ["abbr", "align", "axis", "colspan", "headers", "rowspan",
               "valign", "width"],
        "th": ["abbr", "align", "axis", "colspan", "headers", "rowspan",
               "scope", "sorted", "valign", "width"],
        "ul": ["type"],
    }),
    "protocols": deep_merge(dict(BASIC["protocols"]), {
        "del": {"cite": ["http", "https", RELATIVE]},
        "img": {"src": ["http", "https", RELATIVE]},
        "ins": {"cite": ["http", "https", RELATIVE]},
    }),
}))

BUILTIN_CONFIGS = {
    "default": DEFAULT,
    "restricted": RESTRICTED,
    "basic": BASIC,
    "relaxed": RELAXED,
}


class Sanitizer:
    """Compiled sanitizer (reference: sanitizer.rs:23-34 Sanitizer struct,
    SelmaSanitizer::new at sanitizer.rs:46-186)."""

    __slots__ = (
        "flags", "allowed_attrs", "allowed_classes", "element_allowed_attrs",
        "element_allowed_classes", "protocol_allowlists",
        "escape_tagfilter", "allow_comments", "allow_doctype", "config",
        "_actions",
    )

    def __init__(self, config=None):
        if config is None:
            config = DEFAULT
        self.config = config
        flags = [0] * TAG_COUNT

        elements = config.get("elements")
        if elements is not None:
            for name in elements:
                if isinstance(name, str):
                    flags[tag_index(name)] |= ALLOW

        remove_contents = config.get("remove_contents")
        if remove_contents is not None:
            if remove_contents is True:
                for i in range(TAG_COUNT):
                    flags[i] |= REMOVE_CONTENTS
            elif remove_contents is False:
                pass
            elif isinstance(remove_contents, (list, tuple)):
                for name in remove_contents:
                    if isinstance(name, str):
                        flags[tag_index(name)] |= REMOVE_CONTENTS
            else:
                raise ValueError(
                    "remove_contents must be `true`, `false`, or an array"
                )

        whitespace = config.get("whitespace_elements")
        if whitespace is not None:
            for name in whitespace:
                if isinstance(name, str):
                    flags[tag_index(name)] |= WRAP_WHITESPACE

        self.flags = flags

        # attribute allowlists (sanitizer.rs:81-113); key "all" is global
        self.allowed_attrs: frozenset = frozenset()
        element_allowed_attrs: dict[str, set] = {}
        attributes = config.get("attributes")
        if attributes:
            global_attrs = set()
            for element, attr_list in attributes.items():
                names = {a for a in attr_list if isinstance(a, str)}
                if element == ALL:
                    global_attrs |= names
                else:
                    element_allowed_attrs.setdefault(str(element), set()).update(names)
            self.allowed_attrs = frozenset(global_attrs)
        self.element_allowed_attrs = {
            k: frozenset(v) for k, v in element_allowed_attrs.items()
        }

        # class allowlists exist in the engine but the config surface never
        # populates them (sanitizer.rs:60 hardcodes vec![]); kept for parity.
        self.allowed_classes: frozenset = frozenset()
        self.element_allowed_classes: dict[str, frozenset] = {}

        # protocol allowlists (sanitizer.rs:115-158, 352-390)
        protocol_allowlists: dict[str, dict[str, list[str]]] = {}
        protocols = config.get("protocols")
        if protocols:
            for element, attr_map in protocols.items():
                per_attr = protocol_allowlists.setdefault(str(element), {})
                for attr_name, proto_list in attr_map.items():
                    if isinstance(proto_list, (list, tuple)):
                        if ALL in proto_list:
                            raise ValueError(
                                "`:all` must be passed outside of an array"
                            )
                        expanded: list[str] = []
                        for p in proto_list:
                            if p == RELATIVE:
                                expanded.extend(("#", "/"))
                            else:
                                expanded.append(str(p))
                        per_attr.setdefault(str(attr_name), []).extend(expanded)
                    elif proto_list == ALL:
                        per_attr[str(attr_name)] = [ALL]
                    else:
                        raise ValueError(
                            "Protocol list must be an array, or just `:all`"
                        )
        self.protocol_allowlists = protocol_allowlists

        # precomputed per-tag removal actions (hot path)
        from .tags import TAG_NAMES
        actions = {}
        for name in TAG_NAMES:
            if self.flags[tag_index(name)] & ALLOW:
                actions[name] = None
            else:
                actions[name] = self.removal_mode(name)
        actions["unknown"] = (
            None if self.flags[tag_index("unknown")] & ALLOW
            else self.removal_mode("unknown")
        )
        self._actions = actions

        self.escape_tagfilter = bool(config.get("escape_tagfilter", True))
        self.allow_comments = bool(config.get("allow_comments", False))
        # native default is True when the key is absent (sanitizer.rs:170-173);
        # the DEFAULT builtin sets it to False explicitly.
        self.allow_doctype = bool(config.get("allow_doctype", True))

    # --- element decisions -------------------------------------------------

    def allow_element(self, tag_lower: str) -> bool:
        return bool(self.flags[tag_index(tag_lower)] & ALLOW)

    def action_for(self, tag_lower: str):
        """Precomputed removal action: None if the tag is allowed, else
        (remove_contents, wrap_whitespace) — one dict probe per element."""
        try:
            return self._actions[tag_lower]
        except KeyError:
            return self._actions["unknown"]

    def element_flags(self, tag_lower: str) -> int:
        return self.flags[tag_index(tag_lower)]

    def removal_mode(self, tag_lower: str) -> tuple[bool, bool]:
        """(remove_contents, wrap_whitespace) for a disallowed element
        (sanitizer.rs:628-658): text-content tags always remove contents."""
        if tag_lower in TEXT_CONTENT_TAGS:
            return True, False
        flags = self.flags[tag_index(tag_lower)]
        return bool(flags & REMOVE_CONTENTS), bool(flags & WRAP_WHITESPACE)

    # --- attribute decisions ----------------------------------------------

    def should_keep_attribute(self, tag_lower, attr_name, unescaped_val) -> bool:
        """(sanitizer.rs:492-543) allowlist + protocol check. class
        filtering is applied separately by the caller."""
        element_attrs = self.element_allowed_attrs.get(tag_lower)
        allowed = (element_attrs is not None and attr_name in element_attrs) or (
            attr_name in self.allowed_attrs
        )
        if not allowed:
            return False
        per_attr = self.protocol_allowlists.get(tag_lower)
        proto_list = per_attr.get(attr_name) if per_attr else None
        if proto_list is None:
            # no sanitization list: reject anything that looks like a
            # protocol (sanitizer.rs:545-547)
            if unescaped_val and "://" in unescaped_val:
                return False
        else:
            if unescaped_val and not has_allowed_protocol(proto_list, unescaped_val):
                return False
        return True


_PROTO_STOP_RE = _re.compile(r"[:/#]")


def has_allowed_protocol(protocols_allowed, attr_val: str) -> bool:
    """Port of the scan in sanitizer.rs:549-581: find the first ':', '/'
    or '#'; '/' means relative path, '#' means anchor, otherwise the
    prefix before ':' is the (case-insensitive) protocol name. (C-level
    search; a stop-char-free value inspects its LAST char and treats
    everything before it as the protocol — quirk preserved from the
    original per-char port.)"""
    if ALL in protocols_allowed:
        return True
    m = _PROTO_STOP_RE.search(attr_val)
    if m is not None:
        pos = m.start()
        ch = attr_val[pos]
    else:
        pos = len(attr_val) - 1
        ch = attr_val[pos]
    if ch == "/":
        return "/" in protocols_allowed
    if ch == "#":
        return "#" in protocols_allowed
    protocol = attr_val[:pos].lower()
    return protocol in protocols_allowed


def unescape_html(value: str) -> str:
    """HTML5 entity unescape (named, numeric, missing-semicolon forms) —
    equivalent of the escapist crate's unescape_html used at
    sanitizer.rs:427-430."""
    if "&" not in value:
        return value
    return _htmlmod.unescape(value)


def escape_html(value: str) -> str:
    """Escape &, <, >, \" (escapist's escape_html)."""
    return (
        value.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_HREF_SAFE = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-_.+!*(),%#@?=;:/~$"
)
# one C-level scan deciding whether the per-char loop is needed at all
# (the overwhelmingly common case for real-world hrefs is all-safe)
_HREF_ALL_SAFE_RE = _re.compile(
    r"[A-Za-z0-9\-_.+!*(),%#@?=;:/~$]*\Z"
)


def escape_href(value: str) -> str:
    """href-context escaping (escapist's escape_href, cmark-style):
    safe bytes pass, & -> &amp;, ' -> &#x27;, everything else
    percent-encoded per UTF-8 byte."""
    if _HREF_ALL_SAFE_RE.match(value) is not None:
        return value
    out = []
    append = out.append
    for ch in value:
        if ch in _HREF_SAFE:
            append(ch)
        elif ch == "&":
            append("&amp;")
        elif ch == "'":
            append("&#x27;")
        else:
            for b in ch.encode("utf-8"):
                append(f"%{b:02X}")
    return "".join(out)
