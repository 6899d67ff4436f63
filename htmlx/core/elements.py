"""Block/inline element classification — port of internal/elements.go."""

from __future__ import annotations

from .dom import ELEMENT, TEXT, Node

# internal/elements.go:11-39
INLINE_ELEMENTS = frozenset(
    (
        "font b i u s strike del ins strong em mark small sub sup big tt "
        "span a code kbd samp var abbr cite q dfn time data ruby rt rp bdi wbr "
        "img svg picture video audio canvas object embed iframe map "
        "input button select textarea label output br "
        "script style link meta title"
    ).split()
)

# internal/elements.go:43-77
BLOCK_ELEMENTS = frozenset(
    (
        "p div pre blockquote h1 h2 h3 h4 h5 h6 "
        "article section main nav aside header footer figure figcaption "
        "ul ol li dl dt dd table thead tbody tfoot tr td th form fieldset "
        "details summary dialog hr address body html head center canvas"
    ).split()
)

# internal/elements.go:84-87 (form intentionally excluded)
NON_CONTENT_TAGS = frozenset("script style noscript nav aside footer header".split())

# internal/elements.go:91-99
KNOWN_INLINE_NS_PREFIXES = frozenset("ix xbrl dei us-gaap ifrs link xlink".split())

# internal/elements.go:146-168 — paragraph-level blocks get double newlines
_PARAGRAPH_LEVEL = frozenset(
    (
        "p div h1 h2 h3 h4 h5 h6 article section main blockquote pre "
        "ul ol table figure figcaption address fieldset details summary dialog "
        "canvas dd"
    ).split()
)
_NON_PARAGRAPH_BLOCK = frozenset(
    (
        "li dt dl thead tbody tfoot tr td th hr body html head "
        "nav aside header footer form center"
    ).split()
)


def is_block_element(tag: str) -> bool:
    return tag in BLOCK_ELEMENTS


def is_inline_element(tag: str) -> bool:
    return tag in INLINE_ELEMENTS


def is_non_content_element(tag: str) -> bool:
    return tag in NON_CONTENT_TAGS


def is_paragraph_level_block_element(tag: str) -> bool:
    """internal/elements.go:145-169."""
    if tag in _PARAGRAPH_LEVEL:
        return True
    if tag in _NON_PARAGRAPH_BLOCK:
        return False
    return tag in BLOCK_ELEMENTS


def is_namespace_tag(tag: str) -> bool:
    return ":" in tag


def get_namespace_prefix(tag: str) -> str:
    parts = tag.split(":", 1)
    return parts[0] if len(parts) == 2 else ""


def is_known_inline_namespace_prefix(prefix: str) -> bool:
    return prefix in KNOWN_INLINE_NS_PREFIXES


def should_treat_namespace_tag_as_inline(node: Node) -> bool:
    """internal/elements.go:189-249."""
    if node is None or node.type != ELEMENT:
        return False
    has_element_children = False
    text_length = 0
    text_node_count = 0
    newline_count = 0
    c = node.first_child
    while c is not None:
        if c.type == ELEMENT:
            has_element_children = True
        elif c.type == TEXT:
            t = c.data.strip()
            if t:
                text_node_count += 1
                text_length += len(t.encode("utf-8"))
            newline_count += c.data.count("\n")
        c = c.next_sibling
    if has_element_children:
        return False
    if newline_count > 0:
        return False
    if text_length > 50:
        return False
    if text_node_count > 1:
        return False
    p = node.parent
    if p is not None and p.type == ELEMENT and is_inline_element(p.data):
        return True
    return get_namespace_prefix(node.data) in KNOWN_INLINE_NS_PREFIXES


def _is_structured_data_tag(tag: str) -> bool:
    """internal/elements.go:341-358."""
    if not tag:
        return False
    if "-" in tag or "_" in tag:
        return True
    return len(tag) > 8


def should_treat_as_block_element(node: Node) -> bool:
    """internal/elements.go:254-333 — dynamic block classification for
    unknown/custom/namespaced tags (XBRL, SEC filings)."""
    if node is None or node.type != ELEMENT:
        return False
    if is_namespace_tag(node.data):
        return not should_treat_namespace_tag_as_inline(node)
    if is_inline_element(node.data):
        return False
    has_element_children = False
    has_text_content = False
    text_length = 0
    newline_count = 0
    child_count = 0
    c = node.first_child
    while c is not None:
        child_count += 1
        if c.type == ELEMENT:
            has_element_children = True
        elif c.type == TEXT:
            t = c.data.strip()
            if t:
                has_text_content = True
                text_length += len(t.encode("utf-8"))
                newline_count += c.data.count("\n")
        c = c.next_sibling
    if child_count > 1 or has_element_children:
        return True
    if has_text_content and text_length > 50:
        return True
    if newline_count > 0:
        return True
    if _is_structured_data_tag(node.data):
        return True
    p = node.parent
    if p is not None and p.type == ELEMENT and _is_structured_data_tag(p.data):
        return True
    return False
