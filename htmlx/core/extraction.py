"""Structure-preserving text extraction — port of internal/extraction.go
plus the list/indent prefix helpers (internal/helpers.go:1099-1256).

This is the single most parity-critical operator (SURVEY.md §2.1 #18): the
TrackedBuilder last-char state machine, trailing-space preservation, list
markers, and table hand-off must match the reference character-for-character.
"""

from __future__ import annotations

import re

from .dom import ELEMENT, TEXT, Node
from .elements import (
    is_block_element,
    is_inline_element,
    is_known_inline_namespace_prefix,
    is_namespace_tag,
    get_namespace_prefix,
    is_non_content_element,
    is_paragraph_level_block_element,
    should_treat_as_block_element,
)
from .scorer import should_remove_element
from .tables import TrackedBuilder, ensure_newline, ensure_spacing, extract_table
from .textnorm import normalize_text

_PADDING_LEFT_RE = re.compile(r"padding-left:\s*(\d+(?:\.\d+)?)\s*pt")


def _extract_padding_left(node: Node) -> int:
    """helpers.go:1099-1129 — padding-left in pt from the style attribute."""
    if node is None or node.type != ELEMENT:
        return 0
    style = node.attr("style")
    if not style:
        return 0
    m = _PADDING_LEFT_RE.search(style)
    if not m:
        return 0
    try:
        return int(float(m.group(1)))
    except ValueError:
        return 0


def _get_list_prefix(padding_left: int) -> str:
    """helpers.go:1132-1166 — CSS padding-left -> Markdown nesting prefix."""
    if padding_left <= 18:
        return ""
    if padding_left <= 40:
        return "  - "
    if padding_left <= 80:
        return "    - "
    return "      - "


def _list_item_prefix(node: Node) -> str:
    """helpers.go:1177-1212 — '- ' / 'N. ' markers from the DOM structure."""
    if node is None or node.type != ELEMENT or node.data != "li":
        return ""
    depth = 0
    list_parent = None
    p = node.parent
    while p is not None:
        if p.type == ELEMENT and p.data in ("ul", "ol"):
            depth += 1
            if list_parent is None:
                list_parent = p
        p = p.parent
    if depth == 0:
        return ""
    indent = "  " * (depth - 1)
    if list_parent.data == "ol":
        index = 1
        sib = list_parent.first_child
        while sib is not None:
            if sib is node:
                break
            if sib.type == ELEMENT and sib.data == "li":
                index += 1
            sib = sib.next_sibling
        return f"{indent}{index}. "
    return indent + "- "


def _definition_prefix(node: Node) -> str:
    """helpers.go:1221-1235 — ': ' marker for <dd>."""
    if node is None or node.type != ELEMENT or node.data != "dd":
        return ""
    depth = 0
    p = node.parent
    while p is not None:
        if p.type == ELEMENT and p.data == "dl":
            depth += 1
        p = p.parent
    if depth == 0:
        return ""
    return "  " * (depth - 1) + ": "


def _block_list_prefix(node: Node) -> str:
    """helpers.go:1241-1256."""
    if node is None or node.type != ELEMENT:
        return ""
    if node.data == "li":
        return _list_item_prefix(node)
    if node.data == "dd":
        return _definition_prefix(node)
    padding = _extract_padding_left(node)
    if padding > 0:
        return _get_list_prefix(padding)
    return ""


def extract_text_with_structure(
    node: Node,
    tb: TrackedBuilder,
    counters,  # None, or [image_counter, link_counter] mutable list
    table_format: str,
    parent_block: Node | None = None,
    depth: int = 0,
) -> None:
    """Port of extractTextWithStructure (internal/extraction.go:37-176)."""
    if node is None:
        return
    if node.type == ELEMENT and is_non_content_element(node.data):
        return
    if node.type == TEXT:
        text_data = normalize_text(node.data)
        is_inside_inline = False
        if parent_block is not None and parent_block.type == ELEMENT:
            is_inside_inline = is_inline_element(parent_block.data) or is_namespace_tag(parent_block.data)
        has_trailing_space = text_data.endswith(" ") or text_data.endswith("\t")
        content = text_data.strip()
        if is_inside_inline:
            if content:
                tb.write(content)
                # preserve trailing space UNLESS next sibling is a namespace tag
                if has_trailing_space:
                    preserve = True
                    ns = node.next_sibling
                    if ns is not None and ns.type == ELEMENT:
                        nxt = ns.data
                        if is_namespace_tag(nxt) or is_known_inline_namespace_prefix(get_namespace_prefix(nxt)):
                            preserve = False
                    if preserve:
                        tb.write(" ")
        else:
            if content:
                ensure_spacing(tb, " ")
                tb.write(content)
                if has_trailing_space:
                    tb.write(" ")
        return

    if node.type == ELEMENT:
        d = node.data
        if d == "img" and counters is not None:
            counters[0] += 1
            ensure_newline(tb)
            tb.write(f"[IMAGE:{counters[0]}]\n")
            return
        if d == "a" and counters is not None:
            counters[1] += 1
            tb.write(f"[LINK:{counters[1]}]")
            # fall through: children provide the link text
        if d == "br":
            if tb.length > 0 and tb.last_char != "\n":
                tb.write("\n")
            return
        if d == "table":
            extract_table(node, tb, table_format)
            return

        is_paragraph_block = is_paragraph_level_block_element(d)
        is_block = is_block_element(d)
        if not is_block and not is_paragraph_block:
            is_block = should_treat_as_block_element(node)
            if is_block:
                is_paragraph_block = True

        start_len = tb.length
        if is_block and start_len > 0:
            ensure_newline(tb)
            prefix = _block_list_prefix(node)
            if prefix:
                tb.write(prefix)
            start_len = tb.length
        elif is_block and start_len == 0:
            prefix = _block_list_prefix(node)
            if prefix:
                tb.write(prefix)
                start_len = tb.length

        c = node.first_child
        while c is not None:
            extract_text_with_structure(c, tb, counters, table_format, node, depth + 1)
            c = c.next_sibling

        if d == "a" and counters is not None:
            tb.write("[/LINK]")

        has_content = tb.length > start_len
        if is_block and has_content:
            ensure_newline(tb)
            if is_paragraph_block and tb.last_char == "\n":
                tb.write("\n")
        if not is_block and has_content and node.next_sibling is not None and depth > 0:
            ensure_spacing(tb, " ")
    else:
        c = node.first_child
        while c is not None:
            extract_text_with_structure(c, tb, counters, table_format, parent_block, depth + 1)
            c = c.next_sibling


def extract_text_with_structure_and_images(
    node: Node, counters, table_format: str
) -> str:
    """Port of ExtractTextWithStructureAndImages (extraction.go:25-35)."""
    if node is None:
        return ""
    if node.type == ELEMENT and is_non_content_element(node.data):
        return ""
    tb = TrackedBuilder()
    extract_text_with_structure(node, tb, counters, table_format, None, 0)
    return tb.getvalue()


def clean_content_node(node: Node) -> Node | None:
    """Port of CleanContentNode (extraction.go:181-218): two-phase removal of
    boilerplate subtrees; children of removed nodes are not visited."""
    if node is None:
        return None
    to_remove = []
    stack = [node]
    while stack:
        n = stack.pop()
        c = n.first_child
        while c is not None:
            if c.type == ELEMENT and should_remove_element(c):
                to_remove.append(c)
            else:
                stack.append(c)
            c = c.next_sibling
    for n in to_remove:
        if n.parent is not None:
            n.parent.remove_child(n)
    return node
