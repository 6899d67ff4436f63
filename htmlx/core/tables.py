"""HTML table extraction and rendering — port of internal/table/ and the
cell accessors in internal/table.go.

Markdown rendering: majority-vote column alignment, colspan expansion to
placeholder cells, width-only structure rows skipped, per-column max-width
padding (render.go:100-375). HTML rendering re-emits the table with
style/colspan/rowspan (render.go:378-455).
"""

from __future__ import annotations

from .dom import ELEMENT, Node, walk_nodes
from .textnorm import BOUNDARY_CSS, get_text_content, has_word_boundary

ALIGN_LEFT = 0
ALIGN_CENTER = 1
ALIGN_RIGHT = 2
ALIGN_JUSTIFY = 3
ALIGN_DEFAULT = 4


class CellData:
    __slots__ = (
        "text",
        "align",
        "colspan",
        "rowspan",
        "is_header",
        "width",
        "is_expanded",
        "original_colspan",
    )

    def __init__(
        self,
        text=" ",
        align=ALIGN_DEFAULT,
        colspan=1,
        rowspan=1,
        is_header=False,
        width="",
        is_expanded=False,
        original_colspan=1,
    ):
        self.text = text
        self.align = align
        self.colspan = colspan
        self.rowspan = rowspan
        self.is_header = is_header
        self.width = width
        self.is_expanded = is_expanded
        self.original_colspan = original_colspan


class TrackedBuilder:
    """Port of table.TrackedBuilder (table/types.go:50-91): a string builder
    that tracks the last written character."""

    __slots__ = ("parts", "length", "last_char")

    def __init__(self):
        self.parts: list[str] = []
        self.length = 0
        self.last_char = ""

    def write(self, s: str) -> None:
        if s:
            self.parts.append(s)
            self.length += len(s)
            self.last_char = s[-1]

    def __len__(self):
        return self.length

    def getvalue(self) -> str:
        return "".join(self.parts)


def ensure_newline(tb: TrackedBuilder) -> None:
    """table/types.go:79-83."""
    if tb.length > 0 and tb.last_char != "\n":
        tb.write("\n")


def ensure_spacing(tb: TrackedBuilder, char: str = " ") -> None:
    """table/types.go:86-90."""
    if tb.length > 0 and tb.last_char != " " and tb.last_char != "\n":
        tb.write(char)


# ---------------------------------------------------------------------------
# Cell accessors (internal/table.go:83-210)
# ---------------------------------------------------------------------------

def _contains_word(text: str, word: str) -> bool:
    return has_word_boundary(text, word, BOUNDARY_CSS)


def get_cell_align(n: Node) -> int:
    """internal/table.go:83-135."""
    if n is None:
        return ALIGN_DEFAULT
    style_attr = ""
    for key, val in n.attrs:
        k = key.lower()
        if k == "align":
            v = val.strip().lower()
            if v == "left":
                return ALIGN_LEFT
            if v == "center":
                return ALIGN_CENTER
            if v == "right":
                return ALIGN_RIGHT
            if v == "justify":
                return ALIGN_JUSTIFY
        elif k == "style":
            style_attr = val
    if style_attr:
        style = style_attr.lower().replace(" :", ":").replace(": ", ":")
        if _contains_word(style, "text-align:justify"):
            return ALIGN_JUSTIFY
        if _contains_word(style, "text-align:right"):
            return ALIGN_RIGHT
        if _contains_word(style, "text-align:center"):
            return ALIGN_CENTER
        if _contains_word(style, "text-align:left"):
            return ALIGN_LEFT
    return ALIGN_DEFAULT


def _get_span(n: Node, name: str) -> int:
    for key, val in n.attrs:
        if key.lower() == name:
            try:
                v = int(val.strip())
                if v > 0:
                    return v
            except ValueError:
                pass
    return 1


def get_cell_width(n: Node) -> str:
    """internal/table.go:171-210."""
    if n is None:
        return ""
    for key, val in n.attrs:
        if key.lower() == "width":
            w = val.strip()
            if w and w != "0":
                return w
    for key, val in n.attrs:
        if key.lower() == "style":
            style = val
            lower = style.lower()
            idx = lower.find("width:")
            if idx >= 0:
                start = idx + 6
                while start < len(style) and style[start] in " \t":
                    start += 1
                end = start
                while end < len(style) and style[end] not in ";\"'}":
                    end += 1
                w = style[start:end].strip()
                if w and w not in ("0", "0px", "0%"):
                    return w
    return ""


# ---------------------------------------------------------------------------
# Table data extraction (table/processor.go:49-166)
# ---------------------------------------------------------------------------

def _sanitize_cell_text(text: str) -> str:
    """table/processor.go:160-166."""
    text = text.strip()
    return text if text else " "


def _extract_row_cells(row: Node) -> list[CellData]:
    cells = []
    c = row.first_child
    while c is not None:
        if c.type == ELEMENT and c.data in ("td", "th"):
            colspan = _get_span(c, "colspan")
            cells.append(
                CellData(
                    text=_sanitize_cell_text(get_text_content(c)),
                    align=get_cell_align(c),
                    colspan=colspan,
                    rowspan=_get_span(c, "rowspan"),
                    is_header=c.data == "th",
                    width=get_cell_width(c),
                    original_colspan=colspan,
                )
            )
        c = c.next_sibling
    return cells


def _is_structure_row(cells: list[CellData]) -> bool:
    """render.go:32-46 — width-only rows with no real content."""
    has_width_definitions = True
    has_real_content = False
    for cell in cells:
        if cell.width == "":
            has_width_definitions = False
        if cell.text not in (" ", "", " "):
            has_real_content = True
    return has_width_definitions and not has_real_content


def _expand_colspan_cells(raw_cells: list[CellData]) -> list[CellData]:
    """render.go:50-74."""
    cells = []
    for rc in raw_cells:
        cells.append(rc)
        for _ in range(1, rc.colspan):
            cells.append(
                CellData(
                    text=" ",
                    align=rc.align,
                    colspan=1,
                    rowspan=rc.rowspan,
                    is_header=rc.is_header,
                    width="",
                    is_expanded=True,
                    original_colspan=1,
                )
            )
    return cells


def extract_table(table: Node, tb: TrackedBuilder, table_format: str) -> None:
    """Port of table.Processor.Extract (table/processor.go:49-83)."""
    if table is None:
        return
    ensure_newline(tb)
    if tb.last_char == "\n":
        tb.write("\n")

    table_data: list[list[CellData]] = []
    col_widths: list[str] = []

    def visit(node: Node) -> bool:
        nonlocal col_widths
        if node.type != ELEMENT or node.data != "tr":
            return True
        raw_cells = _extract_row_cells(node)
        if not raw_cells:
            return False
        structure = _is_structure_row(raw_cells)
        cells = raw_cells if table_format == "html" else _expand_colspan_cells(raw_cells)
        if structure:
            # collect widths (render.go:77-85)
            for i, cell in enumerate(raw_cells):
                while len(col_widths) <= i:
                    col_widths.append("")
                if cell.width:
                    col_widths[i] = cell.width
        if table_format == "html":
            table_data.append(cells)
        elif not structure:
            table_data.append(cells)
        return False  # don't recurse into rows

    walk_nodes(table, visit)

    if not table_data:
        return
    max_cols = max(len(row) for row in table_data)
    if table_format == "html":
        _render_html(table_data, tb)
    else:
        _render_markdown(table_data, tb, max_cols, col_widths)

    tb.write("\n")
    if tb.last_char == "\n":
        tb.write("\n")


# ---------------------------------------------------------------------------
# Markdown rendering (render.go:100-375)
# ---------------------------------------------------------------------------

def _determine_column_alignment(counts: dict, first_row: list[CellData], col_idx: int) -> str:
    """render.go:193-240."""
    max_count = 0
    majority = ALIGN_DEFAULT
    for align in (ALIGN_LEFT, ALIGN_CENTER, ALIGN_RIGHT, ALIGN_JUSTIFY):
        if counts[align] > max_count:
            max_count = counts[align]
            majority = align
    if max_count == 0 and len(first_row) > col_idx:
        majority = first_row[col_idx].align
    if counts[ALIGN_LEFT] > 0 and counts[ALIGN_RIGHT] > 0:
        return "---"
    return {ALIGN_LEFT: ":---", ALIGN_CENTER: ":--:", ALIGN_RIGHT: "---:"}.get(majority, "---")


def _render_markdown(table_data, tb: TrackedBuilder, max_cols: int, structure_row_widths) -> None:
    # pad rows (render.go:141-148)
    for row in table_data:
        while len(row) < max_cols:
            row.append(CellData(text=" ", align=ALIGN_DEFAULT))

    # column alignments by majority vote (render.go:153-190)
    col_aligns = []
    align_counts = [
        {ALIGN_LEFT: 0, ALIGN_CENTER: 0, ALIGN_RIGHT: 0, ALIGN_JUSTIFY: 0, ALIGN_DEFAULT: 0}
        for _ in range(max_cols)
    ]
    for row in table_data:
        for i in range(min(max_cols, len(row))):
            cell = row[i]
            if not cell.is_expanded and cell.text != " " and cell.align != ALIGN_DEFAULT:
                align_counts[i][cell.align] += 1
    for i in range(max_cols):
        col_aligns.append(_determine_column_alignment(align_counts[i], table_data[0], i))

    # max text width per column (render.go:244-256); Go len() = UTF-8 bytes
    col_max_widths = [0] * max_cols
    for row in table_data:
        for j in range(min(max_cols, len(row))):
            tl = len(row[j].text.encode("utf-8"))
            if tl > col_max_widths[j]:
                col_max_widths[j] = tl

    # filter out columns that are entirely empty expanded cells (render.go:261-287)
    new_to_old = []
    for j in range(max_cols):
        all_expanded = True
        for row in table_data:
            if j < len(row) and (not row[j].is_expanded or row[j].text not in (" ", "")):
                all_expanded = False
                break
        if not all_expanded:
            new_to_old.append(j)

    inc_aligns = [col_aligns[j] for j in new_to_old]
    inc_widths = [max(col_max_widths[j], 3) for j in new_to_old]
    num_cols = len(new_to_old)

    if table_data:
        _render_markdown_row(tb, table_data[0], new_to_old, inc_aligns, inc_widths, num_cols)
        tb.write("| ")
        tb.write(" | ".join(inc_aligns))
        tb.write(" |\n")
        for row in table_data[1:]:
            _render_markdown_row(tb, row, new_to_old, inc_aligns, inc_widths, num_cols)


def _render_markdown_row(tb: TrackedBuilder, row, new_to_old, col_aligns, col_max_widths, num_cols) -> None:
    """render.go:337-375."""
    tb.write("| ")
    for new_j, old_j in enumerate(new_to_old):
        cell_text = row[old_j].text if old_j < len(row) else " "
        max_width = col_max_widths[new_j]
        pad = max_width - len(cell_text.encode("utf-8"))
        if pad < 0:
            pad = 0
        align = col_aligns[new_j]
        if align == "---:":
            tb.write(" " * pad)
            tb.write(cell_text)
        elif align == ":--:":
            left = pad // 2
            tb.write(" " * left)
            tb.write(cell_text)
            tb.write(" " * (pad - left))
        else:  # ":---" and default: left
            tb.write(cell_text)
            tb.write(" " * pad)
        if new_j < num_cols - 1:
            tb.write(" | ")
    tb.write(" |\n")


# ---------------------------------------------------------------------------
# HTML rendering (render.go:378-455)
# ---------------------------------------------------------------------------

def _build_cell_style(cell: CellData) -> str:
    """render.go:433-455."""
    if cell.align == ALIGN_DEFAULT and (cell.width == "" or cell.is_expanded):
        return ""
    parts = []
    style_align = {
        ALIGN_LEFT: "text-align:left",
        ALIGN_CENTER: "text-align:center",
        ALIGN_RIGHT: "text-align:right",
        ALIGN_JUSTIFY: "text-align:justify",
    }.get(cell.align)
    if style_align:
        parts.append(style_align)
    if cell.width and not cell.is_expanded:
        parts.append("width:" + cell.width)
    return ";".join(parts)


def _render_html(table_data, tb: TrackedBuilder) -> None:
    tb.write("<table>\n")
    for row in table_data:
        tb.write("  <tr>\n")
        for cell in row:
            tag = "th" if cell.is_header else "td"
            tb.write("    <" + tag)
            style = _build_cell_style(cell)
            if style:
                tb.write(' style="' + style + '"')
            if cell.original_colspan > 1 and not cell.is_expanded:
                tb.write(' colspan="' + str(cell.original_colspan) + '"')
            if cell.rowspan > 1:
                tb.write(' rowspan="' + str(cell.rowspan) + '"')
            tb.write(">")
            tb.write(cell.text)
            tb.write("</" + tag + ">\n")
        tb.write("  </tr>\n")
    tb.write("</table>")
