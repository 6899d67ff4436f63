"""Synthesis of Common-Crawl-style pages from the `documents` table.

The driver's testdata has no html column, so pages are synthesized
deterministically from `documents` (doc_id, text, lang, source) with SQL
string templates. CRITICALLY, each template is defined ONCE here in both
dialects (Spark SQL expression + DuckDB SQL) so the extraction queries in
__spark_entry__.py are value-verifiable: the Spark side builds the page and
runs the REAL extraction engine; the DuckDB oracle computes the expected
extraction output directly from the same template algebra.

documents.text is single-spaced ASCII with no markup characters (verified:
no <, >, &, newlines, tabs, or double spaces at any SF), so the expected
extracted text is an exact SQL concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# URL template: https://{source}.example.com/doc/{doc_id}
URL_SQL = "'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)"
URL_SPARK = "concat('https://', source, '.example.com/doc/', CAST(doc_id AS STRING))"


def _page_sql(article_inner_sql: str) -> str:
    """Full-page template in portable SQL concat form. {inner} is the
    article body AFTER the <h1>. nav/footer are boilerplate the engine must
    strip; the <article> container wins candidate scoring."""
    return (
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head>"
        "<body><nav class=\"nav\"><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>"
        "<article><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || "
        + article_inner_sql
        + " || '</article>"
        "<footer class=\"footer\">Copyright Example Corp</footer></body></html>'"
    )


# article bodies per query family (portable: only || , CAST, column refs)
INNER_TEXT = "'<p>' || text || '</p>'"
INNER_LINKS = (
    "'<p>' || text || '</p><p>See "
    '<a href="https://ref.example.org/p/\' || CAST(doc_id AS VARCHAR) || \'" title="ref">reference</a>'
    " and "
    "<a href=\"/local/' || CAST(doc_id AS VARCHAR) || '\">local docs</a> now</p>'"
)
INNER_IMAGES = (
    "'<p>' || text || '</p>"
    '<img src="https://img.example.com/\' || CAST(doc_id AS VARCHAR) || \'.jpg"'
    " alt=\"Figure ' || CAST(doc_id AS VARCHAR) || '\" width=\"640\" height=\"480\">"
    '<img src="https://img.example.com/deco.png" alt="">\''
)
INNER_MEDIA = (
    "'<p>' || text || '</p>"
    '<video src="https://cdn.example.com/v/\' || CAST(doc_id AS VARCHAR) || \'.mp4" '
    "poster=\"https://cdn.example.com/p/' || CAST(doc_id AS VARCHAR) || '.jpg\" width=\"640\"></video>"
    '<audio src="https://cdn.example.com/a/\' || CAST(doc_id AS VARCHAR) || \'.mp3"></audio>\''
)
INNER_BOILERPLATE = (
    "'<div class=\"sidebar\"><p>junk sidebar words</p></div>"
    "<p>' || text || '</p>"
    "<div class=\"ads\"><p>advert junk</p></div>"
    "<div id=\"sitemap2\"><p>sitemap junk</p></div>'"
)
INNER_TABLE = (
    "'<p>' || text || '</p>"
    "<table><tr><th>K</th><th>V</th></tr>"
    "<tr><td>id</td><td>' || CAST(doc_id AS VARCHAR) || '</td></tr>"
    "<tr><td>lang</td><td>' || lang || '</td></tr></table>'"
)
# entity gauntlet: named/numeric/nbsp + the reference's &amp;amp;
# double-decode quirk — pins the custom entity decoder end-to-end
INNER_ENTITIES = (
    "'<p>AT&amp;T &lt;x&gt; &quot;q&quot; &#8212; a&nbsp;b &amp;amp; caf&eacute; ' || text || '</p>'"
)
# boilerplate nested INSIDE content containers: the scorer must keep the
# content div chain while ShouldRemove prunes the nested sidebar/ads
INNER_NESTED = (
    "'<div class=\"content\"><p>' || text || '</p>"
    "<div class=\"sidebar\"><p>nested sidebar junk</p></div>"
    "<div><p>beta body</p><div class=\"ads\"><p>nested ad junk</p></div></div>"
    "</div><p>gamma body</p>'"
)
# colspan/rowspan table: markdown renderer pads spanned cells with empties
INNER_COLSPAN = (
    "'<p>' || text || '</p><table>"
    "<tr><th colspan=\"2\">Doc ' || CAST(doc_id AS VARCHAR) || '</th><th>L</th></tr>"
    "<tr><td>a</td><td rowspan=\"2\">' || lang || '</td><td>c</td></tr>"
    "<tr><td>d</td><td>e</td></tr></table>'"
)
# dangerous content the sanitizer must strip — every page emits exactly
# 3 audit events (blocked attr + blocked tag + blocked url), making the
# fused lineage/audit pipeline oracle-countable
INNER_AUDIT = (
    "'<p>' || text || '</p>"
    "<div onclick=\"x()\"><script>evil()</script>"
    '<a href="javascript:y">l</a>ok</div>\''
)
# nested ordered-inside-unordered lists: indent + numbering rules
INNER_DEEPLIST = (
    "'<p>' || text || '</p><ul><li>one ' || CAST(doc_id AS VARCHAR) || '</li>"
    "<li>two<ol><li>s1</li><li>s2</li></ol></li><li>three</li></ul>'"
)

PAGE_TEMPLATES = {
    "text": _page_sql(INNER_TEXT),
    "links": _page_sql(INNER_LINKS),
    "images": _page_sql(INNER_IMAGES),
    "media": _page_sql(INNER_MEDIA),
    "boilerplate": _page_sql(INNER_BOILERPLATE),
    "table": _page_sql(INNER_TABLE),
    "entities": _page_sql(INNER_ENTITIES),
    "nested": _page_sql(INNER_NESTED),
    "colspan": _page_sql(INNER_COLSPAN),
    "deeplist": _page_sql(INNER_DEEPLIST),
    "audit": _page_sql(INNER_AUDIT),
}


def pages_from_documents(documents: DataFrame, template: str = "text") -> DataFrame:
    """Build the (url, warc_ts, html, text, lang) pages DataFrame with the
    input_hint schema from a `documents` DataFrame, via pure Spark SQL
    expressions (stays in WholeStageCodegen; no Python)."""
    page_sql = PAGE_TEMPLATES[template]
    return documents.select(
        F.expr(URL_SPARK).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.expr("make_interval(0,0,0,0,0,0,doc_id)")).alias(
            "warc_ts"
        ),
        F.encode(F.expr(_to_spark(page_sql)), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _to_spark(portable_sql: str) -> str:
    """The portable template uses only `||`, CAST(x AS VARCHAR) and column
    refs; Spark accepts `||` but not VARCHAR — rewrite the cast type."""
    return portable_sql.replace("AS VARCHAR", "AS STRING")


def duckdb_pages_cte(template: str = "text") -> str:
    """DuckDB CTE producing the same pages table (for oracle SQL)."""
    page_sql = PAGE_TEMPLATES[template]
    return (
        f"SELECT {URL_SQL} AS url, {page_sql} AS page_html, doc_id, text, lang, source "
        "FROM documents"
    )
