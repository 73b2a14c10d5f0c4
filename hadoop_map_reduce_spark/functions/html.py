"""HTML → text extraction as pure Column expressions.

The curation step between WARC ingestion (``sources/warc.py``) and the
text-quality/dedup operators: strip script/style/comment blocks, drop
tags, decode the minimal entity set, collapse whitespace. All
``regexp_replace`` chains — JVM codegen, no Python in the per-row
path, embarrassingly parallel at any corpus size (the 100-TB shape:
one shuffle-free scan).

Scope note (deliberate): this is the regex tier of HTML cleaning —
the right cost/quality point for bulk corpus filtering, equivalent to
what a first-pass CC pipeline runs before any DOM-accurate extraction.
It is NOT a spec-compliant HTML5 parser (no entity table beyond the
core six, no CDATA, no conditional comments); a DOM-quality extractor
is a Pandas-UDF tier above, out of scope while the environment ships
no parser library.

Dialect discipline: patterns stay inside the Java∩RE2 regex subset so
the DuckDB oracle (``curation_html_extract``) runs the IDENTICAL
strings. Crucially that means NO bare ``\\s`` — Java's ``\\s``
includes U+000B (vertical tab) while RE2's does not (round-6 review
finding, confirmed on both engines), so whitespace is always the
explicit class ``_WS`` below, which both dialects read identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Explicit whitespace class = Java's \s charset, spelled out so RE2
# agrees byte-for-byte (RE2's \s lacks \x0B).
_WS = r"[ \t\n\x0B\f\r]"

# (pattern, replacement) pairs applied in order; flags inline so the
# same pattern strings work in Java (Spark) and RE2 (DuckDB 'g' flag).
# Block closers and the generic tag strip both emit a space — the
# final whitespace collapse folds runs, so words never concatenate.
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]

# Decoded in order; &amp; LAST so double-encoded text (&amp;lt;) decodes
# exactly one level, matching every standard entity decoder.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """Extracted text of an HTML payload: tags/scripts/styles/comments
    stripped, core entities decoded, whitespace collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in HTML_STRIP_STEPS:
        c = F.regexp_replace(c, pattern, repl)
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, _WS + "+", " ")
    return F.trim(c)


def html_to_text_sql(expr: str) -> str:
    """The DuckDB twin of :func:`html_to_text` over SQL expression
    ``expr`` — same pattern strings, same order, RE2 flags via the
    inline groups already embedded in the patterns."""
    c = expr
    for pattern, repl in HTML_STRIP_STEPS:
        lit = pattern.replace("'", "''")
        rep = repl.replace("'", "''")
        c = f"regexp_replace({c}, '{lit}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITIES:
        e = ent.replace("'", "''")
        h = ch.replace("'", "''")
        c = f"replace({c}, '{e}', '{h}')"
    ws = (_WS + "+").replace("'", "''")
    c = f"regexp_replace({c}, '{ws}', ' ', 'g')"
    return f"trim({c})"
