"""[EXT] HTML → text extraction — stage 0 of a web-scrape pipeline.

Every text operator in this repo (cleaning → dedup → quality → tokenize)
starts from clean ``documents.text``; a real 100 TB pipeline starts from
raw HTML inside WARC records. This module is the deterministic extraction
stage between the two: strip the non-content machinery (comments,
script/style blocks, tags), decode the entity layer, normalize
whitespace — the same class of pure-spec byte work as the shipped codecs
(multimodal.py), and like them defined precisely enough that a DuckDB
oracle replays it byte-for-byte.

The whole transform is ONE chain of ``regexp_replace`` Column expressions
plus a single ``aggregate`` HOF for numeric entities — JVM whole-stage
codegen end to end, zero UDFs, zero shuffles: at 100 TB this fuses into
the WARC/parquet scan exactly like the quality heuristics (text.py).

Extraction spec (deterministic, documented — the contract tests pin):

1. remove HTML comments ``<!-- … -->`` (non-greedy, across newlines);
2. remove ``<script …>…</script>`` and ``<style …>…</style>`` WITH their
   contents (case-insensitive, non-greedy; a ``</script>`` literal inside
   a JS string ends the block — spec-level simplification, documented);
3. every remaining complete tag ``<…>`` → one space (block/inline tags
   are not distinguished: whitespace collapse makes them equivalent);
   an UNTERMINATED ``<`` (malformed input) stays literal text — the
   quarantine-free contract: extraction is total, malformed markup
   degrades to visible text instead of failing rows (there is no binary
   decode here, so unlike the codecs there is no corrupt-payload lane to
   route to — the worst malformed case is stray text, which the
   downstream quality filters are built to score down);
4. decode NUMERIC entities — decimal ``&#N;`` and hex ``&#xHH;`` — for
   1 ≤ value ≤ 255 (the Latin-1 range where Spark ``char`` and DuckDB
   ``chr`` agree character-for-character; larger codepoints pass through
   literally — documented seam, same class as the codec-library seams);
5. decode the curated NAMED set (:data:`NAMED_ENTITIES` — structural +
   punctuation/symbol entities) with ``&amp;`` LAST (the classic
   double-decode pitfall: ``&amp;lt;`` must yield the literal text
   ``&lt;``, not ``<``);
6. collapse whitespace runs (explicit class — Java regex and RE2 disagree
   on ``\\s``'s vertical tab; NBSP, what ``&nbsp;`` decodes to, collapses
   like a space) to one space and trim.

Reference scope: the zio-analytics reference has no source surface beyond
fromLiterals (DataStream.scala:87-88); this is [EXT] for the LLM-pipeline
north star (SURVEY.md §2), asked for by the round-9 verdict (#2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["html_text_expr", "html_paragraphs_expr", "html_extract_text",
           "html_extract_paragraphs", "html_extract_links", "NAMED_ENTITIES"]

#: whitespace-collapse class shared with the oracle (explicit — no \s)
_WS = r"[ \t\n\r\f\x0B\u00A0]+"

#: the curated NAMED entity set, decoded in this exact order — ``amp``
#: strictly LAST (the double-decode pitfall: ``&amp;lt;`` must yield the
#: literal text ``&lt;``, never ``<``; every other entry's output
#: contains no '&', so their relative order is immaterial). The catalog
#: oracle generates its replace chain from THIS list, so the two engines
#: cannot drift. Round-12 (verdict ask #5): the full HTML 4 Latin-1
#: named set (``&eacute;`` …, codepoints 0xA1-0xFF — the same
#: chr-range-agreement bound as the numeric decoder) joins the curated
#: structural/punctuation set, so accented-entity text reaches dedup as
#: characters, not literals. Out-of-Latin-1 names (``&alpha;``,
#: ``&mdash;``-style Unicode already curated above) beyond the curated
#: set still pass through — the documented seam.
NAMED_ENTITIES: list[tuple[str, str]] = [
    ("lt", "<"),
    ("gt", ">"),
    ('quot', '"'),
    ("apos", "'"),
    ("nbsp", " "),
    ("mdash", "—"),
    ("ndash", "–"),
    ("hellip", "…"),
    ("lsquo", "‘"),
    ("rsquo", "’"),
    ("ldquo", "“"),
    ("rdquo", "”"),
    ("bull", "•"),
    ("middot", "·"),
    ("copy", "©"),
    ("reg", "®"),
    ("trade", "™"),
    ("deg", "°"),
    ("plusmn", "±"),
    ("sect", "§"),
    ("para", "¶"),
    ("laquo", "«"),
    ("raquo", "»"),
    ("times", "×"),
    ("divide", "÷"),
    ("euro", "€"),
    ("pound", "£"),
    ("yen", "¥"),
    ("cent", "¢"),
    # --- HTML 4 Latin-1 named set (0xA1-0xFF; generated from the public
    # html.entities table, frozen here for review + cross-engine order) ---
    ("iexcl", "¡"),
    ("curren", "¤"),
    ("brvbar", "¦"),
    ("uml", "¨"),
    ("ordf", "ª"),
    ("not", "¬"),
    ("shy", "­"),
    ("macr", "¯"),
    ("sup2", "²"),
    ("sup3", "³"),
    ("acute", "´"),
    ("micro", "µ"),
    ("cedil", "¸"),
    ("sup1", "¹"),
    ("ordm", "º"),
    ("frac14", "¼"),
    ("frac12", "½"),
    ("frac34", "¾"),
    ("iquest", "¿"),
    ("Agrave", "À"),
    ("Aacute", "Á"),
    ("Acirc", "Â"),
    ("Atilde", "Ã"),
    ("Auml", "Ä"),
    ("Aring", "Å"),
    ("AElig", "Æ"),
    ("Ccedil", "Ç"),
    ("Egrave", "È"),
    ("Eacute", "É"),
    ("Ecirc", "Ê"),
    ("Euml", "Ë"),
    ("Igrave", "Ì"),
    ("Iacute", "Í"),
    ("Icirc", "Î"),
    ("Iuml", "Ï"),
    ("ETH", "Ð"),
    ("Ntilde", "Ñ"),
    ("Ograve", "Ò"),
    ("Oacute", "Ó"),
    ("Ocirc", "Ô"),
    ("Otilde", "Õ"),
    ("Ouml", "Ö"),
    ("Oslash", "Ø"),
    ("Ugrave", "Ù"),
    ("Uacute", "Ú"),
    ("Ucirc", "Û"),
    ("Uuml", "Ü"),
    ("Yacute", "Ý"),
    ("THORN", "Þ"),
    ("szlig", "ß"),
    ("agrave", "à"),
    ("aacute", "á"),
    ("acirc", "â"),
    ("atilde", "ã"),
    ("auml", "ä"),
    ("aring", "å"),
    ("aelig", "æ"),
    ("ccedil", "ç"),
    ("egrave", "è"),
    ("eacute", "é"),
    ("ecirc", "ê"),
    ("euml", "ë"),
    ("igrave", "ì"),
    ("iacute", "í"),
    ("icirc", "î"),
    ("iuml", "ï"),
    ("eth", "ð"),
    ("ntilde", "ñ"),
    ("ograve", "ò"),
    ("oacute", "ó"),
    ("ocirc", "ô"),
    ("otilde", "õ"),
    ("ouml", "ö"),
    ("oslash", "ø"),
    ("ugrave", "ù"),
    ("uacute", "ú"),
    ("ucirc", "û"),
    ("uuml", "ü"),
    ("yacute", "ý"),
    ("thorn", "þ"),
    ("yuml", "ÿ"),
    ("amp", "&"),
]


#: intra-tag whitespace class — EXPLICIT, like _WS: Java regex \s includes
#: U+000B but RE2's \s does not, so '</p\x0B>' would extract differently
#: across engines if either side used \s (round-10 ADVICE). Both engines
#: get this exact class; \x0B is kept (Java-\s-compatible, and RE2 accepts
#: the explicit escape even though its \s omits it).
_TAG_WS = r"[ \t\n\r\f\x0B]"

#: block-structure END tags (and <br>) — what separates PARAGRAPHS in
#: the paragraph-preserving chain; same regex subset in Java and RE2
BLOCK_END_PATTERN = (
    r"(?is)</(p|div|h[1-6]|li|tr|td|table|ul|ol|blockquote|section|article)"
    rf"{_TAG_WS}*>|<br{_TAG_WS}*/?{_TAG_WS}*>"
)


def _strip_noise(col: Column) -> Column:
    """Steps 1-2: comments, then script/style with their contents ((?s):
    dot spans newlines; (?i): case-insensitive — both flags identical in
    Java regex and the oracle's RE2)."""
    s = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"(?is)<script\b[^>]*>.*?</script>", " ")
    return F.regexp_replace(s, r"(?is)<style\b[^>]*>.*?</style>", " ")


def html_text_expr(col: Column) -> Column:
    """The full extraction chain as one Column expression (module
    docstring spec). Compose it anywhere a text column is born from
    HTML — e.g. as stage 0 ahead of cleaning.boilerplate_removal."""
    s = _strip_noise(col)
    # 3: every complete tag (incl. DOCTYPE/PI) -> one space; a lone
    # unterminated '<' stays literal text
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    # 4: numeric entities (decimal AND hex) via ONE aggregate over the
    # '&#'-split fragments: "233;rest" -> char(233)+"rest", "xE9;rest" ->
    # char(0xE9)+"rest" when in the engine-agreeing 1..255 range, else
    # the '&#' is restored verbatim
    s = _decode_entities(s)
    # 6: collapse + trim (the collapse emits only ASCII spaces, which is
    # exactly what trim strips)
    return F.trim(F.regexp_replace(s, _WS, " "))


def html_paragraphs_expr(col: Column) -> Column:
    """PARAGRAPH-preserving extraction: identical to
    :func:`html_text_expr` except block-structure END tags (and ``<br>``,
    :data:`BLOCK_END_PATTERN`) become NEWLINES before the generic tag
    strip, and whitespace collapse keeps them — so the output's ``\n``
    separators carry the document's paragraph structure straight into
    ``dedup.dedup_paragraphs(sep='\n')`` and the line-level cleaning
    tier. Literal newlines in source text count as breaks too (they ARE
    line structure). Same engine story: pure codegen Columns, map-only."""
    s = _strip_noise(col)
    s = F.regexp_replace(s, BLOCK_END_PATTERN, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    s = _decode_entities(s)
    # collapse non-newline whitespace, then fold newline runs (with any
    # surrounding spaces) to ONE newline, then trim both kinds at ends
    s = F.regexp_replace(s, r"[ \t\r\f\x0B\u00A0]+", " ")
    s = F.regexp_replace(s, r" *\n[\n ]*", "\n")
    return F.regexp_replace(s, r"^[\n ]+|[\n ]+$", "")


def _decode_entities(s: Column) -> Column:
    """Steps 4-5: numeric (decimal + hex, 1..255) then the curated named
    set, amp strictly last.

    Expression-shape contract (round-16, guide §4-adjacent): higher-order
    functions are CodegenFallback, and Catalyst's subexpression
    elimination skips any tree containing lambda variables — so every
    extra Column reference in here re-evaluates its WHOLE upstream input
    (the 14-regexp strip chain) per row, interpreted. The split is
    therefore referenced exactly ONCE: a transform() tags each fragment
    with its decoded numeric value (binding ``_val(p)`` once per element
    instead of twice), and a single aggregate() walks the tagged array
    carrying a first-element flag — replacing the old
    ``concat(element_at(parts, 1), aggregate(slice(parts, 2, …)))``
    shape, which referenced the split (and its strip-chain input) three
    times. Semantics are bit-identical (differential corpus in
    test_html); only the reference count changed."""
    _strip = r"^([0-9]{1,3}|[xX][0-9a-fA-F]{1,2});"

    def _val(p: Column) -> Column:
        # try_cast: a fragment with no leading entity extracts '' (ANSI
        # cast would throw); NULL falls through to the otherwise branch
        dec = F.regexp_extract(p, r"^([0-9]{1,3});", 1).try_cast("int")
        hxs = F.regexp_extract(p, r"^[xX]([0-9a-fA-F]{1,2});", 1)
        return F.coalesce(
            dec, F.when(hxs != "", F.conv(hxs, 16, 10).cast("int"))
        )

    tagged = F.transform(
        F.split(s, r"&#"),
        lambda p: F.struct(p.alias("p"), _val(p).alias("v")),
    )
    s = F.aggregate(
        tagged,
        F.struct(F.lit("").cast("string").alias("s"), F.lit(True).alias("f")),
        lambda acc, x: F.struct(
            F.concat(
                acc["s"],
                F.when(acc["f"], x["p"]).otherwise(
                    F.when(
                        x["v"].between(1, 255),
                        F.concat(
                            F.char(x["v"]),
                            F.regexp_replace(x["p"], _strip, ""),
                        ),
                    ).otherwise(F.concat(F.lit("&#"), x["p"]))
                ),
            ).alias("s"),
            F.lit(False).alias("f"),
        ),
        lambda acc: acc["s"],
    )
    for name, ch in NAMED_ENTITIES:
        s = F.replace(s, F.lit(f"&{name};"), F.lit(ch))
    return s


def html_extract_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Extract visible text from an HTML column → ``(id, text, n_chars)``.

    One narrow projection — no shuffle, no UDF; at 100 TB this is a
    map-only stage fused into the scan, feeding the cleaning → dedup →
    quality chain that previously had to assume pre-extracted text."""
    # two-step select (round-16): the chain contains a CodegenFallback
    # HOF, so it is excluded from subexpression elimination — projecting
    # it twice (text + length) evaluated it twice per row. CollapseProject
    # refuses to merge a Project whose non-cheap alias the consumer
    # references more than once, so the chain stays in its own Project
    # and evaluates ONCE.
    out = html_text_expr(F.col(html_col))
    return df.select(F.col(id_col), out.alias("text")).select(
        F.col(id_col),
        F.col("text"),
        F.length("text").alias("n_chars"),
    )


def html_extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Crawl-frontier extraction → ``(id, title, links array<string>,
    n_links)`` — the OTHER consumer of raw HTML beside visible text: the
    next-hop URL list that feeds a crawler's frontier, plus the page
    title for provenance/ranking.

    Spec (deterministic, oracle-replayable):

    - ``links``: every ``href`` value of an ``<a …>`` tag —
      double-quoted values in document order, then single-quoted ones
      (two extraction passes; a crawler's frontier is a SET, so relative
      order across quote styles is immaterial and keeping the passes
      separate keeps both regexes trivially cross-engine); ``&amp;``
      inside URLs decodes (the one entity that legitimately appears in
      query strings);
    - ``title``: the first ``<title>`` element's contents,
      whitespace-collapsed and trimmed (same class as html_text_expr's
      step 6).

    Same scale shape as :func:`html_extract_text`: pure regexp Column
    expressions, map-only, fuses into the scan. ``keep_cols`` passes
    extra input columns through the projection (e.g. the page's
    ``base_url`` for canonicalization downstream) — a passthrough, not
    a join, so the streaming lane stays stateless."""
    dq = F.regexp_extract_all(
        F.col(html_col),
        F.lit(rf'(?is)<a\b[^>]*?href{_TAG_WS}*={_TAG_WS}*"([^"]*)"'),
        1,
    )
    sq = F.regexp_extract_all(
        F.col(html_col),
        F.lit(rf"(?is)<a\b[^>]*?href{_TAG_WS}*={_TAG_WS}*'([^']*)'"),
        1,
    )
    links = F.transform(
        F.concat(dq, sq), lambda u: F.replace(u, F.lit("&amp;"), F.lit("&"))
    )
    title = F.trim(
        F.regexp_replace(
            F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1),
            _WS,
            " ",
        )
    )
    # two-step select (round-16): links contains a transform() lambda —
    # excluded from subexpression elimination — and was referenced twice
    # (links + size); the CollapseProject guard keeps it evaluated once.
    step = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        title.alias("title"),
        links.alias("links"),
    )
    return step.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("title"),
        F.col("links"),
        F.size("links").alias("n_links"),
    )


def html_extract_paragraphs(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph-preserving extraction → ``(id, text, n_paragraphs)``
    with ``\n``-separated paragraphs (:func:`html_paragraphs_expr`) —
    the shape ``dedup_paragraphs(sep='\n')`` and line-level boilerplate
    removal consume directly. Map-only, like the text lane."""
    # two-step select (round-16): same CollapseProject guard as
    # html_extract_text — the old single Project referenced the chain
    # THREE times (text, the ''-check, the split for n_paragraphs).
    out = html_paragraphs_expr(F.col(html_col))
    step = df.select(F.col(id_col), out.alias("text"))
    n = F.when(F.col("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("text"), r"\n"))
    )
    return step.select(
        F.col(id_col),
        F.col("text"),
        n.cast("int").alias("n_paragraphs"),
    )
