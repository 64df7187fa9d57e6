"""[EXT] Corpus cleaning & composition operators for LLM-data pipelines.

The reference has no text-pipeline surface (SURVEY.md §2.4 tail); these are
the standard pre-training stages between raw crawl and tokenizer:

- ``redact_pii``        — regex PII redaction (emails / IPv4 / phone-shaped
                          numbers), with per-class match counts.
- ``normalize_text``    — canonical text form: lowercase, collapse
                          whitespace runs, trim (the first step before
                          exact-hash dedup so trivially-different bytes
                          dedupe together).
- ``mix_sources``       — deterministic weighted down-sampling per stratum
                          (lang/source/domain): hash-bucket acceptance, no
                          RNG — a row's membership depends only on its key
                          and the seed, so the mix is reproducible under
                          repartitioning, retries, AND corpus growth.

Scale design: everything here is a pure Column expression over one scan —
no shuffle, no UDF, whole-stage codegen end-to-end. ``mix_sources`` is the
shape used to rebalance a 100 TB crawl (e.g. downweight boilerplate-heavy
domains to hit a target token budget per source): the acceptance test runs
map-side; only surviving rows ever reach downstream exchanges. All hashes
are md5-derived so a DuckDB oracle replays exact membership (same reasoning
as operators/splits.py content-hash splits).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "redact_pii",
    "normalize_text",
    "mix_sources",
    "temperature_mix",
    "remove_boilerplate_lines",
    "SLOPPY_CP1252_HIGH",
    "fix_mojibake_expr",
    "fix_encoding",
    "decode_text_quarantine",
]

#: Pattern set kept deliberately in the regex subset valid in BOTH Java
#: (Spark codegen) and RE2 (DuckDB/ripgrep) dialects: no backrefs, no
#: lookaround — redaction must stay whole-stage-codegen-able, and the
#: oracle must be able to replay it verbatim.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}

#: Replacement order matters where patterns could overlap (an IPv4-shaped
#: substring inside an email's domain must redact as part of the email):
#: email first, then phone, then ipv4.
_PII_ORDER = ("email", "phone", "ipv4")


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: Mapping[str, tuple[str, str]] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Redact PII spans and count matches per class.

    Adds ``n_<class>`` count columns (counted on the ORIGINAL text, before
    any replacement touches it) and ``out_col`` with all classes replaced,
    applied in ``_PII_ORDER``. One projection, no shuffle.
    """
    pats = dict(patterns) if patterns is not None else PII_PATTERNS
    order = [k for k in _PII_ORDER if k in pats] + [
        k for k in pats if k not in _PII_ORDER
    ]
    out = df
    red: Column = F.col(text_col)
    for name in order:
        pat, rep = pats[name]
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        red = F.regexp_replace(red, pat, rep)
    return out.withColumn(out_col, red)


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "norm"
) -> DataFrame:
    """Canonical text form: lowercase → collapse whitespace runs to one
    space → trim. Run before content-hash dedup so case/spacing variants
    of the same document share a digest."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, norm)


def mix_sources(
    df: DataFrame,
    rates: Mapping[str, float],
    strat_col: str,
    id_cols: Sequence[str],
    seed: str = "mix",
    default_rate: float = 0.0,
    precision: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted down-sampling per stratum.

    A row survives iff ``md5(seed | id_cols…)``'s first 32 bits, reduced mod
    ``precision``, fall under ``rates[stratum] * precision`` — i.e. an
    accept fraction per stratum with content-hash (not RNG) randomness:

    - reproducible: same seed + ids → same sample on any cluster layout;
    - stable under growth: adding documents never flips existing rows;
    - nested: the rate-0.25 sample is a SUBSET of the rate-0.5 sample
      (same threshold test, lower cut), so ablation subsets are free.

    Strata missing from ``rates`` get ``default_rate`` (drop by default —
    an unknown source in a curated mix should fail closed). The whole test
    is one codegen'd projection; at 100 TB the rejected rows die map-side
    before any exchange.
    """
    key = F.concat_ws("|", F.lit(seed), *[F.col(c).cast("string") for c in id_cols])
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % precision
    rate = F.coalesce(
        *[
            F.when(F.col(strat_col) == k, F.lit(float(v)))
            for k, v in sorted(rates.items())
        ],
        F.lit(float(default_rate)),
    )
    # round, don't truncate: 0.29 * 1e6 = 289999.9999… in binary floating
    # point — a bare cast('long') would accept one bucket fewer than the
    # stated rate and diverge from an oracle replay that rounds
    return df.where(bucket < F.round(rate * precision).cast("long"))


def temperature_mix(
    df: DataFrame,
    strat_col: str,
    id_cols: Sequence[str],
    alpha: float = 0.5,
    seed: str = "tmix",
    precision: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-pretraining
    standard, cf. XLM-R / mT5 α-sampling): sample stratum *i* with
    probability ∝ pᵢ^α, flattening the source distribution so rare
    sources/languages aren't drowned by the head. Realized as per-stratum
    ACCEPTANCE RATES over :func:`mix_sources`'s content-hash test —
    deterministic, repartition/retry/growth-stable, map-side only.

    The rate normalizes the rarest stratum to 1.0 (keep everything there,
    down-sample the rest): rᵢ = (n_min/nᵢ)^(1−α). α=1 ⇒ natural
    distribution (all rates 1); α=0 ⇒ uniform (every stratum cut to
    n_min); α=0.5 (default) is the common compromise — and computes via
    ``sqrt``, which IEEE 754 rounds correctly in every engine, so an
    oracle's replay is bit-identical (a general ``pow`` is only
    faithfully-rounded and may differ in the last ulp across libms).

    One tiny count aggregate drives the rates (|strata| rows to the
    driver — broadcast-sized); the acceptance pass is one codegen'd
    projection, so at 100 TB rejected rows die before any exchange.
    """
    import math

    counts = {
        r[0]: r[1] for r in df.groupBy(strat_col).count().collect()
    }
    if not counts:
        return df.where(F.lit(False))
    n_min = min(counts.values())
    if alpha == 0.5:
        rates = {k: math.sqrt(n_min / n) for k, n in counts.items()}
    else:
        rates = {k: (n_min / n) ** (1.0 - alpha) for k, n in counts.items()}
    return mix_sources(
        df, rates, strat_col, id_cols, seed=seed, precision=precision
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 10,
    line_sep: str = "\n",
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/web-corpus approach):
    a LINE appearing in more than ``max_df`` documents is boilerplate
    (nav bars, cookie banners, license headers) and is struck from every
    document; rare lines — the actual content — survive in order.

    Plan: posexplode lines → line document-frequencies (one hash
    aggregate) → the HOT set (small by construction: boilerplate is the
    repeated minority) broadcasts into a LEFT ANTI join → surviving lines
    re-assemble per document via an order-preserving sort of (pos, line)
    structs. The only data-grain shuffles are the line aggregate and the
    per-doc regroup; the anti join is map-side. Documents whose every
    line was boilerplate come back as empty text, not dropped — the
    caller decides their fate.

    Returns ``(id_col, cleaned)``.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("__pos", "__line"),
    )
    linedf = lines.groupBy("__line").agg(
        F.count_distinct(F.col(id_col)).alias("__df")
    )
    hot = linedf.where(F.col("__df") > max_df).select("__line")
    kept = lines.join(F.broadcast(hot), "__line", "left_anti")
    assembled = (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
                    ),
                    lambda s: s["__line"],
                ),
                line_sep,
            ).alias("cleaned")
        )
    )
    # left join back: all-boilerplate docs return empty, never vanish
    return df.select(F.col(id_col)).join(assembled, id_col, "left").select(
        F.col(id_col), F.coalesce("cleaned", F.lit("")).alias("cleaned")
    )


# ---------------------------------------------------------------------------
# Encoding repair (round-9 verdict #5): CP1252-in-UTF-8 mojibake fix
# ---------------------------------------------------------------------------
# The standard web-corpus defect: UTF-8 bytes decoded as Windows-1252
# somewhere upstream, so "café" arrives as "cafÃ©" and "it’s" as "itâ€™s".
# The repair inverts that mis-decode for the three dominant sequence
# classes — deterministic byte-table mapping, the ftfy idea restated as
# pure Column expressions so a DuckDB oracle replays it byte-for-byte:
#
# - 2-byte UTF-8 (C2/C3 xx, Latin-1 supplement): 'Â'/'Ã' followed by the
#   CP1252 rendering of a continuation byte -> the original codepoint;
# - 3-byte UTF-8 E2 80 xx (general punctuation — curly quotes, dashes,
#   ellipsis): 'â€' + one table char;
# - the euro special case E2 82 AC -> 'â‚¬'.
#
# The byte<->char table is "sloppy CP1252": the five bytes CP1252 leaves
# undefined (81 8D 8F 90 9D) map to their own C1 codepoints — the
# Windows-API best-fit convention real mojibake exhibits, and what keeps
# the 64-entry table CONTIGUOUS so a char's position IS its byte value.
#
# The repair is intentionally conservative: a marker char ('Ã', 'Â', 'â')
# whose follower is NOT in the table passes through untouched, so
# legitimate text ("São Paulo" has ã, not Ã; "â" followed by a space)
# is never rewritten. Single-pass per class, classes applied longest-
# sequence-first (euro, then 3-byte, then Ã, then Â) — re-decoding output
# of an earlier class is out of scope (double-encoded mojibake needs the
# iterated fix; documented seam).


def _sloppy_cp1252(b: int) -> str:
    try:
        return bytes([b]).decode("cp1252")
    except UnicodeDecodeError:  # 81 8D 8F 90 9D: best-fit to the C1 point
        return chr(b)


#: CP1252 renderings of bytes 0x80..0xBF, position k = byte 0x80+k
SLOPPY_CP1252_HIGH = "".join(_sloppy_cp1252(b) for b in range(0x80, 0xC0))
#: repair targets: 'Ã'+c -> U+00C0+k (2-byte lead C3)
_TO_C3 = "".join(chr(0xC0 + k) for k in range(64))
#: repair targets: 'Â'+c -> U+0080+k (2-byte lead C2)
_TO_C2 = "".join(chr(0x80 + k) for k in range(64))
#: repair targets: 'â€'+c -> U+2000+k (3-byte lead E2, mid 80)
_TO_E280 = "".join(chr(0x2000 + k) for k in range(64))


def _repair_class(col: Column, marker: str, prefix: str, to_table: str) -> Column:
    """One repair class as ONE aggregate() HOF walking the split fragments
    with a first-element flag (the single-reference entity-decode shape
    from operators/html.py): split on ``marker``; the first fragment
    passes through; each later fragment whose text starts with ``prefix``
    + a table char is rewritten through ``translate``; anything else gets
    its marker restored verbatim.

    Expression-shape contract (round-16, guide §4-adjacent): HOFs are
    CodegenFallback and excluded from subexpression elimination, so every
    extra Column reference re-evaluates its WHOLE upstream input per row,
    interpreted. The old ``concat(element_at(parts, 1), aggregate(slice(
    parts, 2, …)))`` shape referenced the split — and therefore the
    upstream repair chain — three times PER CLASS, compounding to 3^k
    re-evaluations across the k chained classes. The split is now
    referenced exactly once; semantics are bit-identical (planted corpus
    in test_cleaning)."""
    plen = len(prefix)
    probe = lambda p: F.substring(p, plen + 1, 1)  # noqa: E731

    def fragment(p: Column) -> Column:
        ok = (F.length(p) >= plen + 1) & (
            F.instr(F.lit(SLOPPY_CP1252_HIGH), probe(p)) > 0
        )
        if plen:
            ok = ok & (F.substring(p, 1, plen) == prefix)
        return F.when(
            ok,
            F.concat(
                F.translate(probe(p), SLOPPY_CP1252_HIGH, to_table),
                F.substring(p, plen + 2, 0x7FFFFFFF),
            ),
        ).otherwise(F.concat(F.lit(marker), p))

    return F.aggregate(
        F.split(col, marker),
        F.struct(F.lit("").cast("string").alias("s"), F.lit(True).alias("f")),
        lambda acc, p: F.struct(
            F.concat(
                acc["s"], F.when(acc["f"], p).otherwise(fragment(p))
            ).alias("s"),
            F.lit(False).alias("f"),
        ),
        lambda acc: acc["s"],
    )


def fix_mojibake_expr(col: Column, passes: int = 1) -> Column:
    """The full CP1252-in-UTF-8 repair as one Column expression (see the
    section comment for the spec). Whole-stage codegen, zero UDFs.

    ``passes`` applies the repair that many times: DOUBLE-encoded
    2-byte mojibake ("ÃƒÂ©" — Latin-1 text that went through the
    mis-decode twice, the second-most-common real-world corruption)
    unpeels one layer per pass; each pass is conservative, so extra
    passes on clean or singly-encoded text are no-ops. Scope note:
    ITERATED 3-byte punctuation ("Ã¢â‚¬â„¢") does NOT unpeel layer-wise —
    the euro shortcut legitimately fires inside the outer layer, so the
    inner sequence is no longer the exact single-encoded form; that tail
    is the documented seam (an offline ftfy-class pass), pinned in
    test_cleaning. The expression nests linearly in ``passes`` — keep it
    small."""
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    s = col
    for _ in range(passes):
        s = F.replace(s, F.lit("â‚¬"), F.lit("€"))  # â‚¬ -> €
        s = _repair_class(s, "â", "€", _TO_E280)  # â€x (E2 80 xx)
        s = _repair_class(s, "Ã", "", _TO_C3)          # Ãx  (C3 xx)
        s = _repair_class(s, "Â", "", _TO_C2)          # Âx  (C2 xx)
    return s


def fix_encoding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passes: int = 1,
) -> DataFrame:
    """Encoding-repair stage → ``(id, text, n_repaired)`` where
    ``n_repaired`` counts repaired characters (each fix shrinks the text
    by the sequence length minus one, so it is the length delta). One
    narrow projection — map-only, fuses into the scan at 100 TB, sits
    between HTML extraction and normalization in the cleaning chain.

    Two-step select (round-16): the repair chain is CodegenFallback HOFs
    excluded from subexpression elimination — projecting it twice (text +
    the length delta) evaluated it twice per row. The chain now lands in
    its own Project (CollapseProject keeps a multiply-referenced non-cheap
    alias), and ``n_repaired`` references the materialized column."""
    fixed = fix_mojibake_expr(F.col(text_col), passes=passes)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("__orig_len"),
        fixed.alias("text"),
    ).select(
        F.col(id_col),
        F.col("text"),
        (F.col("__orig_len") - F.length("text")).cast("long").alias("n_repaired"),
    )


def decode_text_quarantine(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Binary → text ingest gate with the QUARANTINE-row contract of
    multimodal.decode_quarantine: payloads that are not valid UTF-8
    become ``(id, ok=false, text=NULL, error)`` rows instead of failing
    the task or silently decoding with replacement characters.

    Returns ``(id, ok, text, error)``. Both the validity test
    (``is_valid_utf8`` — a JVM intrinsic) and the decode are pure Column
    expressions; the decode sits under the CaseWhen's taken branch only,
    so invalid bytes never reach it. Map-only: at 100 TB the gate runs
    inside the scan projection and rejected rows die map-side."""
    raw = F.col(bin_col)
    ok = F.is_valid_utf8(raw)
    return df.select(
        F.col(id_col),
        ok.alias("ok"),
        F.when(ok, F.decode(raw, "UTF-8")).alias("text"),
        F.when(~ok, F.lit("invalid UTF-8")).alias("error"),
    )
