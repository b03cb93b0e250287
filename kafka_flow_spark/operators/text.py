"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are pyspark.sql.functions built-ins (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator is a Column-producing
helper so it composes into any DataFrame plan and pushes down/prunes normally.

These have no counterpart in the reference (kafka-flow processes opaque bytes);
they are the Phase-4 pipeline surface (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic small stopword inventories (per-language marker words for the
# heuristic language ID; English set doubles as the quality-score stopwords).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (empty text → empty array)."""
    col = F.col(text) if isinstance(text, str) else text
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE pre-tokenizer regex."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), F.lit(0)))


def punct_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    toks = tokens(text)
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stops, F.lower(t))))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    n = token_count(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_count(text, lang).cast("double") / n.cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword presence
    − punctuation excess.  (Gopher-rules-flavored, arithmetic chosen to be
    exactly reproducible in ANSI SQL.)"""
    col = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_penalty = F.least(
        punct_count(col).cast("double") / F.greatest(F.length(col).cast("double"), F.lit(1.0)) * 2.0,
        F.lit(1.0),
    )
    return F.round(len_score * 0.5 + stop_score * 0.5 - punct_penalty * 0.25, 4)


def lang_score(text: Column | str, lang: str) -> Column:
    """Stopword-hit count for one language (marker-word heuristic)."""
    return stopword_count(text, lang)


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK-character presence → 'zh', else the language
    with the most marker-stopword hits (fixed priority en>es>fr>de on ties,
    'und' when no marker hits at all)."""
    col = F.col(text) if isinstance(text, str) else text
    cjk = F.length(col) - F.length(F.regexp_replace(col, r"[一-鿿]", ""))
    scores = {lg: lang_score(col, lg) for lg in ("en", "es", "fr", "de")}
    best = F.greatest(*scores.values())
    return (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["es"] == best, F.lit("es"))
        .when(scores["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    col = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def ngram_level(prev: Column, toks: Column, k: int) -> Column:
    """Level-k space-joined word-gram array from the level-(k-1) array:
    zip with the k-shifted token array and concat one token.

    This is the INCREMENTAL gram construction both ``word_shingles`` (n>1)
    and ``repetition_stats`` build on — one zip_with per level, measured 20×
    cheaper at sf10 than per-position ``concat_ws(slice(...))`` (HOF lambdas
    evaluate interpreted per element; see PERF.md round 5).  The zip pads
    the short side with null and ``concat`` propagates it, so one final
    slice trims the tail."""
    tail_len = F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
    shifted = F.slice(toks, k, tail_len)
    return F.slice(
        F.zip_with(prev, shifted, lambda a, b: F.concat(a, F.lit(" "), b)),
        1,
        tail_len,
    )


# HTML entity → character pairs shared verbatim with the SQL oracle (chained
# plain replaces, applied AFTER tag stripping; &amp; LAST so freshly decoded
# ampersands cannot re-trigger earlier entities)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_to_text(html: Column | str) -> Column:
    """Boilerplate-free text from raw HTML — the crawl→text extraction step
    every web-corpus pipeline runs before any quality/dedup operator here
    (trafilatura/jusText are the C/Python tools; this is the Spark-native
    regex core, entirely whole-stage-codegen `regexp_replace` — no UDF, no
    parser library, scan-speed).

    Stages (each pattern stays inside the syntax BOTH java.util.regex and
    RE2/DuckDB support — the PII_PATTERNS discipline — so the whole chain is
    oracle-mirrorable):
    1. strip comments / <script>…</script> / <style>…</style> blocks
       ((?is): dot-all + case-fold — script bodies span lines),
    2. every remaining tag → one space (text in adjacent elements must not
       concatenate into a fake token),
    3. decode the six universal entities (module constant, &amp; last),
    4. collapse whitespace runs and trim.

    NULL html → NULL.  Lossy by design: attributes, alt-text and structure
    drop; documents needing layout-aware extraction go through the real
    parser offline — this is the 100 TB bulk path.
    """
    col = F.col(html) if isinstance(html, str) else html
    out = F.regexp_replace(col, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?is)<script\b[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style\b[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


# --- URL canonicalization (crawl-curation primitives) -----------------------
#
# A crawl pipeline's first dedup key is the CANONICAL url: scheme/host case,
# www. prefixes, default ports, tracking params, fragments, and trailing
# slashes all vary freely across re-crawls of the same page.  Every step here
# is a codegen regexp on one short string column — scan speed, no UDF, and
# the same pattern strings evaluate identically under java.util.regex and
# RE2 (no backreferences, no lookaround), so a DuckDB oracle can mirror the
# chain literally.

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def url_scheme(url: Column | str) -> Column:
    """Lower-cased scheme ('' when the value has no scheme://)."""
    col = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(col, _SCHEME_RE, 1))


def url_host(url: Column | str) -> Column:
    """Lower-cased host with any ``www.`` prefix and DEFAULT port stripped
    (``:80`` for http, ``:443`` for https; explicit non-default ports are
    kept — they address a different origin)."""
    col = F.col(url) if isinstance(url, str) else url
    hostport = F.lower(
        F.regexp_extract(F.regexp_replace(col, _SCHEME_RE, ""), r"^([^/?#]*)", 1)
    )
    bare = F.regexp_replace(hostport, r"^www\.", "")
    scheme = url_scheme(col)
    return (
        F.when(scheme == "http", F.regexp_replace(bare, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(bare, r":443$", ""))
        .otherwise(bare)
    )


def url_domain(url: Column | str) -> Column:
    """Registrable-domain heuristic: the last two dot-labels of the host
    (`sub.a.example.com` -> `example.com`), with any explicit ``:port``
    stripped first — a port addresses a different origin (url_host keeps
    it) but the same REGISTRABLE domain, so per-domain aggregations must
    not fragment `example.com` from `example.com:8080`.  Public-suffix-list
    awareness (co.uk etc.) is a lookup-table join the caller adds when
    needed."""
    h = F.regexp_replace(url_host(url), r":[0-9]+$", "")
    return F.when(
        h.rlike(r"[^.]+\.[^.]+$"), F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    ).otherwise(h)


def canonicalize_url(url: Column | str) -> Column:
    """Full canonical form: lower scheme + canonical host + path with
    tracking params (``utm_*``), fragments, empty queries, and trailing
    slashes removed.

    The path/query cleanup is three global regexp passes (mid-query
    ``&utm_x=..`` params, a leading ``?utm_x=..&`` param, a lone
    ``?utm_x=..`` tail) + slash/empty-`?` tidying — order matters and is
    pinned by tests; the same literal patterns run in the oracle.
    """
    col = F.col(url) if isinstance(url, str) else url
    pathq = F.regexp_replace(
        F.regexp_replace(col, _SCHEME_RE, ""), r"^[^/?#]*", ""
    )
    # 1. drop the fragment  2. drop '&utm_*' params  3. promote '?utm_*&'
    # 4. drop a lone '?utm_*' tail  5. collapse '/?' -> '?'  6. drop
    # trailing slashes  7. drop a now-empty '?'
    p = F.regexp_replace(pathq, r"(?s)#.*", "")
    p = F.regexp_replace(p, r"&utm_[^&#]*", "")
    p = F.regexp_replace(p, r"\?utm_[^&#]*&", "?")
    p = F.regexp_replace(p, r"\?utm_[^&#]*$", "")
    p = F.regexp_replace(p, r"/+\?", "?")
    p = F.regexp_replace(p, r"/+$", "")
    p = F.regexp_replace(p, r"\?$", "")
    scheme = url_scheme(col)
    # schemeless inputs (relative crawl refs) canonicalize without
    # inventing a '://' prefix; the host/path cleanup still applies.
    return F.when(scheme == "", F.concat(url_host(col), p)).otherwise(
        F.concat(scheme, F.lit("://"), url_host(col), p)
    )
