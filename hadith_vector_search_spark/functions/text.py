"""Scalar text functions (SURVEY §2.7) as pure Column expressions.

Everything here compiles to JVM-side Catalyst expressions (regexp_replace /
split / higher-order functions) — no Python UDFs — so these run inside
whole-stage codegen and scale linearly with input partitions.

The token character class is standardized across indexing, scoring, and the
DuckDB oracles (SURVEY §4.2.4): lowercase latin letters, digits, underscore,
plus the Arabic block U+0600–U+06FF. The reference used two slightly
different tokenizers (FTS5 `unicode61` at
/root/reference/mcp_server/apps/fts.py:288 vs the router regex `[\\w؀-ۿ]+`
at /root/reference/mcp_server/apps/router.py:41-44); we deliberately unify
them so tf/df statistics and coverage scoring agree.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word characters: ASCII word chars + Arabic block. Java regex \w is
# ASCII-only (unlike Python's default), so spell the class out explicitly —
# it then means the same thing in Java (Spark), RE2 (DuckDB), and Python
# (driver-side query tokenization with re.ASCII semantics).
TOKEN_CLASS = "a-z0-9_؀-ۿ"
TOKEN_SPLIT_RE = f"[^{TOKEN_CLASS}]+"
_PY_TOKEN_RE = re.compile(f"[{TOKEN_CLASS}]+")

MIN_TOKEN_LEN = 2  # reference drops len<=1 tokens (router.py:41-44)


def tokenize(col: Column | str, min_len: int = MIN_TOKEN_LEN) -> Column:
    """F2: lowercase, split on non-word runs, drop short tokens.
    Returns array<string>. split() can emit leading/trailing '' — the
    length filter removes them."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: F.length(t) >= min_len)


def py_tokenize(text: str, min_len: int = MIN_TOKEN_LEN) -> list[str]:
    """Driver-side twin of `tokenize` for query strings — identical rules,
    used when compiling a query into literal term lists (SURVEY F7)."""
    return [t for t in _PY_TOKEN_RE.findall(text.lower()) if len(t) >= min_len]


def normalize_whitespace(col: Column | str) -> Column:
    """F23: collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_narrator(col: Column | str) -> Column:
    """F1: canonical narrator — strip honorific parentheticals (EN + AR),
    leading reporting verbs, trailing punctuation, bidi marks, collapse
    whitespace, lowercase.
    Reference behavior: /root/reference/mcp_server/apps/normalization.py:8-26.
    """
    c = F.col(col) if isinstance(col, str) else col
    # parenthetical honorifics e.g. "(May Allah be pleased with him)"
    c = F.regexp_replace(c, r"\([^)]*\)", " ")
    # Arabic honorific phrase without parens
    c = F.regexp_replace(c, "رضي الله عن(ه|ها|هم|هما)", " ")
    # bidi / zero-width marks
    c = F.regexp_replace(c, "[‎‏‪-‮⁦-⁩]", "")
    # leading/trailing reporting verbs
    c = F.regexp_replace(c, r"(?i)\b(reported|narrated|said)\s*:?\s*$", " ")
    # trailing punctuation
    c = F.regexp_replace(c, r"[\s:،,.;'\"-]+$", "")
    return F.lower(normalize_whitespace(c))


def strip_html(col: Column | str) -> Column:
    """F8: remove tags, unescape the common entities, collapse whitespace.
    Reference: /root/reference/quran_mcp/loader.py:13-21. The reference uses
    html.unescape (full entity table); we unescape the entities that occur in
    practice with JVM-side replaces — documented deviation, keeps the hot
    path out of Python."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in [("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return normalize_whitespace(c)


def extract_quoted_phrase(col: Column | str, min_len: int = 3) -> Column:
    """F3: first double- or single-quoted phrase of length >= min_len,
    else NULL. Reference: router.py:31-38."""
    c = F.col(col) if isinstance(col, str) else col
    dq = F.regexp_extract(c, f'"([^"]{{{min_len},}})"', 1)
    sq = F.regexp_extract(c, f"'([^']{{{min_len},}})'", 1)
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(F.lit(None))


def strip_quotes(col: Column | str) -> Column:
    """F4: remove one pair of enclosing quotes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^[\"'](.*)[\"']$", "$1")


def extract_narrator_query(col: Column | str) -> Column:
    """F5: narrator intent — EN 'narrated/reported/said by X' or AR 'عن X'.
    Returns the narrator phrase or NULL. Reference: router.py:19-20,62-69."""
    c = F.col(col) if isinstance(col, str) else col
    en = F.regexp_extract(F.lower(c), r"\b(?:narrated by|reported by|said by)\s+(.+)$", 1)
    ar = F.regexp_extract(c, "عن\\s+(.+)$", 1)
    return F.when(en != "", en).when(ar != "", ar).otherwise(F.lit(None))


def is_exact_reference(col: Column | str) -> Column:
    """F6: reference-shaped query — bare refs ('book 1:12', 'bk 3', '680')
    plus the golden-corpus forms ('Riyad as-Salihin 680', 'Book 1, Hadith
    10', 'find hadith 1511', 'reference: Introduction 8' —
    TEST_QUERIES.md §1). The query must consist ONLY of reference
    vocabulary (polite fillers, collection names, book/hadith words) and
    the number(s): the shipped router's bare digit SEARCH
    (router.py:21,71-72) would misroute thematic queries with incidental
    numbers ('the person who killed 99 people', TEST_QUERIES.md 9.2), so
    this follows the spec's named-pattern rule
    (HADITH_SEARCH_SPEC.md:262-264) generalized to the §1 vocabulary."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(F.lower(c), EXACT_REF_PATTERN, 0) != ""


# Shared between the Column form, the driver-side twin
# (operators/router.py) and the DuckDB oracle (plans/routing.py builds the
# RE2 spelling from the same pieces). Java \s is ASCII-only, like the
# twins' explicit classes.
_REF_VOCAB = ("find|show|me|get|reference|hadith|number|no|riyadussalihin"
              "|riyad|as-salihin|as|salihin|bukhari|muslim|tirmidhi"
              "|introduction|book|kitab|bk")
EXACT_REF_PATTERN = (
    r"^\s*(?:(?:" + _REF_VOCAB + r")[\s,.:]*)*"
    r"\d+(?:\s*[:\-/,]\s*(?:hadith\s+)?\d+)?[\s.]*$")


def arabic_ratio(col: Column | str) -> Column:
    """F26: fraction of characters in the Arabic block."""
    c = F.col(col) if isinstance(col, str) else col
    arabic = F.length(F.regexp_replace(c, "[^؀-ۿ]", ""))
    return F.when(F.length(c) > 0, arabic / F.length(c)).otherwise(F.lit(0.0))


def checksum(*cols: Column | str) -> Column:
    """F9: sha256 over unit-separator-joined fields.
    Reference: /root/reference/sunnah_scraper/models.py:72-81."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws("␟", *cs), 256)


def contains_phrase(text: Column | str, phrase: Column | str) -> Column:
    """F10: case-folded containment."""
    t = F.col(text) if isinstance(text, str) else text
    p = F.lit(phrase) if isinstance(phrase, str) else phrase
    return F.instr(F.lower(t), F.lower(p)) > 0


def grading_boost(col: Column | str) -> Column:
    """Authenticity-grading quality boost: Sahih 0.15 > Hasan 0.10 > else
    0.0, matched case-folded anywhere in the grading string (gradings are
    lists like "Sahih, Mutawatir"). Spec'd by the reference
    (HADITH_SEARCH_SPEC.md:352-356, TEST_QUERIES.md §7.2 expected
    behavior) but never shipped in its scorer (scoring.py has no grading
    input) — implemented here so graded corpora rank Sahih above Hasan at
    equal relevance."""
    c = F.col(col) if isinstance(col, str) else col
    g = F.lower(F.coalesce(c, F.lit("")))
    return (F.when(g.contains("sahih"), F.lit(0.15))
            .when(g.contains("hasan"), F.lit(0.10))
            .otherwise(F.lit(0.0)))


def term_coverage(tokens_col: Column, text_lower: Column) -> Column:
    """F11: fraction of query tokens present in the (lowercased) text.
    Higher-order filter keeps it JVM-side. Reference: scoring.py:57-70."""
    matched = F.size(F.filter(tokens_col, lambda t: F.instr(text_lower, t) > 0))
    n = F.size(tokens_col)
    return F.when(n > 0, matched.cast("double") / n).otherwise(F.lit(0.0))


def bm25_signal(bm25: Column) -> Column:
    """F13: map raw BM25 rank (lower=better in FTS5) to (0,1]."""
    return 1.0 / (1.0 + F.greatest(F.lit(0.0), bm25))


def dist_to_sim(dist: Column) -> Column:
    """F14: distance -> similarity in (0,1]."""
    return 1.0 / (1.0 + F.greatest(F.lit(0.0), dist))


def clamp01(c: Column) -> Column:
    """F15."""
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), c))


def scrub_non_finite(c: Column) -> Column:
    """F16: NaN/Inf/null -> 0.0 (the reference's np.nan_to_num on score
    vectors, /root/reference/quran_mcp/search.py:159-160)."""
    return (F.when(F.isnan(c) | c.isNull(), F.lit(0.0))
            .when(c == float("inf"), F.lit(0.0))
            .when(c == float("-inf"), F.lit(0.0))
            .otherwise(c))


def render_for_embedding(narrator: Column | str, text_en: Column | str,
                         text_ar: Column | str) -> Column:
    """F19: the document string fed to the embedder —
    'Narrator: X\\n<en>\\n\\n<ar>' (reference:
    /root/reference/mcp_server/apps/embeddings.py:44-49)."""
    n = F.col(narrator) if isinstance(narrator, str) else narrator
    en = F.col(text_en) if isinstance(text_en, str) else text_en
    ar = F.col(text_ar) if isinstance(text_ar, str) else text_ar
    return F.concat_ws("\n\n", F.concat_ws("\n", F.concat(F.lit("Narrator: "), n), en), ar)


def make_doc_id(*parts: Column | str) -> Column:
    """F20: colon-joined synthetic doc id (`slug:book:site_id`,
    reference: /root/reference/mcp_server/apps/fts.py:29-30)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in parts]
    return F.concat_ws(":", *cs)


def verse_key(surah: Column | str, ayah: Column | str) -> Column:
    """F21 forward: 'surah:ayah' key synthesis."""
    return make_doc_id(surah, ayah)


def parse_verse_key(key: Column | str) -> Column:
    """F21 reverse: struct(surah int, ayah int) from 'surah:ayah'."""
    k = F.col(key) if isinstance(key, str) else key
    parts = F.split(k, ":")
    return F.struct(parts[0].cast("int").alias("surah"),
                    parts[1].cast("int").alias("ayah"))


def strip_trailing_arabic_digits(col: Column | str) -> Column:
    """F22: drop trailing Arabic-Indic/ASCII digit runs and whitespace
    (reference: /root/reference/quran_scraper/scrape_ibn_kathir.py:82-85)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[\\s\\u0660-\\u0669\\u06F0-\\u06F9\\d]+$", "")


def snippet_positional(text: Column | str, terms: list[str],
                       n_tokens: int = 12, mark_open: str = "[",
                       mark_close: str = "]",
                       ellipsis: str = "…") -> Column:
    """F25, positional: FTS5-faithful snippet WINDOW SELECTION as pure
    column expressions (ref quran_mcp/search.py:121 uses FTS5 snippet()).
    Among all windows of up to `n_tokens` consecutive tokens, pick the one
    maximizing (distinct matched terms, then total matches, then earliest
    position) — FTS5's documented preference — render the window with
    matched tokens wrapped in markers, and add ellipses on truncated
    edges. Returns struct(snippet string, n_matched int, start int).

    Rendering slices the ORIGINAL text (round-7 upgrade closing the last
    F25 deviation): per-token character offsets are recovered by a
    progressive `locate` fold over the token stream — each token's next
    occurrence at/after the previous token's end IS its true position,
    because delimiters contain no token characters and dropped
    sub-minimum tokens are single chars that cannot contain a >=2-char
    search string — and the chosen window renders as raw substrings
    (original case, punctuation, whitespace) with markers around matched
    tokens and the inter-token gaps preserved verbatim. Offsets are
    found in lower(text) and sliced from the original; the one residual
    deviation is locale case-folds that change string LENGTH (e.g.
    'İ' -> 'i̇'), which shift offsets — impossible in the ASCII+Arabic
    corpus (Arabic has no case) and vanishingly rare elsewhere.

    Cost shape: O(L·N) higher-order-function ops per row (L = doc tokens);
    entirely JVM-side, no shuffle — a map over the scan."""
    t = F.col(text) if isinstance(text, str) else text
    ltext = F.lower(t)
    terms_arr = F.array(*[F.lit(x) for x in sorted(set(terms))])

    def matched(w: Column) -> Column:
        return F.filter(w, lambda x: F.array_contains(terms_arr, x))

    def let(body, **bindings):
        # Column expressions are TREES, not DAGs: every reference to a
        # subexpression DUPLICATES it, and Spark's interpreted
        # higher-order-function path re-EVALUATES each duplicate per row.
        # The first cut of this function referenced the O(L) span fold
        # ~70 times through the rendering lambdas and ran ~0.4 s/row.
        # Standard let-encoding — transform over a one-element struct
        # array — binds each expensive intermediate exactly once; body
        # references become variable reads (the same trick zip_with
        # plays below for the per-window match arrays).
        names = list(bindings)
        bound = F.array(F.struct(*[bindings[n].alias(n) for n in names]))
        return F.element_at(
            F.transform(bound, lambda v: body(
                **{n: v.getField(n) for n in names})), 1)

    def with_toks(toks):
        n_toks = F.size(toks)
        starts = F.sequence(F.lit(0),
                            F.greatest(n_toks - n_tokens, F.lit(0)))
        # Materialize each window's matched-token array ONCE (zip_with
        # binds it like a let-expression); computing it separately for
        # the distinct and total counts doubled the dominant filter pass.
        marr = F.transform(
            starts, lambda i: matched(F.slice(toks, i + 1, n_tokens)))
        scored = F.zip_with(
            starts, marr,
            lambda i, m: F.struct(
                F.size(F.array_distinct(m)).alias("d"),
                F.size(m).alias("m"),
                (-i).alias("ni")))
        best = F.array_max(scored)  # struct compare: d, then m, then -start

        # Character spans: fold the token stream, carrying the search
        # cursor; span = (s: 1-based char start, e: 1-based inclusive end).
        spans_acc = F.aggregate(
            toks,
            F.struct(F.lit(0).cast("int").alias("p"),
                     F.expr("array()").cast(
                         "array<struct<s:int,e:int>>").alias("sp")),
            lambda acc, tok: F.struct(
                (F.call_function("locate", tok, ltext, acc.getField("p") + 1)
                 + F.length(tok) - 1).cast("int").alias("p"),
                F.concat(acc.getField("sp"), F.array(F.struct(
                    F.call_function("locate", tok, ltext,
                                    acc.getField("p") + 1).cast("int")
                    .alias("s"),
                    (F.call_function("locate", tok, ltext,
                                     acc.getField("p") + 1)
                     + F.length(tok) - 1).cast("int").alias("e"))))
                .alias("sp")))
        return let(with_best, toks=toks, n_toks=n_toks, best=best,
                   spans=spans_acc.getField("sp"))

    def with_best(toks, n_toks, best, spans):
        bi = -best.getField("ni")
        return let(render, bi=bi, n_toks=n_toks,
                   n_matched=best.getField("m"),
                   bw=F.slice(toks, bi + 1, n_tokens),
                   win_spans=F.slice(spans, bi + 1, n_tokens))

    def render(bi, n_toks, n_matched, bw, win_spans):
        n_win = F.size(win_spans)
        # Render token k from its raw span (bracketed when matched), then
        # the raw gap up to token k+1 (nothing after the last window
        # token). sequence(0, -1) would count DOWN for a token-free doc —
        # filter to the real index range so the empty window renders as
        # empty.
        idxs = F.filter(
            F.sequence(F.lit(0), F.greatest(n_win - 1, F.lit(0))),
            lambda k: k < n_win)

        def piece(k):
            sp = F.element_at(win_spans, k + 1)
            raw = t.substr(sp.getField("s"),
                           sp.getField("e") - sp.getField("s") + 1)
            return F.concat(
                F.when(F.array_contains(terms_arr, F.element_at(bw, k + 1)),
                       F.concat(F.lit(mark_open), raw, F.lit(mark_close)))
                .otherwise(raw),
                F.when(k < n_win - 1,
                       t.substr(sp.getField("e") + 1,
                                F.element_at(win_spans, k + 2).getField("s")
                                - sp.getField("e") - 1))
                .otherwise(F.lit("")))

        rendered = F.array_join(F.transform(idxs, piece), "")
        snip = F.concat(
            F.when(bi > 0, F.lit(ellipsis)).otherwise(F.lit("")),
            rendered,
            F.when(bi + n_tokens < n_toks,
                   F.lit(ellipsis)).otherwise(F.lit("")))
        return F.struct(snip.alias("snippet"),
                        n_matched.alias("n_matched"),
                        bi.alias("start"))

    return let(with_toks, toks=tokenize(t))


def snippet(text: Column | str, first_term: Column | str, width: int = 120) -> Column:
    """F25 (approximation): a window of `width` chars centred on the first
    occurrence of the matched term; falls back to the head of the text.
    The reference uses FTS5's positional snippet() — this is the documented
    relational approximation (SURVEY §4.2.5) kept JVM-side."""
    t = F.col(text) if isinstance(text, str) else text
    term = F.lit(first_term) if isinstance(first_term, str) else first_term
    pos = F.instr(F.lower(t), F.lower(term))
    start = F.greatest(F.lit(1), pos - F.lit(width // 2))
    return F.when(pos > 0, F.substring(t, start, width)).otherwise(F.substring(t, 1, width))
