"""Unit tests for the scalar text-function library (SURVEY §2.7) against
literal DataFrames — behavior mirrored from the reference's documented
semantics, not its code."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadith_vector_search_spark.functions import text as T


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_tokenize_basic(spark):
    df = spark.createDataFrame([("Hello, World! a I data-stream",)], "s string")
    out = df.select(T.tokenize("s").alias("t")).collect()[0].t
    assert out == ["hello", "world", "data", "stream"]  # len<2 dropped


def test_tokenize_arabic(spark):
    df = spark.createDataFrame([("عن أبي هريرة said",)], "s string")
    out = df.select(T.tokenize("s").alias("t")).collect()[0].t
    assert "عن" in out and "said" in out


def test_py_tokenize_matches_spark(spark):
    s = "The Quick-Brown fox_2 جمل test! x"
    df = spark.createDataFrame([(s,)], "s string")
    assert df.select(T.tokenize("s").alias("t")).collect()[0].t == T.py_tokenize(s)


def test_normalize_narrator(spark):
    raw = "Ibn 'Umar (May Allah be pleased with them) reported:"
    df = spark.createDataFrame([(raw,)], "s string")
    out = df.select(T.normalize_narrator("s").alias("n")).collect()[0].n
    assert out == "ibn 'umar"


def test_strip_html(spark):
    df = spark.createDataFrame([("<p>Hello &amp; <b>world</b>&nbsp;!</p>",)], "s string")
    out = df.select(T.strip_html("s").alias("n")).collect()[0].n
    assert out == "Hello & world !"


def test_extract_quoted_phrase(spark):
    df = spark.createDataFrame(
        [('find "speak good or remain silent" now',), ("no phrase here",), ("'ab'",)],
        "s string")
    out = [r.p for r in df.select(T.extract_quoted_phrase("s").alias("p")).collect()]
    assert out == ["speak good or remain silent", None, None]


def test_narrator_query_extraction(spark):
    df = spark.createDataFrame(
        [("narrated by Abu Hurairah",), ("عن أبي هريرة",), ("controlling anger",)],
        "s string")
    out = [r.n for r in df.select(T.extract_narrator_query("s").alias("n")).collect()]
    assert out[0] == "abu hurairah"
    assert out[1] == "أبي هريرة"
    assert out[2] is None


def test_exact_reference(spark):
    df = spark.createDataFrame(
        [("book 1:12",), ("680",), ("bk 3-4",), ("hadith about anger",)], "s string")
    out = [r.e for r in df.select(T.is_exact_reference("s").alias("e")).collect()]
    assert out == [True, True, True, False]


def test_checksum_is_sha256(spark):
    import hashlib

    df = spark.createDataFrame([("a", "b")], "x string, y string")
    out = df.select(T.checksum("x", "y").alias("c")).collect()[0].c
    assert out == hashlib.sha256("a␟b".encode()).hexdigest()


def test_term_coverage(spark):
    df = spark.createDataFrame([("the data stream is big",)], "s string")
    toks = F.array(F.lit("data"), F.lit("stream"), F.lit("missing"), F.lit("big"))
    out = df.select(T.term_coverage(toks, F.lower(F.col("s"))).alias("c")).collect()[0].c
    assert abs(out - 0.75) < 1e-9


def test_arabic_ratio(spark):
    df = spark.createDataFrame([("عن أبي",), ("abc",)], "s string")
    out = [r.a for r in df.select(T.arabic_ratio("s").alias("a")).collect()]
    assert out[0] > 0.7 and out[1] == 0.0


def test_clamp_and_signals(spark):
    df = spark.createDataFrame([(5.0,), (-3.0,)], "x double")
    rows = df.select(
        T.clamp01(F.col("x")).alias("c"),
        T.bm25_signal(F.col("x")).alias("b"),
    ).collect()
    assert rows[0].c == 1.0 and rows[1].c == 0.0
    assert abs(rows[0].b - 1 / 6) < 1e-12 and rows[1].b == 1.0


def test_scrub_non_finite(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (float("-inf"),), (None,), (2.5,)],
        "x double")
    out = [r.s for r in df.select(T.scrub_non_finite(F.col("x")).alias("s")).collect()]
    assert out == [0.0, 0.0, 0.0, 0.0, 2.5]


def test_render_and_ids(spark):
    df = spark.createDataFrame([("Abu Bakr", "text en", "نص", "riyad", 3, 17)],
                               "n string, en string, ar string, slug string, book int, site int")
    row = df.select(
        T.render_for_embedding("n", "en", "ar").alias("r"),
        T.make_doc_id("slug", "book", "site").alias("d"),
        T.verse_key("book", "site").alias("v"),
        T.parse_verse_key(T.verse_key("book", "site")).alias("p"),
    ).collect()[0]
    assert row.r == "Narrator: Abu Bakr\ntext en\n\nنص"
    assert row.d == "riyad:3:17"
    assert row.v == "3:17"
    assert (row.p.surah, row.p.ayah) == (3, 17)


def test_strip_trailing_arabic_digits(spark):
    df = spark.createDataFrame([("tafsir text ١٢٣",), ("keep 12 inner 45",)], "s string")
    out = [r.x for r in df.select(T.strip_trailing_arabic_digits("s").alias("x")).collect()]
    assert out == ["tafsir text", "keep 12 inner"]


def test_snippet_positional_window_selection(spark):
    """FTS5 selection rules: prefer distinct matched terms over repeats,
    then total matches, then the earliest window; markers wrap matches;
    ellipses appear only on truncated edges."""
    filler = " ".join(f"xx{i:02d}" for i in range(20))
    rows = [
        # repeats of 'alpha' early, but 'alpha beta' later wins (2 distinct)
        (1, "alpha alpha alpha " + filler + " alpha beta end"),
        # short doc, no truncation: no ellipses
        (2, "alpha beta gamma"),
        # match at head of long doc: trailing ellipsis only
        (3, "alpha beta " + filler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = T.snippet_positional(F.col("text"), ["alpha", "beta"], n_tokens=4)
    out = {r.doc_id: r for r in
           df.select("doc_id", s.alias("s"))
           .select("doc_id", "s.*").collect()}
    assert out[1].n_matched == 2 and out[1].start > 0
    assert "[alpha] [beta]" in out[1].snippet
    assert out[1].snippet.startswith("…")
    assert out[2].snippet == "[alpha] [beta] gamma"
    assert out[2].start == 0 and out[2].n_matched == 2
    assert out[3].snippet.startswith("[alpha] [beta]")
    assert out[3].snippet.endswith("…") and not out[3].snippet.startswith("…")


def test_snippet_positional_renders_raw_text(spark):
    """Round-7 F25 closure: the rendered window slices the ORIGINAL text
    — case, punctuation, and whitespace between tokens survive verbatim;
    brackets land at the original-text match spans."""
    rows = [
        (1, "The WINDOW, then: data!  More window-data  here; stream ends."),
        (2, "Data... STREAM!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = T.snippet_positional(F.col("text"), ["window", "data", "stream"],
                             n_tokens=6)
    out = {r.doc_id: r for r in
           df.select("doc_id", s.alias("s")).select("doc_id", "s.*").collect()}
    # original punctuation and double spaces preserved; original case
    # inside brackets for matched tokens; unmatched tokens raw-case
    assert out[1].snippet == "…[data]!  More [window]-[data]  here; [stream]…"
    assert out[2].snippet == "[Data]... [STREAM]"
    assert out[2].n_matched == 2 and out[2].start == 0


def test_snippet_positional_repeated_token_offsets(spark):
    """The progressive-locate fold must advance past each consumed token:
    repeated tokens map to successive occurrences, not all to the first."""
    df = spark.createDataFrame(
        [(1, "data, data; DATA")], "doc_id long, text string")
    s = T.snippet_positional(F.col("text"), ["data"], n_tokens=3)
    r = df.select(s.alias("s")).select("s.*").collect()[0]
    assert r.snippet == "[data], [data]; [DATA]"
    assert r.n_matched == 3
