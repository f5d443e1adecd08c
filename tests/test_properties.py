"""Cross-engine invariants on adversarial inputs.

The whole correctness story rests on three functions agreeing everywhere:
the Spark tokenizer (`functions.text.tokenize`, JVM regex), the Python
tokenizer (`py_tokenize`, used to compile query terms driver-side), and the
DuckDB oracle tokenization (string_split_regex in the oracle CTEs). These
tests hammer the Spark↔Python pair on a seeded adversarial corpus — mixed
scripts, bidi marks, zero-width chars, digits, combining marks — in ONE
Spark job (no per-example jobs)."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from hadith_vector_search_spark.functions.text import py_tokenize, tokenize
from hadith_vector_search_spark.operators import dedup

EDGE_CASES = [
    "",
    " ",
    "\t\n  \r",
    "a",                      # below min token length
    "ab",                     # exactly min length
    "عن أبي هريرة رضي الله عنه",
    "mixed العربية and english معاً",
    "under_scores keep_together",
    "digits 123 mix3d a1b2c3",
    "ZERO​WIDTH‌JOINERS",
    "bidi ‎‏ marks",
    "combining über français",
    "UPPER lower MiXeD",
    "  leading and trailing  ",
    "punct!!!???...,,,;;;:::",
    "«quoted» “curly” 'plain'",
    "tab\tsep\nnewline\rcarriage",
    "ＦＵＬＬｗｉｄｔｈ",          # fullwidth latin (word chars in both regexes?)
    "٠١٢٣٤٥ arabic digits ٦٧٨٩",
    "emoji 😀 between 😀 words",
    "x" * 500,                 # one huge token
    ("word " * 200).strip(),   # many tokens
]


def _random_corpus(n: int = 150, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    pools = [
        string.ascii_letters + string.digits + "   _-.,!?",
        "ابتثجحخدذرزسشصضطظعغفقكلمنهوي   ًٌٍَُِّْ",
        string.ascii_lowercase + "؀ۿ​‎   ",
    ]
    out = []
    for i in range(n):
        pool = pools[i % len(pools)]
        out.append("".join(rng.choice(pool) for _ in range(rng.randint(0, 80))))
    return out


def test_spark_tokenizer_matches_python_everywhere(spark):
    texts = EDGE_CASES + _random_corpus()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, s string")
    got = {r.i: r.toks for r in
           df.select("i", tokenize(F.col("s")).alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == py_tokenize(t), f"diverged on {t!r}"


def test_minhash_identical_sets_identical_signatures(spark):
    # Signature is a pure function of the DISTINCT shingle set: token
    # duplication and word-order-preserving whitespace changes must not
    # change it.
    a = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [("x", a), ("y", "  " + a.replace(" ", "   ") + "  ")],
        "doc_id string, text string")
    sigs = dedup.minhash_signatures(dedup.shingle_array(docs), 8).collect()
    by_id = {r.doc_id: tuple(r[f"h{j}"] for j in range(8)) for r in sigs}
    assert by_id["x"] == by_id["y"]


def test_shingle_sets_invariant_to_duplication(spark):
    # n-gram Jaccard of a doc with itself-repeated is 1.0 only when the
    # repetition introduces no new shingles across the seam; check the
    # exact seam behavior instead of assuming.
    t = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame([("a", t), ("b", t + " " + t)],
                                 "doc_id string, text string")
    rows = {r.doc_id: set(r.shingles) for r in dedup.shingle_array(docs).collect()}
    # b's shingles = a's plus the two seam shingles crossing the repeat
    assert rows["a"] <= rows["b"]
    assert rows["b"] - rows["a"] == {"delta epsilon alpha", "epsilon alpha beta"}


def test_route_one_matches_column_router_everywhere(spark):
    """The serving path's pure-Python router twin must agree with the
    column router on EVERY field over the adversarial corpus — the same
    single-job hammer as the tokenizer equivalence above, extended with
    router-shaped strings (quotes, narrator markers, reference patterns,
    Unicode digits that Java's ASCII \\d must NOT match)."""
    from hadith_vector_search_spark.operators.router import route, route_one

    router_shapes = [
        'narrated by عن mixed "quoted bit" tail',
        "'single quoted whole'",
        '"dq" and \'sq\' both present',
        "book ١٢",            # Arabic-Indic digits: not a Java \\d match
        "bk 07-9",
        "kitab3:4",
        "reported by  ",
        "said by X",
        "عن",
        "عن  واحد اثنان",
        '"ab"',               # under min phrase length
        '"abc"',              # exactly min phrase length
    ]
    router_shapes += ["narrated by someone\r", "said by x\r\n", "12\r",
                      "'quoted'\r", "tab\tsep\nnewline\rcarriage"]
    texts = EDGE_CASES + router_shapes + _random_corpus(seed=7)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, query_text string")
    got = {r.i: r for r in route(df).collect()}
    for i, t in enumerate(texts):
        py = route_one(t)
        sp = got[i]
        assert py.normalized == sp.normalized, (t, py.normalized, sp.normalized)
        assert py.phrase == sp.phrase, (t, py.phrase, sp.phrase)
        assert py.narrator_query == sp.narrator_query, \
            (t, py.narrator_query, sp.narrator_query)
        assert py.tokens == list(sp.tokens), t
        assert abs(py.arabic_ratio - sp.arabic_ratio) < 1e-9, t
        assert py.intent == sp.intent, (t, py.intent, sp.intent)
