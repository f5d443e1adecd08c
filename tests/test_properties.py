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
    # reference-vocabulary exact-ref shapes (golden §1 rule) + near-misses
    router_shapes += [
        "Riyad as-Salihin 680", "riyad as salihin 7", "RIYADUSSALIHIN 99",
        "Book 1, Hadith 10", "introduction, hadith 25.", "find hadith 1511",
        "show me riyad as-salihin 993", "hadith number 682",
        "reference: introduction 8", "muslim 5", "bukhari1",
        "introductions 5",            # vocab word + stray suffix: NOT a ref
        "prohibition in book 17",     # non-vocab word: NOT a ref
        "hadith " + "9" * 25,         # number past bigint, still routes ref
        "find hadith",                # vocab but no number: NOT a ref
        "no. 12", "me me me 3", "hadith 1, hadith 2",
        "book ١٢ hadith 3",           # Arabic-Indic digits inside
    ]
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


def test_duplicated_spans_matches_python_model_randomized(spark):
    """Randomized equivalence: span dedup (window hash agg + islands) vs a
    direct pure-Python model over seeded corpora drawn from a small token
    pool (high window-collision pressure). One Spark job per corpus."""
    from hadith_vector_search_spark.operators.dedup import duplicated_spans

    W = 4
    for seed in (3, 11, 27):
        rng = random.Random(seed)
        pool = [f"tk{i:02d}" for i in range(12)]
        docs, toks = [], {}
        for d in range(40):
            n = rng.randint(0, 25)
            ts = [rng.choice(pool) for _ in range(n)]
            toks[d] = ts
            docs.append((d, " ".join(ts)))

        # python model
        from collections import defaultdict
        owners = defaultdict(set)
        wins = {}
        for d, ts in toks.items():
            wins[d] = [tuple(ts[i:i + W]) for i in range(len(ts) - W + 1)]
            for w in wins[d]:
                owners[w].add(d)
        expected = set()
        for d, ws in wins.items():
            dup_pos = [i for i, w in enumerate(ws) if len(owners[w]) >= 2]
            run = []
            for p in dup_pos + [None]:
                if run and (p is None or p != run[-1] + 1):
                    expected.add((d, run[0] + 1,
                                  run[-1] - run[0] + W, len(run)))
                    run = []
                if p is not None:
                    run.append(p)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r.doc_id, r.span_start, r.span_len, r.n_windows)
               for r in duplicated_spans(df, w=W).collect()}
        assert got == expected, f"seed {seed}: {got ^ expected}"


def test_winnowing_digest_matches_python_model_randomized(spark):
    """Randomized equivalence for winnowing: the per-doc fingerprint
    digest must equal a direct python implementation of min-in-window
    selection over the same 'sha256#pos' encodings (ties included — the
    small pool forces repeated identical windows)."""
    import hashlib

    from hadith_vector_search_spark.operators.dedup import (
        DUPSPAN_W, WINNOW_GUARANTEE, winnowed_fingerprints)

    W, G = DUPSPAN_W, WINNOW_GUARANTEE
    rng = random.Random(13)
    pool = [f"wd{i:02d}" for i in range(6)]
    docs, toks = [], {}
    for d in range(25):
        n = rng.randint(0, 40)
        ts = [rng.choice(pool) for _ in range(n)]
        toks[d] = ts
        docs.append((d, " ".join(ts)))

    expected = {}
    for d, ts in toks.items():
        wins = [" ".join(ts[i:i + W]) for i in range(len(ts) - W + 1)]
        encs = [hashlib.sha256(w.encode()).hexdigest() + "#" + str(i).zfill(8)
                for i, w in enumerate(wins)]
        sel = sorted({min(encs[i:i + G]) for i in range(len(encs) - G + 1)})
        if sel:
            digest = hashlib.sha256(",".join(sel).encode()).hexdigest()
            expected[d] = (len(wins), len(sel), digest)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_fingerprints, r.fp_digest)
           for r in winnowed_fingerprints(df).collect()}
    assert got == expected


def test_chunking_matches_python_model_randomized(spark):
    """Randomized equivalence for RAG chunking: starts, sizes, and exact
    token content vs a direct python model, over lengths straddling every
    boundary (0, < overlap, < chunk, exact multiples, long)."""
    from hadith_vector_search_spark.operators.textstats import chunk_documents

    C, O = 16, 4
    stride = C - O
    rng = random.Random(5)
    lengths = [0, 1, 3, 4, 5, 15, 16, 17, 28, 29, 40, 41, 100] + \
        [rng.randint(0, 120) for _ in range(20)]
    docs, toks = [], {}
    for d, n in enumerate(lengths):
        ts = [f"w{d}x{i}" for i in range(n)]
        toks[d] = ts
        docs.append((d, " ".join(ts)))

    expected = set()
    for d, ts in toks.items():
        if not ts:
            continue
        starts = list(range(1, max(len(ts) - O, 1) + 1, stride))
        for cid, s in enumerate(starts):
            ctoks = ts[s - 1:s - 1 + C]
            if ctoks:
                expected.add((d, cid, s, len(ctoks), " ".join(ctoks)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_id, r.chunk_id, r.start_token, r.n_tokens, r.chunk_text)
           for r in chunk_documents(df, chunk_tokens=C, overlap=O).collect()}
    assert got == expected, got ^ expected


def test_next_fit_packing_matches_python_model_randomized(spark):
    """Randomized equivalence: the applyInPandas next-fit fold vs a direct
    pure-Python fold over seeded (source, n_chars) corpora, including
    oversized docs that must occupy a bin alone."""
    from hadith_vector_search_spark.plans import profile

    cap = profile._PACK_CAPACITY
    for seed in (5, 19, 42):
        rng = random.Random(seed)
        rows = []
        did = 0
        for s in range(4):
            for _ in range(rng.randint(1, 30)):
                # mix tiny, mid, and > capacity docs
                c = rng.choice([rng.randint(1, 200),
                                rng.randint(200, cap),
                                rng.randint(cap, 2 * cap)])
                rows.append((did, f"s{s}", c))
                did += 1
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, n_chars long")

        # python model: next-fit in doc_id order per source
        expected = {}
        by_src = {}
        for d, s, c in sorted(rows):
            by_src.setdefault(s, []).append(c)
        for s, cs in by_src.items():
            bin_id, fill = 0, 0
            for c in cs:
                if fill > 0 and fill + c > cap:
                    bin_id += 1
                    fill = 0
                fill += c
                k = (s, bin_id)
                nd, bc = expected.get(k, (0, 0))
                expected[k] = (nd + 1, bc + c)

        orig = profile.load_table
        try:
            profile.load_table = lambda _s, _d, name: docs  # noqa: ARG005
            got = {(r.source, r.bin_id): (r.n_docs, r.bin_chars)
                   for r in profile.greedy_pack_assignments(
                       spark, "ignored").collect()}
        finally:
            profile.load_table = orig
        assert got == expected, f"seed {seed}"


def test_sessionization_matches_python_model_randomized(spark):
    """Randomized equivalence: window-algebra sessionization vs a direct
    Python fold, with gaps engineered to land on both sides of (and
    exactly at) the 30-minute boundary."""
    import datetime as dt

    from hadith_vector_search_spark.plans import profile

    gap_s = profile._SESSION_GAP_S
    for seed in (7, 23):
        rng = random.Random(seed)
        rows = []
        eid = 0
        for u in range(6):
            t = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 60))
            for _ in range(rng.randint(1, 40)):
                rows.append((eid, t, u, "click", 1.0, "{}"))
                eid += 1
                # gaps: tiny, just-below, exact, just-above boundary
                t += dt.timedelta(seconds=rng.choice(
                    [1, 60, gap_s - 1, gap_s, gap_s + 1, 2 * gap_s]))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
                  " event_type string, value double, props string")

        expected = {}
        by_user = {}
        for e, t, u, *_ in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
            by_user.setdefault(u, []).append(t)
        for u, ts in by_user.items():
            sess = 0
            prev = None
            for t in ts:
                if prev is None or (t - prev).total_seconds() >= gap_s:
                    sess += 1
                k = (u, sess)
                n, lo, hi = expected.get(k, (0, t, t))
                expected[k] = (n + 1, min(lo, t), max(hi, t))
                prev = t

        orig = profile.load_table
        try:
            profile.load_table = lambda _s, _d, name: df  # noqa: ARG005
            got = {(r.user_id, r.session_idx):
                   (r.n_events, r.session_start, r.session_end)
                   for r in profile.user_sessions_batch(
                       spark, "ignored").collect()}
        finally:
            profile.load_table = orig
        assert got == expected, f"seed {seed}"


def test_union_fuse_equals_full_outer_join_randomized(spark):
    """fusion.fuse is planned as union + per-key max over NULL-filled
    sides; its contract is exact full-outer-coalesce semantics whenever
    each input has at most one row per key (the structural precondition —
    both legs are top-k lists). Randomized check incl. NEGATIVE cosine
    scores and disjoint/overlapping key sets, against a literal full
    outer join."""
    from hadith_vector_search_spark.operators.fusion import fuse

    rng = random.Random(23)
    fts_keys = rng.sample(range(100), 30)
    vec_keys = rng.sample(range(100), 30)
    fts = spark.createDataFrame(
        [(k, round(rng.uniform(0, 12), 6)) for k in fts_keys],
        "doc_id long, bm25 double")
    vec = spark.createDataFrame(
        [(k, round(rng.uniform(-1, 1), 6)) for k in vec_keys],  # negatives!
        "doc_id long, sim double")

    got = {r.doc_id: (r.fts_score, r.vector_sim)
           for r in fuse(fts, vec, key="doc_id").collect()}
    ref_df = (fts.withColumnRenamed("bm25", "f")
              .join(vec.withColumnRenamed("sim", "v"), "doc_id", "full_outer")
              .select("doc_id", F.coalesce("f", F.lit(0.0)).alias("f"),
                      F.coalesce("v", F.lit(0.0)).alias("v")))
    ref = {r.doc_id: (r.f, r.v) for r in ref_df.collect()}
    assert got == ref


def test_interactive_equivalence_with_string_ids(spark):
    """enable_interactive + the VALUES literal re-entry must survive
    string ids (incl. quote characters needing SQL escaping) and stay
    row-identical to the batch path."""
    from hadith_vector_search_spark.api import HybridEngine

    rows = [
        ("a'1", "patience and prayer bring reward to the patient"),
        ("b\"2", "the window data stream flows through the merge"),
        ("c:3", "charity in secret and patience in anger"),
        ("d-4", "window data window data stream stream repeated phrase"),
        ("e\\5", "patience under a backslash id must round-trip"),
        ("f\\", "an id ENDING in a backslash must not escape the quote"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    batch = HybridEngine(spark, docs)
    inter = HybridEngine(spark, docs)
    assert inter.enable_interactive()
    for q in ["patience", '"window data" stream', "charity secret"]:
        a = [r.asDict() for r in batch.hybrid_search(q, n_results=4).collect()]
        b = [r.asDict() for r in inter.hybrid_search(q, n_results=4).collect()]
        assert a == b, q


def test_snippet_positional_matches_python_model_randomized(spark):
    """FTS5-style window selection vs an independent python model on
    adversarial shapes: repeated terms, docs shorter than the window,
    match-free docs, terms at the edges. One Spark job for all cases."""
    from hadith_vector_search_spark.functions.text import (
        py_tokenize,
        snippet_positional,
    )

    terms = ["alpha", "beta", "gamma"]
    n = 6
    rng = random.Random(77)
    vocab = terms + [f"w{i:02d}" for i in range(12)]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 25))))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = snippet_positional(F.col("text"), terms, n_tokens=n)
    got = {r.doc_id: (r.snippet, r.n_matched, r.start) for r in
           df.select("doc_id", s.alias("s")).select("doc_id", "s.*").collect()}

    tset = set(terms)
    for did, text in rows:
        toks = py_tokenize(text)
        L = len(toks)
        best = None
        for i in range(0, max(L - n, 0) + 1):
            win = toks[i:i + n]
            m = [t for t in win if t in tset]
            key = (len(set(m)), len(m), -i)
            if best is None or key > best[0]:
                best = (key, i, len(m))
        _, bi, bm = best
        win = toks[bi:bi + n]
        body = " ".join(f"[{t}]" if t in tset else t for t in win)
        exp = (("…" if bi > 0 else "") + body
               + ("…" if bi + n < L else ""))
        assert got[did] == (exp, bm, bi), (did, text)
