"""Dedup family + text-analysis operators: oracle-compared at sf0.001 plus
unit tests on literal DataFrames (known near-dups, language ID, hamming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.operators import dedup, textstats
from hadith_vector_search_spark.registry import get_oracles, get_queries
from hadith_vector_search_spark.testing import compare_query

ORACLE_CHECKED = [
    "dedup_exact_preview",
    "dedup_window_preview",
    "minhash_signatures",
    "near_dup_minhash",
    "near_dup_simhash",
    "simhash_fingerprints",
    "near_dup_ngram_jaccard",
    "near_dup_incremental",
    "domain_kl_divergence",
    "lang_id_counts",
    "quality_scores",
    "nb_quality_classifier",
    "token_count_stats",
    "doc_fingerprints",
    "binary_metadata",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, sf_dir, name):
    queries, oracles = get_queries(), get_oracles()
    assert name in queries and name in oracles
    problems = compare_query(spark, duck, queries[name], oracles[name], sf_dir)
    assert not problems, problems


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_near_dup_finds_known_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(spark, [
        ("a", base),
        ("b", base + " okay"),          # near-dup of a
        ("c", "completely different content about spark query planning at scale"),
    ])
    pairs = dedup.near_dup_minhash(docs, n_hashes=8, band_size=2, threshold=0.5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert ("a", "b") in got
    assert all("c" not in p for p in got)


def test_ngram_jaccard_prefix_filter_finds_known_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = _docs(spark, [
        ("a", base),
        ("b", base + " okay"),          # near-dup of a
        ("c", "completely different content about spark query planning at scale"),
    ])
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert ("a", "b") in got
    # 13 tokens -> 11 shingles in a, 12 in b, 11 common -> J = 11/12
    assert abs(got[("a", "b")] - 11 / 12) < 1e-4
    assert all("c" not in p for p in got)


def test_ngram_jaccard_is_lossless_vs_bruteforce(spark):
    # prefix filtering must find EVERY pair >= t that a full all-pairs scan
    # finds (MinHash banding can miss; this operator can't).
    rows = [(f"d{i}", f"common words shared by many docs variant {i % 3} tail {i}")
            for i in range(12)]
    docs = _docs(spark, rows)
    got = {(r.id_a, r.id_b) for r in
           dedup.ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    sharr = dedup.shingle_array(docs)
    a = sharr.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sharr.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size("sh_a") + F.size("sh_b") - inter
    brute = (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("j", inter.cast("double") / union)
             .filter(F.col("j") >= 0.4))
    want = {(r.id_a, r.id_b) for r in brute.collect()}
    assert got == want and want  # non-empty and identical


def test_exact_and_window_dedup(spark):
    docs = spark.createDataFrame(
        [("d1", "same text", 9), ("d2", "same text", 12), ("d3", "unique", 6)],
        "doc_id string, text string, n_chars int")
    groups = dedup.exact_dedup_groups(docs, F.col("text")).collect()
    assert len(groups) == 1 and groups[0].rep_id == "d1" and groups[0].dup_count == 2

    kept = dedup.window_dedup(
        docs, F.col("text"), [F.desc("n_chars"), F.asc("doc_id")]).collect()
    # keeps the longest (d2), reports 1 filtered; singleton group d3 omitted
    assert [(r.doc_id, r.duplicates_filtered) for r in kept] == [("d2", 1)]


def test_simhash_near_dups_agree_on_most_bits(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [("a", base), ("b", base + " lambda"),
                         ("c", "totally unrelated words about databases and joins")])
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs, n_bits=16).collect()}
    df = spark.createDataFrame([(out["a"], out["b"]), (out["a"], out["c"])], "x string, y string")
    d_ab, d_ac = [r[0] for r in df.select(dedup.hamming(F.col("x"), F.col("y"), 16)).collect()]
    assert d_ab < d_ac


def test_predict_lang(spark):
    docs = _docs(spark, [
        ("en", "the cat sat of the mat and the dog is in the house"),
        ("es", "el perro es de la casa que los gatos para una familia"),
        ("und", "zzz qqq xxx"),
    ])
    out = {r.doc_id: r.p for r in
           docs.select("doc_id", textstats.predict_lang(F.col("text")).alias("p")).collect()}
    assert out == {"en": "en", "es": "es", "und": "und"}


def test_quality_monotone_on_garbage(spark):
    docs = _docs(spark, [
        ("good", "this is a reasonably long and clean sentence about the weather "
                 "that has plenty of common function words in it for the scorer"),
        ("bad", "!!! ??? ### 12345 67890 @@@@"),
    ])
    q = {r.doc_id: r.quality for r in textstats.quality_metrics(docs).collect()}
    assert q["good"] > q["bad"]


def test_with_predicted_lang_matches_column_form(spark):
    docs = _docs(spark, [
        ("e", "the cat and the dog are in that house with a bird"),
        ("a", "عن أبي هريرة رضي الله عنه قال في ذلك من"),
        ("u", "zzz qqq xxx"),
    ])
    col_form = {r.doc_id: r.p for r in
                docs.select("doc_id", textstats.predict_lang(F.col("text")).alias("p")).collect()}
    df_form = {r.doc_id: r.predicted for r in
               textstats.with_predicted_lang(docs).select("doc_id", "predicted").collect()}
    assert col_form == df_form
    assert df_form["u"] == "und"

def test_ngram_jaccard_keeps_exact_threshold_pair(spark):
    """PPJoin prefilter regression: a pair with Jaccard EXACTLY == threshold
    must survive — FP noise in the ceil bounds (0.8*5 -> 4.0000000000000002)
    used to over-tighten the positional filter and drop it."""
    from hadith_vector_search_spark.operators.dedup import ngram_jaccard_pairs

    a = "aa bb cc dd ee ff gg hh ii jj kk"          # 9 shingles (w=3)
    b = "aa bb cc dd ee ff gg hh ii jj zz"          # shares 8, union 10
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    assert abs(pairs[0].jaccard - 0.8) < 1e-9


def test_near_dup_simhash_lossless_banding(spark, sf_dir):
    """Pigeonhole guarantee: every pair within max_hamming appears —
    verified against brute-force hamming over all fingerprint pairs."""
    from itertools import combinations

    from hadith_vector_search_spark.plans.dedup import (
        SIMHASH_BLOCKS,
        SIMHASH_COMBO,
        SIMHASH_MAX_HAMMING,
        SIMHASH_NEARDUP_BITS,
        near_dup_simhash,
    )
    from hadith_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = {r.doc_id: r.simhash
            for r in dedup.simhash(docs, n_bits=SIMHASH_NEARDUP_BITS).collect()}
    dists = (((a, b), sum(x != y for x, y in zip(sigs[a], sigs[b])))
             for a, b in combinations(sorted(sigs), 2))
    brute = {pair: d for pair, d in dists if d <= SIMHASH_MAX_HAMMING}
    got = {(r.id_a, r.id_b): r.hamming_dist
           for r in near_dup_simhash(spark, sf_dir).collect()}
    assert got == brute  # lossless: exact same pair set and distances
    assert SIMHASH_MAX_HAMMING <= SIMHASH_BLOCKS - SIMHASH_COMBO


def test_ngram_jaccard_randomized_lossless_with_duplicates(spark):
    """Randomized end-to-end check of collapse + PPJoin losslessness: a
    seeded corpus with exact duplicates injected must yield EXACTLY the
    brute-force Jaccard pair set (prefix filtering and the exact-set
    collapse are both lossless, so any discrepancy is a bug)."""
    import random

    from hadith_vector_search_spark.functions.text import py_tokenize
    from hadith_vector_search_spark.operators.dedup import (
        SHINGLE_W,
        ngram_jaccard_pairs,
    )

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(30)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(5, 20)))
             for _ in range(60)]
    # duplicate ~20% of docs exactly, and add a few near-dups (one token
    # appended) to exercise the non-trivial threshold region
    texts += [texts[i] for i in range(0, 60, 5)]
    texts += [texts[i] + " tok0" for i in range(0, 60, 15)]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    t = 0.8

    def shingle_set(text):
        toks = py_tokenize(text)
        return {" ".join(toks[i:i + SHINGLE_W])
                for i in range(len(toks) - SHINGLE_W + 1)}

    sets = {i: shingle_set(x) for i, x in enumerate(texts)}
    brute = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                jac = inter / (len(sets[i]) + len(sets[j]) - inter)
                if round(jac, 6) >= t:
                    brute[(i, j)] = round(jac, 6)

    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, threshold=t).collect()}
    assert got == brute


def test_max_bucket_cap_bounds_work_with_explicit_recall_loss(spark):
    """The emergency valve: with max_bucket set, combination buckets of
    DISTINCT fingerprints above the cap stop generating candidates —
    bounded work, recall loss. Uncapped stays lossless on the same data."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    # Many distinct docs over a tiny vocabulary → correlated fingerprints
    # that flood combination buckets without being exact duplicates.
    rows = [(i, " ".join(rng.choices(vocab, k=30))) for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.near_dup_simhash(docs, n_bits=16, n_blocks=4,
                                      combo_size=2, max_hamming=2)
    capped = dedup.near_dup_simhash(docs, n_bits=16, n_blocks=4,
                                    combo_size=2, max_hamming=2, max_bucket=3)
    full = {(r.id_a, r.id_b) for r in uncapped.collect()}
    part = {(r.id_a, r.id_b) for r in capped.collect()}
    assert part <= full          # capping only ever drops pairs
    assert len(part) < len(full)  # and on this corpus it demonstrably does


def test_boilerplate_collapse_bounds_band_state(spark, sf_dir):
    """Hot-bucket bound: K exact copies of one page contribute ONE row per
    combination table to the banding self-join (not K), while the output
    still contains all C(K, 2) duplicate pairs — i.e. the quadratic blowup
    moved from intermediate join state to true output cardinality."""
    from itertools import combinations as icombs

    from hadith_vector_search_spark.plans.dedup import (
        BOILER_COPIES,
        BOILER_ID_BASE,
        SIMHASH_BLOCKS,
        SIMHASH_COMBO,
        SIMHASH_NEARDUP_BITS,
        near_dup_boilerplate,
    )
    from hadith_vector_search_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    from hadith_vector_search_spark.plans.dedup import BOILER_TEXT
    boiler = (spark.range(BOILER_COPIES)
              .select((F.col("id") + BOILER_ID_BASE).alias("doc_id"),
                      F.lit(BOILER_TEXT).alias("text")))
    corpus = docs.select("doc_id", "text").unionByName(boiler)

    sigs = dedup.simhash_long(corpus, n_bits=SIMHASH_NEARDUP_BITS)
    n_distinct = sigs.select("fp").distinct().count()
    assert n_distinct <= n_docs + 1  # all copies share one fingerprint

    # Banding input is one row per distinct fp per combination table.
    groups = sigs.groupBy("fp").count()
    n_combos = len(list(icombs(range(SIMHASH_BLOCKS), SIMHASH_COMBO)))
    ex = groups.select("fp", F.explode(F.array(
        *dedup._combo_keys(SIMHASH_NEARDUP_BITS, SIMHASH_BLOCKS, SIMHASH_COMBO))).alias("b"))
    assert ex.count() == n_distinct * n_combos

    out = near_dup_boilerplate(spark, sf_dir)
    boiler_pairs = out.filter((F.col("id_a") >= BOILER_ID_BASE)
                              & (F.col("hamming_dist") == 0)).count()
    assert boiler_pairs >= BOILER_COPIES * (BOILER_COPIES - 1) // 2


def test_connected_components_semantics(spark):
    """Chain + triangle + isolated pair → three clusters with min-id reps;
    transitivity across the chain is the point (pairwise detection alone
    would under-merge)."""
    from hadith_vector_search_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain: one cluster rep=1
         (10, 11), (11, 12), (10, 12),  # triangle: rep=10
         (20, 21)],                   # pair: rep=20
        "id_a long, id_b long")
    rows = {r.doc_id: (r.cluster_rep, r.cluster_size)
            for r in connected_components(pairs).collect()}
    assert rows == {1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
                    10: (10, 3), 11: (10, 3), 12: (10, 3),
                    20: (20, 2), 21: (20, 2)}


def test_phrase_positions_adjacency_semantics(spark):
    """Adjacent-in-order only: substring-across-punctuation and
    all-terms-present-but-not-adjacent must NOT match; counts and first
    token positions are exact (duplicates kept)."""
    from hadith_vector_search_spark.operators.dedup import phrase_positions

    docs = spark.createDataFrame(
        [(1, "xx big order scan yy big order scan"),   # 2 hits, first at 1
         (2, "big scan order"),                        # terms present, wrong order
         (3, "big order, scan"),                       # punctuation splits tokens -> still adjacent post-tokenize
         (4, "big orderscan"),                         # substring-ish, not tokens
         (5, "the big order"),                         # incomplete phrase
         ],
        "doc_id long, text string")
    rows = {r.doc_id: (r.n_occurrences, r.first_pos)
            for r in phrase_positions(docs, ["big", "order", "scan"]).collect()}
    # doc 3: tokenizer drops punctuation, so 'big order scan' IS adjacent
    # in token space — exactly FTS5's behavior (and why raw-substring
    # matching under-counts).
    assert rows == {1: (2, 1), 3: (1, 0)}


def test_duplicated_spans_semantics(spark):
    """Cross-doc duplicated windows merge into maximal spans; within-doc
    repetition alone does not qualify (min_docs=2 counts DISTINCT docs)."""
    from hadith_vector_search_spark.operators.dedup import duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    docs = spark.createDataFrame(
        [(1, f"unique one two three {shared} tail1 tail2"),
         (2, f"{shared} completely different ending here"),
         # doc 3 repeats ITS OWN 10-token run twice but shares with no one:
         (3, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10 " * 2),
         (4, "no overlap at all in this document whatsoever"),
         ],
        "doc_id long, text string")
    rows = {(r.doc_id): (r.span_start, r.span_len, r.n_windows)
            for r in duplicated_spans(docs, w=10).collect()}
    # doc 1: shared run starts at token 5 (1-based), exactly one window
    # doc 2: shared run starts at token 1
    assert rows == {1: (5, 10, 1), 2: (1, 10, 1)}

    # Lower w: two overlapping 5-token windows merge into one 6-token span.
    shared6 = "pp qq rr ss tt uu"
    docs2 = spark.createDataFrame(
        [(1, f"xx {shared6} yy"), (2, f"{shared6} zz")],
        "doc_id long, text string")
    rows2 = {r.doc_id: (r.span_start, r.span_len, r.n_windows)
             for r in duplicated_spans(docs2, w=5).collect()}
    assert rows2 == {1: (2, 6, 2), 2: (1, 6, 2)}


def test_duplicated_spans_hot_window_bounded(spark):
    """Adversarial boilerplate: one 12-token passage shared by 200 docs.
    The hot window key is ONE aggregate group (never a pair join), and the
    output is exactly one correct span per doc — the same bounded-state
    guarantee the banding dedup family proves with its 150-copy fixture."""
    from hadith_vector_search_spark.operators.dedup import duplicated_spans

    boiler = ("terms of service apply to all content provided "
              "herein without warranty")  # 11 tokens after len>=2 filter
    rows = [(i, f"doc{i} unique{i} preamble {boiler} trailer{i}")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_spans(docs, w=10).collect()
    assert len(out) == 200
    by_doc = {r.doc_id: r for r in out}
    for i in range(200):
        r = by_doc[i]
        # tokens: doc{i}, unique{i}, preamble, then 11 boilerplate tokens
        # (the literal token 'preamble' is itself shared by every doc, so
        # the duplicated region is tokens 3..14): windows starting at
        # 1-based positions 3, 4, 5 merge into one 12-token span.
        assert (r.span_start, r.span_len, r.n_windows) == (3, 12, 3), r


def test_refresh_window_index_equals_rebuild(spark):
    """Incremental window-index refresh (drop changed/removed, rebuild
    changed narrow) must equal a from-scratch rebuild of the new corpus."""
    from hadith_vector_search_spark.operators.dedup import (
        refresh_window_index, window_index)

    v1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa one"),
         (2, "some other document body with plenty of distinct token text"),
         (3, "third doc that will be deleted in the second corpus version"),
         (4, "fourth doc left completely untouched across both versions ok")],
        "doc_id long, text string")
    # v2: doc 1 edited, doc 3 removed, doc 5 added, docs 2/4 untouched.
    v2 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa two"),
         (2, "some other document body with plenty of distinct token text"),
         (4, "fourth doc left completely untouched across both versions ok"),
         (5, "a brand new fifth document arriving in the second snapshot")],
        "doc_id long, text string")
    changed = v2.filter(F.col("doc_id").isin(1, 5))
    removed = spark.createDataFrame([(3,)], "doc_id long")

    idx_v1 = window_index(v1, w=10)
    refreshed = refresh_window_index(idx_v1, changed, removed, w=10)
    rebuilt = window_index(v2, w=10)
    key = lambda r: (r.doc_id, r.pos, r._h1, r._h2)  # noqa: E731
    assert sorted(map(key, refreshed.collect())) == \
        sorted(map(key, rebuilt.collect()))


def test_chunk_documents_semantics(spark):
    """Chunk coverage invariants: every token lands in some chunk, chunks
    overlap by exactly `overlap` in the interior, no chunk is fully
    contained in its predecessor, empty docs emit nothing."""
    from hadith_vector_search_spark.operators.textstats import chunk_documents

    n = 100
    words = " ".join(f"tok{i:03d}" for i in range(1, n + 1))
    docs = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "")], "doc_id long, text string")
    out = sorted(((r.doc_id, r.chunk_id, r.start_token, r.n_tokens,
                   r.chunk_text.split(" ")) for r in
                  chunk_documents(docs, chunk_tokens=16, overlap=4).collect()))
    d1 = [c for c in out if c[0] == 1]
    # starts: 1, 13, 25, ... step 12, last start <= 96 -> 1..85
    assert [c[2] for c in d1] == list(range(1, n - 4 + 1, 12))
    # full coverage and correct content
    seen = set()
    for _, cid, start, ntok, toks in d1:
        assert toks == [f"tok{i:03d}" for i in range(start, start + ntok)]
        seen.update(range(start, start + ntok))
    assert seen == set(range(1, n + 1))
    # last chunk reaches the final token, is not redundant
    assert d1[-1][2] + d1[-1][3] - 1 == n and d1[-1][3] > 4
    d2 = [c for c in out if c[0] == 2]
    assert len(d2) == 1 and d2[0][4] == ["short", "doc"]
    assert not [c for c in out if c[0] == 3]


def test_winnowing_guarantee_and_density(spark):
    """Winnowing property (Schleimer et al. 2003): two docs sharing a run
    of >= w + guarantee - 1 tokens must share at least one selected
    fingerprint VALUE; selection keeps well under half the windows."""
    from hadith_vector_search_spark.operators.dedup import winnowed_fingerprints

    shared = " ".join(f"sh{i:02d}" for i in range(13))  # w=10,g=4 -> 13 tokens
    fillers_a = " ".join(f"aa{i:02d}" for i in range(30))
    fillers_b = " ".join(f"bb{i:02d}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, f"{fillers_a} {shared} {fillers_a}"),
         (2, f"{fillers_b} {shared} {fillers_b}")],
        "doc_id long, text string")
    # recompute per-doc selected fingerprint SETS via the operator's
    # internals: use digest equality on a doc pair that shares everything
    out = {r.doc_id: r for r in winnowed_fingerprints(docs).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert 0 < r.n_fingerprints < r.n_windows / 2 + 2

    # direct guarantee check: selected VALUES (hash part of the encoding)
    # must intersect across the two docs
    from hadith_vector_search_spark.operators import dedup as D
    from pyspark.sql import functions as FF
    import hashlib

    def selected_values(text):
        toks = [t for t in __import__("re").findall(r"[a-z0-9_]+", text.lower())
                if len(t) >= 2]
        wins = [" ".join(toks[i:i + 10]) for i in range(len(toks) - 9)]
        encs = [hashlib.sha256(w.encode()).hexdigest() + "#" + str(i).zfill(8)
                for i, w in enumerate(wins)]
        sel = {min(encs[i:i + 4]) for i in range(len(encs) - 3)}
        return {e.split("#")[0] for e in sel}

    va = selected_values(f"{fillers_a} {shared} {fillers_a}")
    vb = selected_values(f"{fillers_b} {shared} {fillers_b}")
    assert va & vb, "winnowing guarantee violated in the reference model"


def test_bigram_lm_perplexity_ranks_garbled_text_higher(spark):
    """The filtering property that matters: text made of corpus-typical
    bigrams scores LOWER perplexity than shuffled/garbled text under the
    same corpus-trained model."""
    from hadith_vector_search_spark.operators.textstats import bigram_lm_scores

    fluent = "the cat sat on the mat and the dog sat on the rug"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(8)]
        + [(100, "the cat sat on the mat again today")      # in-domain
           , (101, "mat the on cat rug sat dog the and")],  # shuffled
        "doc_id long, text string")
    out = {r.doc_id: r.perplexity for r in bigram_lm_scores(docs).collect()}
    assert out[100] < out[101], out
    # single-token / empty docs emit no row
    docs2 = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "two tokens")], "doc_id long, text string")
    rows = bigram_lm_scores(docs2).collect()
    assert {r.doc_id for r in rows} == {3}


def test_incremental_neardup_is_cross_set_only(spark, sf_dir):
    """Every emitted pair crosses the batch boundary (new x old), and KL
    divergence is finite and non-negative for every source."""
    from hadith_vector_search_spark.plans import dedup as dp
    from hadith_vector_search_spark.plans import textstats as ts

    pairs = dp.near_dup_incremental(spark, sf_dir).collect()
    for r in pairs:
        assert r.new_id % dp.INCR_MOD == dp.INCR_REM
        assert r.old_id % dp.INCR_MOD != dp.INCR_REM
        assert r.jaccard >= dp.JACCARD_THRESHOLD

    kl = ts.domain_kl_divergence(spark, sf_dir).collect()
    assert len(kl) > 0
    import math
    for r in kl:
        assert math.isfinite(r.kl_nats)
        # KL >= 0 up to the 1e-6 rounding of the emitted value
        assert r.kl_nats >= -1e-6
        assert r.n_tokens > 0


def test_incremental_band_join_valve_bounds_flooded_bucket(spark):
    """A 50-copy boilerplate flood on the EXISTING side: uncapped, every
    flood copy is a candidate for the matching new doc; with the valve,
    the flooded bucket stops yielding candidates while distinct docs
    still match."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [("new", base)] + [(f"old{i}", base) for i in range(50)] + [
        ("old_x", "completely different content about spark planning today ok")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    sharr = dedup._collapsed_shingles(docs, "text", "doc_id")
    sigs_new = dedup.minhash_signatures(sharr.filter(F.col("doc_id") == "new"))
    sigs_old = dedup.minhash_signatures(sharr.filter(F.col("doc_id") != "new"))
    open_cands = dedup.lsh_band_join(sigs_new, sigs_old).collect()
    assert len(open_cands) == 50            # every flood copy is a candidate
    capped = dedup.lsh_band_join(sigs_new, sigs_old, max_bucket=10).collect()
    assert len(capped) == 0                 # the flooded buckets are valved


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short quote embedded verbatim in a long doc: containment ~1.0,
    Jaccard far below 0.8 — the asymmetric join must find it and the
    Jaccard join must (correctly) not."""
    quote = "actions are judged by intentions and every person gets reward"
    filler = ("the long host document discusses many unrelated matters "
              "of jurisprudence travel commerce fasting prayer charity "
              "in extended detail before quoting that ")
    docs = _docs(spark, [
        ("q", quote),
        ("host", filler + quote + " and then continues with more analysis"),
        ("other", "completely different content about spark planning"),
    ])
    got = {(r.contained_id, r.container_id): r.containment
           for r in dedup.containment_pairs(docs, threshold=0.9,
                                            min_size=5).collect()}
    assert ("q", "host") in got
    assert got[("q", "host")] >= 0.9
    assert ("host", "q") not in got            # asymmetric: host not in quote
    jac = {(r.id_a, r.id_b) for r in
           dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    assert ("host", "q") not in jac and ("q", "host") not in jac


def test_containment_prefix_filter_is_lossless_randomized(spark):
    """The containment-form prefix filter must find EVERY ordered pair
    with containment >= t that a brute-force all-pairs scan finds, across
    seeded corpora with heavy shingle sharing."""
    import random

    # (seed, threshold) combos: t=0.9 exercises the count-based filter's
    # extended k = min(2p-1, |A|) probe at its tightest (p is tiny), t=0.8
    # exercises exact-threshold pairs under the epsilon guard.
    for seed, t in ((13, 0.8), (31, 0.8), (13, 0.9), (47, 0.9)):
        rng = random.Random(seed)
        pool = [f"wd{i:02d}" for i in range(14)]
        rows = []
        for d in range(25):
            n = rng.randint(7, 16)
            rows.append((f"d{d}", " ".join(rng.choice(pool) for _ in range(n))))
        docs = _docs(spark, rows)
        ms = 5
        got = {(r.contained_id, r.container_id) for r in
               dedup.containment_pairs(docs, threshold=t,
                                       min_size=ms).collect()}
        sharr = dedup.shingle_array(docs).filter(F.size("shingles") >= ms)
        a = sharr.select(F.col("doc_id").alias("id_a"),
                         F.col("shingles").alias("sh_a"))
        b = sharr.select(F.col("doc_id").alias("id_b"),
                         F.col("shingles").alias("sh_b"))
        cont = (F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
                .cast("double") / F.size("sh_a"))
        brute = (a.join(b, F.col("id_a") != F.col("id_b"))
                 .withColumn("c", F.round(cont, 6))
                 .filter(F.col("c") >= t))
        want = {(r.id_a, r.id_b) for r in brute.collect()}
        assert got == want, f"seed {seed}: {got ^ want}"


def test_winnow_matching_guarantee(spark):
    """Two docs sharing a verbatim run of >= w + g - 1 tokens MUST share a
    winnowed fingerprint (the Schleimer match-length guarantee applied
    through the join); unrelated docs share none."""
    from hadith_vector_search_spark.operators.dedup import (
        DUPSPAN_W,
        WINNOW_GUARANTEE,
        winnow_match_pairs,
    )

    run = " ".join(f"shared{i:02d}" for i in range(DUPSPAN_W
                                                   + WINNOW_GUARANTEE + 2))
    docs = _docs(spark, [
        ("a", "left context words here " + run + " right tail words"),
        ("b", "совершенно other start tokens then " + run + " and more"),
        ("c", "nothing in common with either document at all here okay"),
    ])
    pairs = {(r.id_a, r.id_b): r.shared_fps
             for r in winnow_match_pairs(docs, min_shared=1).collect()}
    assert ("a", "b") in pairs and pairs[("a", "b")] >= 1
    assert all("c" not in k for k in pairs)


def test_winnow_hot_fp_cap_bounds_match_join(spark):
    """MOSS's over-common-fingerprint rule as the hot-key valve: a
    boilerplate page repeated K times drives each of its fingerprints to
    df=K, and the fp self-join would emit C(K, 2) candidate rows per fp
    BEFORE the min_shared filter. With `max_df` those fps are dropped
    from the join input entirely (bounded state, recall loss confined to
    boilerplate), while a genuine two-doc overlap — whose fps have df=2 —
    survives the cap untouched."""
    from pyspark.sql import Window

    k_copies, cap = 150, 10
    boiler = " ".join(f"tok{i:02d}" for i in range(30))
    rows = [(i, boiler) for i in range(k_copies)]
    shared = " ".join(f"ov{i:02d}" for i in range(20))
    rows += [(1000, shared + " xa xb xc xd xe xf xg xh xi xj"),
             (1001, shared + " ya yb yc yd ye yf yg yh yi yj")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.winnow_match_pairs(docs, min_shared=1)
    capped = dedup.winnow_match_pairs(docs, min_shared=1, max_df=cap)
    full = {(r.id_a, r.id_b) for r in uncapped.collect()}
    part = {(r.id_a, r.id_b) for r in capped.collect()}
    assert len(full) >= k_copies * (k_copies - 1) // 2  # quadratic output
    assert part <= full                  # capping only ever drops pairs
    assert (1000, 1001) in part          # real overlap survives the cap
    assert all(a >= 1000 for a, _ in part)  # all boilerplate pairs gone

    # Join-input bound: after the df filter no fingerprint key feeds more
    # than `cap` rows into the self-join — the intermediate state the
    # verdict flagged is provably bounded, not just the output.
    sel = dedup._winnow_selected(
        docs, dedup.DUPSPAN_W, dedup.WINNOW_GUARANTEE, "text", "doc_id")
    fps = (sel.select("doc_id", F.substring("_sel", 1, 64).alias("fp"))
           .distinct()
           .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("fp")))
           .filter(F.col("df") <= cap))
    max_key = fps.groupBy("fp").count().agg(F.max("count")).first()[0]
    assert max_key is not None and max_key <= cap


def test_nb_classifier_recovers_weak_labels_and_generalizes(spark):
    """The filtering property: docs written from the high-quality slice's
    vocabulary score ABOVE docs written from the junk slice's vocabulary,
    and training-set agreement with the weak labels beats chance by a wide
    margin — the weak-label bootstrap actually transfers to tokens."""
    good = ("the model trains on clean prose and the tokens flow in "
            "sentences that read well for the corpus and the reader")
    junk = "$$$ 4417 9981 !!! 22 ### 777 %% 13 @@ 55 ^^ 91 && 23"
    docs = spark.createDataFrame(
        [(i, good + f" variant {i}") for i in range(10)]
        + [(100 + i, junk + f" {i}") for i in range(10)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in textstats.nb_quality_scores(docs).collect()}
    # weak labels split the two slices (sanity of the bootstrap)
    assert all(out[i].weak_pos for i in range(10))
    assert not any(out[100 + i].weak_pos for i in range(10))
    # the trained scores separate them too, on BOTH output signals
    worst_good = min(out[i].nb_score for i in range(10))
    best_junk = max(out[100 + i].nb_score for i in range(10))
    assert worst_good > best_junk, (worst_good, best_junk)
    agree = sum(1 for r in out.values() if r.predicted_pos == r.weak_pos)
    assert agree >= 18, agree  # >= 90% training-set agreement


def test_nb_classifier_single_class_corpus_stays_finite(spark):
    """Regression (round-10 advice): an all-positive (or all-negative)
    weak labelling under the fixed threshold must not hit log(0) /
    division-by-zero in the class prior — the add-one-smoothed prior
    log((d_pos+1)/(d_all-d_pos+1)) keeps nb_logodds/predicted_pos
    finite and non-null for every row (the oracle replays the same
    smoothed expression, so an unsmoothed prior would gate-pass on
    mixed corpora and null out on degenerate ones)."""
    import math

    good = ("the model trains on clean prose and the tokens flow in "
            "sentences that read well for the corpus and the reader")
    junk = "$$$ 4417 9981 !!! 22 ### 777 %% 13 @@ 55 ^^ 91 && 23"
    for texts, want_pos in (([good + f" v{i}" for i in range(6)], True),
                            ([junk + f" {i}" for i in range(6)], False)):
        docs = spark.createDataFrame(list(enumerate(texts)),
                                     "doc_id long, text string")
        rows = textstats.nb_quality_scores(docs).collect()
        assert len(rows) == 6
        for r in rows:
            assert r.weak_pos is want_pos
            assert r.nb_logodds is not None and math.isfinite(r.nb_logodds)
            assert r.predicted_pos is not None
