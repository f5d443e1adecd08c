"""Corpus-preparation pipeline: split assignment, contamination,
cleaning funnel — oracle-compared at sf0.001 plus unit tests on the
operator invariants (determinism, containment bounds, funnel monotonicity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadith_vector_search_spark.operators import sampling
from hadith_vector_search_spark.plans import pipeline
from hadith_vector_search_spark.registry import get_oracles, get_queries
from hadith_vector_search_spark.testing import compare_query

ORACLE_CHECKED = [
    "corpus_split_summary",
    "contamination_check",
    "quality_filter_funnel",
    "domain_mix_plan",
    "mix_sample_realization",
    "sequence_packing_estimate",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_matches_oracle(spark, duck, sf_dir, name):
    queries, oracles = get_queries(), get_oracles()
    assert name in queries and name in oracles
    problems = compare_query(spark, duck, queries[name], oracles[name], sf_dir)
    assert not problems, problems


def test_split_deterministic_and_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r.doc_id: r.split for r in sampling.with_split(df).collect()}
    b = {r.doc_id: r.split for r in sampling.with_split(df).collect()}
    assert a == b  # rerun-stable
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 < train / n < 0.9  # ~80% by construction


def test_split_stable_under_row_addition(spark):
    """Adding rows never moves an existing row between splits."""
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {r.doc_id: r.split for r in sampling.with_split(small).collect()}
    b = {r.doc_id: r.split for r in sampling.with_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_sample_is_subset_and_roughly_sized(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    kept = sampling.hash_sample(df, "1a").collect()  # 26/256 ~ 10%
    assert 0.05 < len(kept) / 1000 < 0.18


def test_py_shingles_mirrors_spark_shingler(spark):
    text = "key agg row scan slow fast table"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from hadith_vector_search_spark.operators.dedup import shingles

    spark_sh = sorted(r.shingle for r in shingles(df).collect())
    assert spark_sh == sampling.py_shingles(text)


def test_contamination_bounds_and_negative_control(spark, sf_dir):
    df = pipeline.contamination_check(spark, sf_dir)
    rows = df.collect()
    assert all(0.0 < r.containment <= 1.0 for r in rows)
    assert all(r.bench_id != 4 for r in rows)  # OOV bench matches nothing
    # a verbatim-prefix bench item must register at least one hit somewhere
    # in one of the sf dirs it was drawn from; at minimum overlap >= 1 rows
    assert all(r.overlap >= 1 for r in rows)


def test_contamination_self_match_is_full(spark):
    """A document equal to a benchmark text has containment exactly 1.0."""
    docs = spark.createDataFrame(
        [(7, pipeline.CONTAM_BENCH[0][1]), (8, "unrelated words only here")],
        "doc_id long, text string")
    out = sampling.contamination(docs, pipeline.CONTAM_BENCH, 0.0)
    rows = {(r.bench_id, r.doc_id): r for r in out.collect()}
    assert rows[(1, 7)].containment == 1.0
    assert (1, 8) not in rows


def test_funnel_is_monotone(spark, sf_dir):
    for r in pipeline.quality_filter_funnel(spark, sf_dir).collect():
        assert (r.n_docs >= r.after_length >= r.after_quality
                >= r.after_langid >= r.after_dedup >= 0)


def test_domain_mix_invariants(spark, sf_dir):
    rows = pipeline.domain_mix_plan(spark, sf_dir).collect()
    assert {r.lang for r in rows} >= set(pipeline.MIX_TARGET)
    for r in rows:
        assert 0.0 <= r.sampling_rate <= 1.0
        assert r.planned_tokens <= r.available_tokens + 1e-6
        if r.oversubscribed:  # capped rate -> plan everything available
            assert r.sampling_rate == 1.0
            assert r.planned_tokens == r.available_tokens


def test_sequence_packing_invariants(spark, sf_dir):
    for r in pipeline.sequence_packing_estimate(spark, sf_dir).collect():
        assert r.packed_sequences <= r.naive_sequences
        assert 0.0 <= r.naive_pad_waste < 1.0
        assert r.packed_sequences * pipeline.PACK_SEQ_LEN >= r.total_tokens


def test_cleaning_decisions_reasons(spark, tmp_path):
    """Each gate names the FIRST failure. Fixture shape matters: keepers
    must share BIGRAMS across docs (the corpus-trained LM then scores
    them probable) while sharing no 10-token window (exact copies are
    correctly 'boilerplate'), so each keeper is a distinct seeded
    permutation of a common phrase pool."""
    import random as _random

    from pyspark.sql import functions as FF

    from hadith_vector_search_spark.plans.pipeline import cleaning_decisions

    pool = ["the quiet fields rested", "morning light spread wide",
            "distant hills turned golden", "under clear autumn skies",
            "gentle winds carried scents", "the old bridge stood firm",
            "river water moved slowly", "travelers walked for hours"]
    footer = ("footer notice section lists publisher address street number "
              "city region postal code contact email phone hours monday "
              "tuesday wednesday thursday friday saturday sunday opening "
              "closing holiday schedule privacy policy terms conditions "
              "copyright imprint all rights reserved worldwide edition")

    def shuffled(seed, k=len(pool)):
        ph = pool[:]
        _random.Random(seed).shuffle(ph)
        return " ".join(ph[:k])

    rows = [(1, "tiny doc"),                                   # too_short
            (2, "000 111 222 333 444 555 666 777 888 999"),   # low_quality
            (3, ("repeat the phrase again " * 10).strip())]   # repetitive
    rows += [(10 + i, shuffled(i)) for i in range(8)]         # keepers
    rows += [(20, f"{shuffled(100, 3)} {footer}"),            # boilerplate
             (21, f"{footer} {shuffled(101, 3)}")]
    sf = tmp_path / "sfdir"
    sf.mkdir()
    (spark.createDataFrame(rows, "doc_id long, text string")
     .withColumn("lang", FF.lit("en")).withColumn("source", FF.lit("t"))
     .withColumn("n_chars", FF.length("text"))
     .write.parquet(str(sf / "documents.parquet")))
    out = {r.doc_id: (r.keep, r.reason)
           for r in cleaning_decisions(spark, str(sf)).collect()}
    assert out[1] == (False, "too_short")
    assert out[2] == (False, "low_quality")
    assert out[3] == (False, "repetitive")
    assert out[20] == (False, "boilerplate"), out
    assert out[21] == (False, "boilerplate"), out
    kept = [d for d in range(10, 18) if out[d] == (True, "none")]
    assert len(kept) >= 6, out   # phrase permutations survive every gate


def test_decontamination_spans_semantics(spark, tmp_path):
    """A doc embedding one benchmark sentence yields exactly the maximal
    span covering it (merged across its overlapping w-grams); clean docs
    yield nothing."""
    from pyspark.sql import functions as FF

    from hadith_vector_search_spark.plans.pipeline import (
        CONTAM_BENCH, decontamination_spans)

    bench_text = CONTAM_BENCH[0][1]          # "key agg row scan slow fast"
    n_bench = len(bench_text.split())
    rows = [
        (1, f"prefix words here {bench_text} suffix words there"),
        (2, "totally clean document with no leaked content at all"),
    ]
    sf = tmp_path / "sfdir"
    sf.mkdir()
    (spark.createDataFrame(rows, "doc_id long, text string")
     .withColumn("lang", FF.lit("en")).withColumn("source", FF.lit("t"))
     .withColumn("n_chars", FF.length("text"))
     .write.parquet(str(sf / "documents.parquet")))
    out = [(r.doc_id, r.span_start, r.span_len, r.n_windows)
           for r in decontamination_spans(spark, str(sf)).collect()]
    # 3 prefix tokens -> span starts at token 4, covers the 6 bench tokens
    assert out == [(1, 4, n_bench, n_bench - 2)], out


def test_materialize_clean_corpus_end_to_end(spark, sf_dir, tmp_path):
    """The terminal sink: written corpus == docs minus (cleaning drops
    UNION dedup removals), lang-partitioned on disk, stats consistent."""
    import os

    from hadith_vector_search_spark.plans.dedup import dedup_removal_list
    from hadith_vector_search_spark.plans.pipeline import (
        cleaning_decisions, materialize_clean_corpus)
    from hadith_vector_search_spark.sources import load_table

    out = str(tmp_path / "clean_corpus")
    stats = materialize_clean_corpus(spark, sf_dir, out)
    docs = load_table(spark, sf_dir, "documents")
    dropped = {r.doc_id for r in cleaning_decisions(spark, sf_dir)
               .filter("not keep").select("doc_id").collect()}
    removed = {r.doc_id for r in dedup_removal_list(spark, sf_dir)
               .select("doc_id").collect()}
    expected = {r.doc_id for r in docs.select("doc_id").collect()} \
        - dropped - removed
    written = {r.doc_id for r in
               spark.read.parquet(out).select("doc_id").collect()}
    assert written == expected and written
    assert stats["n_written"] == len(expected)
    assert stats["n_input"] == docs.count()
    # survivors' reasons are auditable: every absent doc is in a table
    absent = {r.doc_id for r in docs.select("doc_id").collect()} - written
    assert absent == dropped | removed
    # lang partitioning on disk
    assert any(d.startswith("lang=") for d in os.listdir(out))


def test_clean_cli_module(sf_dir, tmp_path):
    """`python -m hadith_vector_search_spark.clean` runs end to end in a
    fresh process and prints consistent JSON stats."""
    import json as _json
    import os
    import subprocess
    import sys

    out = str(tmp_path / "clean_out")
    r = subprocess.run(
        [sys.executable, "-m", "hadith_vector_search_spark.clean",
         "--sf-dir", sf_dir, "--out", out, "--json"],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["n_written"] > 0
    assert stats["n_written"] <= stats["n_input"]
    assert os.path.isdir(out)


def test_mix_sample_realization_consistency(spark, sf_dir):
    """Realized sample respects the plan: n_sampled <= n_docs, a rate of
    1.0 keeps everything, a rate of 0 keeps nothing, and realized tokens
    never exceed the language's availability."""
    from hadith_vector_search_spark.plans.pipeline import (
        domain_mix_plan,
        mix_sample_realization,
    )

    plan = {r.lang: r for r in domain_mix_plan(spark, sf_dir).collect()}
    real = {r.lang: r for r in mix_sample_realization(spark, sf_dir).collect()}
    assert set(real) == set(plan)
    for lang, r in real.items():
        assert 0 <= r.n_sampled <= r.n_docs
        assert r.sampling_rate == plan[lang].sampling_rate
        if r.sampling_rate >= 1.0:
            assert r.n_sampled == r.n_docs
            assert r.realized_tokens == plan[lang].available_tokens
        if r.sampling_rate == 0.0:
            assert r.n_sampled == 0 and r.realized_tokens == 0


def test_with_shard_deterministic_and_complete(spark):
    """Training-order shuffle invariants: shard in [0, n); the same id
    lands in the same shard with the same key across calls (rerun-
    stability); a different seed produces a different order; shard totals
    cover the corpus exactly; n_shards must divide 256."""
    import pytest as _pytest

    from hadith_vector_search_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string")
    a = sampling.with_shard(docs, 8).select("doc_id", "shuffle_key", "shard")
    b = sampling.with_shard(docs, 8).select("doc_id", "shuffle_key", "shard")
    ra, rb = a.collect(), b.collect()
    assert sorted(map(tuple, ra)) == sorted(map(tuple, rb))
    assert all(0 <= r.shard < 8 for r in ra)
    assert sum(1 for _ in ra) == 200
    # hex-prefix ranges: shard == prefix // 32 for 8 shards
    for r in ra:
        assert r.shard == int(r.shuffle_key[:2], 16) // 32
    # a new epoch (seed) permutes the order
    c = sampling.with_shard(docs, 8, seed="epoch1").collect()
    keys_a = {r.doc_id: r.shuffle_key for r in ra}
    assert any(keys_a[r.doc_id] != r.shuffle_key for r in c)
    with _pytest.raises(ValueError):
        sampling.shard_bounds(7)
