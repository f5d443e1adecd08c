"""Whole-registry physical-plan invariants, asserted automatically so a
future operator can't silently regress the execution posture:

- NO row-at-a-time Python UDF (`BatchEvalPython`) anywhere — Python compute
  must be Arrow-batched (pandas UDF / applyInPandas / mapInPandas).
- Arrow-batched Python appears ONLY in the queries whose point is Python
  compute (inference, dense BLAS, sequential folds, stubbed codecs).
- NO Cartesian product in any plan.
"""

from __future__ import annotations

from hadith_vector_search_spark.registry import get_queries

SF = "/root/testdata/sf0.001"

# Queries where Arrow-batched Python is the operator (inference/BLAS/
# sequential fold/codec stub) — everything else must be pure JVM.
ARROW_ALLOWED = {
    "embed_documents_preview", "embed_and_search", "embed_chunks_preview",
    "streaming_embed_merge",
    "similar_pairs", "similar_pairs_lsh", "ann_recall_report",
    "semantic_dedup_list", "ann_topk_ivf_kmeans",
    "multimodal_metadata", "multimodal_frames", "multimodal_frame_features",
    "greedy_pack_assignments",
    "streaming_user_totals_stateful",
    "mmr_rerank",
    "cross_encoder_rerank",   # the pair scorer IS the Python inference
}


def _plan_of(spark, fn):
    df = fn(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_no_row_at_a_time_python_and_no_cartesian(spark):
    offenders_py, offenders_arrow, offenders_cart, errors = [], [], [], []
    for name, fn in sorted(get_queries().items()):
        try:
            plan = _plan_of(spark, fn)
        except Exception as e:  # noqa: BLE001
            errors.append((name, str(e)[:120]))
            continue
        if "BatchEvalPython" in plan:
            offenders_py.append(name)
        if ("ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan
                or "MapInPandas" in plan or "PythonMapInArrow" in plan):
            if name not in ARROW_ALLOWED:
                offenders_arrow.append(name)
        if "CartesianProduct" in plan:
            offenders_cart.append(name)
    assert not errors, errors
    assert not offenders_py, f"row-at-a-time Python UDFs in: {offenders_py}"
    assert not offenders_arrow, (
        f"unexpected Arrow-Python stages in: {offenders_arrow} — "
        "either JVM-ify the operator or add it to ARROW_ALLOWED with a "
        "reason it must be Python")
    assert not offenders_cart, f"Cartesian products in: {offenders_cart}"


def test_mmr_pair_build_is_broadcast_and_bounded(spark):
    """mmr_rerank's candidate×candidate crossJoin must plan as a
    BroadcastNestedLoopJoin (the explicit broadcast hint pins it — never
    a shuffled Cartesian at any scale), and its inputs are semi-join
    restrictions to the top-MMR_CANDS candidate set, so the pair matrix
    is bounded by the over-fetch constant, not the corpus."""
    from hadith_vector_search_spark.operators.similarity import (
        topk_by_query_id,
    )
    from hadith_vector_search_spark.plans import semantic as sp
    from hadith_vector_search_spark.sources import load_table

    plan = _plan_of(spark, sp.mmr_rerank)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan

    emb = load_table(spark, SF, "embeddings")
    n_cands = topk_by_query_id(emb, sp.QUERY_VEC_ID, sp.MMR_CANDS).count()
    assert n_cands <= sp.MMR_CANDS
