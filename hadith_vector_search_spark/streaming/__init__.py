from .ingest import (  # noqa: F401
    stream_merge_jsonl,
    streaming_dedup_docs,
    streaming_embed_merge,
    streaming_event_rollup,
    streaming_merge_jsonl,
    streaming_neardup_ingest,
    streaming_percolate,
    streaming_postings_refresh,
    streaming_user_sessions,
    streaming_user_totals_stateful,
    streaming_vector_refresh,
    streaming_vector_refresh_oracle,
)
