from .ingest import stream_merge_jsonl, streaming_event_rollup  # noqa: F401
