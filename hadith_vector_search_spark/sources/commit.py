"""Crash-safe store-mutation commit protocol, shared by the published
lexical index (`sources.index_store`) and the published vector index
(`sources.vector_store`) — the staged-write + commit-point pattern proven
by `streaming.ingest.stream_merge_jsonl`.

A refresh stages EVERY new file under `<store_dir>/.refresh-staging`
first, then atomically publishes a journal (`_commit.json`) listing the
rename/delete ops, then replays it. A kill BEFORE the journal lands
leaves the live tree untouched (staging is garbage, removed on next
open); a kill DURING the replay leaves the journal, and the next open
rolls FORWARD (every op is idempotent). A reopen therefore sees either
the wholly-old or the wholly-new store, never a mix — asserted by the
kill-mid-refresh tests. On a lake the journal is the table format's
snapshot commit (Delta/Iceberg); this is the single-node stand-in with
the same either/or visibility.
"""

from __future__ import annotations

import json
import os
import shutil

JOURNAL_NAME = "_commit.json"
STAGING_NAME = ".refresh-staging"


def _apply_op(store_dir: str, op: dict) -> None:
    """One journal op; each is idempotent so a partial replay can rerun.
    swap_* consume their staging source (a missing source == already
    applied); remove_dir is naturally idempotent."""
    dst = os.path.join(store_dir, op["dst"])
    if op["op"] == "remove_dir":
        shutil.rmtree(dst, ignore_errors=True)
        return
    src = os.path.join(store_dir, op["src"])
    if op["op"] == "swap_dir":
        if os.path.isdir(src):
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(src, dst)
    elif op["op"] == "swap_file":
        if os.path.exists(src):
            os.replace(src, dst)


def _apply_ops(store_dir: str, ops: list[dict]) -> None:
    for op in ops:
        _apply_op(store_dir, op)


def _write_journal(store_dir: str, ops: list[dict]) -> None:
    """THE commit point: the atomic appearance of _commit.json flips the
    refresh from roll-back (ignore staging) to roll-forward (replay)."""
    tmp = os.path.join(store_dir, f".{JOURNAL_NAME}.tmp")
    with open(tmp, "w") as fh:
        json.dump({"ops": ops}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(store_dir, JOURNAL_NAME))


def recover(store_dir: str) -> str | None:
    """Settle any interrupted refresh before reading or writing the store.
    Journal present -> roll FORWARD (replay the idempotent ops, then drop
    the journal); no journal -> any staging dir is a pre-commit orphan,
    roll BACK by deleting it. Returns 'forward'/'back'/None for tests."""
    action = None
    journal = os.path.join(store_dir, JOURNAL_NAME)
    if os.path.exists(journal):
        with open(journal) as fh:
            _apply_ops(store_dir, json.load(fh)["ops"])
        os.remove(journal)
        action = "forward"
    staging = os.path.join(store_dir, STAGING_NAME)
    if os.path.isdir(staging):
        shutil.rmtree(staging, ignore_errors=True)
        action = action or "back"
    return action


def commit(store_dir: str, ops: list[dict]) -> None:
    """Journal-then-replay; callers stage everything first. Crash
    anywhere inside is settled by the next `recover`."""
    _write_journal(store_dir, ops)
    _apply_ops(store_dir, ops)
    os.remove(os.path.join(store_dir, JOURNAL_NAME))
    shutil.rmtree(os.path.join(store_dir, STAGING_NAME), ignore_errors=True)
