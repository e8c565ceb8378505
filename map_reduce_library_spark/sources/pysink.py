"""Python DataSource SINK (Spark 4 ``pyspark.sql.datasource`` write
path): a JSON-lines writer with a commit manifest.

Counterpart of the custom reader in ``querydefs/extensibility.py`` —
together they cover both directions of the user-defined-connector
surface. Semantic ancestor in the reference: the C8 result-formatting
sink (FileWordCounter.cpp:271-277), which iterates the output vector
and prints formatted lines; here each PARTITION streams its rows to
its own part file (no driver collect, no cross-partition
coordination), and the driver-side ``commit`` writes a `_SUCCESS`
manifest naming every committed part with its row count — the
standard distributed-sink commit protocol (write task-local, commit
globally, abort removes orphans) in miniature.

Scale notes: one file per partition, names salted with uuid4 so
speculative/retried tasks never collide; ``abort`` deletes the files
its failed attempt reported. Rows are serialized with sorted keys
(recursively — nested structs keep their field names) so output bytes
are schema-order-independent. Manifests are written via
temp-file-plus-atomic-rename: a crash mid-commit can never leave a
torn ``_SUCCESS`` for readers to choke on, and a replayed streaming
epoch atomically replaces its own manifest.

Reader contract: consume the ``_SUCCESS`` manifest's part list, NOT a
``*.jsonl`` glob. A task attempt that wrote its part file but died
before returning its commit message leaves an orphan that neither
``commit`` nor ``abort`` ever hears about (Spark can't deliver a
message the task never produced) — the manifest is the single source
of truth for which parts are committed, exactly as with Hadoop-style
``_SUCCESS`` + committed-file protocols.

Save modes: ``append`` merges the new parts into the existing
manifest (prior committed rows stay visible); ``overwrite`` replaces
the manifest AND deletes the previously committed part files it
named. The first version of this sink ignored the mode and always
rewrote the manifest with only the current job's parts — an
append-mode writer silently dropped every previously committed row
from the read contract (code-review r6 finding).

Concurrency contract: ONE writer per output directory at a time.
Append-mode commit is a read-modify-write of the manifest (read prior
part list, merge, atomic-replace); two concurrent append jobs to the
same path race on that merge and the loser's parts vanish from the
read contract (ADVICE r6). This matches the filesystem-committer
norm — Hadoop's FileOutputCommitter makes the same single-writer
assumption per output path; coordinating concurrent writers needs a
table format with a log/catalog (Delta/Iceberg), out of scope for a
manifest-file sink. Streaming epochs are fine: one query writes
epochs serially, and a replayed epoch atomically replaces its own
manifest.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class PartFileCommit(WriterCommitMessage):
    path: str
    rows: int


def _write_part(out_dir: str, iterator) -> PartFileCommit:
    """Task-side part writer shared by the batch and stream sinks (one
    body — a serialization fix cannot silently miss one of them).
    ``asDict(recursive=True)``: Row is a tuple subclass, so the
    non-recursive form serialized nested structs as positional arrays,
    dropping field names."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(path, "w") as f:
        for row in iterator:
            json.dump(
                row.asDict(recursive=True), f, sort_keys=True, default=str
            )
            f.write("\n")
            n += 1
    return PartFileCommit(path=path, rows=n)


def _write_manifest_atomic(path: str, payload: dict) -> None:
    """Temp-file + os.replace: readers see the old manifest or the new
    one, never a torn write."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        self.overwrite = overwrite
        if not self.dir:
            raise ValueError("jsonlines_sink requires .option('path', dir)")

    def write(self, iterator):
        return _write_part(self.dir, iterator)

    def commit(self, messages):
        # A zero-partition DataFrame runs no write tasks, so no task
        # ever makedirs'd the target — commit must create it or the
        # (empty) manifest write crashes with FileNotFoundError.
        os.makedirs(self.dir, exist_ok=True)
        new_parts = {
            os.path.basename(m.path): m.rows for m in messages if m
        }
        manifest_path = os.path.join(self.dir, "_SUCCESS")
        stale: list[str] = []
        parts = new_parts
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                prior = json.load(f).get("parts", {})
            if self.overwrite:
                stale = [p for p in prior if p not in new_parts]
            else:  # append: prior committed rows stay visible
                parts = {**prior, **new_parts}
        _write_manifest_atomic(
            manifest_path,
            {"parts": parts, "total_rows": sum(parts.values())},
        )
        for name in stale:  # only after the new manifest is live
            p = os.path.join(self.dir, name)
            if os.path.exists(p):
                os.remove(p)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLinesSink(DataSource):
    """``df.write.format("jsonlines_sink").option("path", d).save()``"""

    @classmethod
    def name(cls):
        return "jsonlines_sink"

    def writer(self, schema, overwrite):
        return JsonLinesWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        if overwrite:
            # complete/update output modes hand the sink a TRUNCATE
            # flag; this sink is append-only (per-epoch manifests that
            # readers UNION), so honoring the flag silently would make
            # every epoch re-emit the full snapshot and readers
            # double-count each row once per micro-batch. Refuse
            # loudly instead of producing silently-wrong data
            # (code-review r8).
            raise ValueError(
                "jsonlines_sink is append-only: complete/update output "
                "modes would re-emit the full result every epoch and "
                "manifest readers union epochs; use outputMode('append')"
            )
        return JsonLinesStreamWriter(self.options)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming variant of the sink: per-micro-batch commit
    manifests. Each epoch's tasks write salted part files; the driver
    commit stamps `_SUCCESS-<batchId>` naming that epoch's committed
    parts. Re-delivered epochs (failure replay) atomically replace
    their own manifest, so readers that union the manifests' part
    lists get effectively-once output even though task attempts may
    leave orphan part files — the same manifest-is-truth contract as
    the batch sink."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError(
                "jsonlines_sink stream writer requires .option('path', dir)"
            )

    def write(self, iterator):
        return _write_part(self.dir, iterator)

    def commit(self, messages, batchId):
        os.makedirs(self.dir, exist_ok=True)
        manifest = {
            os.path.basename(m.path): m.rows for m in messages if m
        }
        _write_manifest_atomic(
            os.path.join(self.dir, f"_SUCCESS-{batchId}"),
            {
                "batch_id": batchId,
                "parts": manifest,
                "total_rows": sum(manifest.values()),
            },
        )

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def read_stream_manifests(out_dir: str) -> list[dict]:
    """All committed epoch manifests, batchId-ordered. Readers union
    the manifests' part lists — never glob *.jsonl."""
    out = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("_SUCCESS-") and ".tmp-" not in name:
            with open(os.path.join(out_dir, name)) as f:
                out.append(json.load(f))
    return sorted(out, key=lambda m: m["batch_id"])
