"""`auction_dump` — a Spark 4 Python DataSource for raw dump files.

`sources/json_dump.py` parses dumps through Spark's JSON reader; this
module exposes the same wire format as a PLUGGABLE source
(`spark.read.format("auction_dump").load(dir)`), the Spark-4 Python
DataSource API surface a connector author would use for a format
Spark can't read natively (the reference's ingest client is exactly
such a bespoke reader: per-realm gzip JSON documents fetched from an
HTTP API).

Scale shape encoded in the source itself:

- **One InputPartition per dump file.** Gzip is not splittable, and a
  dump is one whole-document JSON — so the correct parallelism unit
  IS the file (thousands of per-realm dumps → thousands of tasks),
  matching the note in json_dump.py. Spark schedules the partitions
  across executors; no driver-side parsing.
- **Explicit schema, never inferred** — malformed documents surface
  as nulls in known columns.
- Files are parsed with the stdlib (json + gzip) inside the executor
  task: no collect, memory bounded by one dump document.

This source exists for format plugability (and is exercised by
tests/test_dump_datasource.py); the production intake path still
rewrites everything to partitioned parquet immediately
(plans/medallion.ingest_bronze) — nothing downstream re-reads JSON.
"""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import types as T

try:  # Python DataSource API: PySpark >= 4.0
    from pyspark.errors import PySparkNotImplementedError
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover — older runtimes
    HAS_DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class SimpleDataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class DataSourceWriter:  # type: ignore[no-redef]
        pass

    class WriterCommitMessage:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value

    class PySparkNotImplementedError(NotImplementedError):  # type: ignore[no-redef]
        def __init__(self, *a, **kw):
            super().__init__()


# Canonical output schema: the snake_case wire row + per-file metadata.
DUMP_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("auc", T.LongType()),
        T.StructField("item", T.LongType()),
        T.StructField("owner", T.StringType()),
        T.StructField("owner_realm", T.StringType()),
        T.StructField("bid", T.LongType()),
        T.StructField("buyout", T.LongType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("time_left", T.StringType()),
        T.StructField("realm_slug", T.StringType()),
        T.StructField("source_file", T.StringType()),
    ]
)


class _DumpPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AuctionDumpReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auction_dump: 'path' option is required")

    def partitions(self):
        pats = ("*.json", "*.json.gz")
        files = sorted(
            f
            for pat in pats
            for f in glob.glob(os.path.join(self.path, pat))
        )
        if os.path.isfile(self.path):
            files = [self.path]
        # one gzip whole-document JSON = one task: the file IS the
        # correct split unit (non-splittable codec, per-realm cadence).
        # An EMPTY directory still needs one (sentinel) partition —
        # with a bare [], Spark runs a task with partition=None and
        # the read crashes instead of yielding zero rows (caught by
        # the write→read property test on the empty frame).
        return [_DumpPartition(f) for f in files] or [_DumpPartition(None)]

    def read(self, partition):
        if partition is None or partition.path is None:
            return  # sentinel for an empty directory: zero rows
        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rt", encoding="utf-8") as fh:
            try:
                doc = json.load(fh)
            except (json.JSONDecodeError, UnicodeDecodeError):
                return  # malformed dump: zero rows, surfaced by counts
        realms = doc.get("realms") or []
        slug = realms[0].get("slug") if realms else None
        fname = os.path.basename(partition.path)
        for a in doc.get("auctions") or []:
            yield (
                a.get("auc"),
                a.get("item"),
                a.get("owner"),
                a.get("ownerRealm"),
                a.get("bid"),
                a.get("buyout"),
                a.get("quantity"),
                a.get("timeLeft"),
                slug,
                fname,
            )


class AuctionDumpDataSource(DataSource):
    """`spark.read.format("auction_dump").load(dir)`."""

    @classmethod
    def name(cls) -> str:
        return "auction_dump"

    def schema(self):
        return DUMP_SOURCE_SCHEMA

    def reader(self, schema):
        return AuctionDumpReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    if HAS_DATASOURCE_API:
        spark.dataSource.register(AuctionDumpDataSource)


class AuctionDumpStreamReader(
    SimpleDataSourceStreamReader if HAS_DATASOURCE_API else object
):
    """The reference's intake POLL LOOP as a streaming source: each
    micro-batch picks up dump files that appeared since the last
    offset — the download-on-lastModified-change cadence, expressed
    as a Spark streaming offset log.

    Offsets are the sorted list of consumed file names (append-only,
    dumps-count sized — at production scale a (region, realm) →
    lastModified watermark map, exactly the reference's manifest).
    ``readBetweenOffsets`` replays a committed range
    deterministically, which is what makes checkpoint recovery
    exactly-once."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auction_dump: 'path' option is required")

    def _files(self):
        return sorted(
            os.path.basename(f)
            for pat in ("*.json", "*.json.gz")
            for f in glob.glob(os.path.join(self.path, pat))
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, names):
        for name in names:
            part = _DumpPartition(os.path.join(self.path, name))
            yield from AuctionDumpReader({"path": self.path}).read(part)

    def read(self, start: dict):
        seen = set(start.get("files", []))
        now = self._files()
        new = [f for f in now if f not in seen]
        end = {"files": sorted(seen | set(new))}
        # materialized list, not a generator: the simple-stream harness
        # prefetches rows on the driver and pickles them to executors —
        # bounded by the new dumps of ONE poll tick, the same working
        # set the reference's downloader holds in memory per cycle
        return iter(list(self._rows_for(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        replay = [f for f in end.get("files", []) if f not in seen]
        return iter(list(self._rows_for(replay)))


class AuctionDumpPartitionedStreamReader(
    DataSourceStreamReader if HAS_DATASOURCE_API else object
):
    """The scale-correct streaming face: partition-planned, with
    EXECUTOR-side gzip/parse — the same split unit as the batch reader
    (one non-splittable dump file = one InputPartition = one task).

    The `SimpleDataSourceStreamReader` twin below prefetches each
    tick's rows ON THE DRIVER (the simple harness's contract), which
    is fine for one poll cycle locally but wrong at production fan-out
    (hundreds of realms × large dumps per tick). Here the driver only
    LISTS files: `latestOffset` snapshots the directory, `partitions`
    diffs two offsets into per-file partitions, and `read` runs in
    executor tasks. Offsets are the sorted consumed-file list (at
    production scale: a (region, realm) → lastModified watermark map,
    the reference's manifest), so `partitions(start, end)` is a pure
    function of the offset pair — checkpoint recovery replays a
    committed range deterministically, giving exactly-once.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auction_dump: 'path' option is required")

    def _files(self) -> list[str]:
        return sorted(
            os.path.basename(f)
            for pat in ("*.json", "*.json.gz")
            for f in glob.glob(os.path.join(self.path, pat))
        )

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        # Driver-side work is a directory LISTING only — no payload
        # bytes ever reach the driver. Unchanged listing → identical
        # offset JSON → Spark plans no batch this trigger.
        return {"files": self._files()}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        new = [f for f in end.get("files", []) if f not in seen]
        return [_DumpPartition(os.path.join(self.path, f)) for f in new]

    def read(self, partition):
        # Executor task: reuse the batch reader's per-file parse —
        # stdlib gzip+json, memory bounded by one dump document.
        yield from AuctionDumpReader({"path": self.path}).read(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing external to ack


class _DumpCommit(WriterCommitMessage):
    """Staged files produced by one write task (picklable payload)."""

    def __init__(self, staged: list[str]):
        self.staged = staged


class AuctionDumpWriter(DataSourceWriter if HAS_DATASOURCE_API else object):
    """`df.write.format("auction_dump").save(dir)` — EXPORT back to the
    reference's wire format: one gzip whole-document JSON per
    (realm_slug, task), with the camelCase auction keys the batch
    reader parses, so `read(write(df))` roundtrips exactly.

    Two-phase commit: each task writes dot-prefixed STAGED files (the
    reader's glob never matches leading-dot names, so concurrent
    readers can't observe partial output) and returns their names as
    its commit message; the driver's `commit` renames all staged files
    into place only after every task succeeded (clearing prior dumps
    first under overwrite), and `abort` removes the strays. For the
    canonical one-dump-per-realm layout, repartition by realm_slug
    before writing — multiple files per realm are also valid wire form
    (the reader treats each file as an independent dump document)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auction_dump: 'path' option is required")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.path, exist_ok=True)
        by_realm: dict = {}
        for row in iterator:
            by_realm.setdefault(row["realm_slug"], []).append(
                {
                    "auc": row["auc"],
                    "item": row["item"],
                    "owner": row["owner"],
                    "ownerRealm": row["owner_realm"],
                    "bid": row["bid"],
                    "buyout": row["buyout"],
                    "quantity": row["quantity"],
                    "timeLeft": row["time_left"],
                }
            )
        staged = []
        task = uuid.uuid4().hex[:12]
        for slug, aucs in by_realm.items():
            name = f".staged-{task}-{slug}.json.gz"
            doc = {"realms": [{"slug": slug}], "auctions": aucs}
            with gzip.open(
                os.path.join(self.path, name), "wt", encoding="utf-8"
            ) as fh:
                json.dump(doc, fh)
            staged.append(name)
        return _DumpCommit(staged)

    def commit(self, messages):
        if self.overwrite:
            for pat in ("*.json", "*.json.gz"):
                for f in glob.glob(os.path.join(self.path, pat)):
                    os.remove(f)
        for m in messages:
            if m is None:
                continue
            for name in m.staged:
                os.replace(
                    os.path.join(self.path, name),
                    os.path.join(self.path, name[len(".staged-"):]),
                )

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            for name in m.staged:
                try:
                    os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass


try:
    from pyspark.sql.datasource import DataSourceStreamWriter
except ImportError:  # pragma: no cover — older runtimes
    class DataSourceStreamWriter:  # type: ignore[no-redef]
        pass


class AuctionDumpStreamWriter(
    DataSourceStreamWriter if HAS_DATASOURCE_API else object
):
    """`df.writeStream.format("auction_dump")` — continuous EXPORT to
    the wire format, one gzip document per (realm, task) per
    micro-batch. Exactly-once by EPOCH NAMING: committed files are
    `batch-<epoch>-<task>-<realm>.json.gz`, so a replayed epoch (crash
    between sink commit and checkpoint write) first clears that
    epoch's previous files and re-lands them — idempotent without a
    transaction log. Tasks stage dot-prefixed files; the driver's
    per-epoch commit renames them into place only after all tasks
    succeeded (same two-phase shape as the batch writer)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("auction_dump: 'path' option is required")

    def write(self, iterator):
        # identical task-side staging as the batch face
        return AuctionDumpWriter({"path": self.path}, overwrite=False).write(
            iterator
        )

    def commit(self, messages, batchId: int) -> None:
        # replayed epoch: drop its previous output before re-landing
        for f in glob.glob(os.path.join(self.path, f"batch-{batchId}-*")):
            os.remove(f)
        for m in messages:
            if m is None:
                continue
            for name in m.staged:
                os.replace(
                    os.path.join(self.path, name),
                    os.path.join(
                        self.path,
                        f"batch-{batchId}-{name[len('.staged-'):]}",
                    ),
                )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            for name in m.staged:
                try:
                    os.remove(os.path.join(self.path, name))
                except FileNotFoundError:
                    pass


def _writer(self, schema, overwrite: bool):
    return AuctionDumpWriter(self.options, overwrite)


def _stream_writer(self, schema, overwrite: bool):
    return AuctionDumpStreamWriter(self.options)


def _stream_reader(self, schema):
    # Spark prefers streamReader() when implemented; opt back into the
    # driver-prefetch simple harness with .option("simple", "true")
    # (kept for tests and tiny local pipelines).
    if str(self.options.get("simple", "")).lower() == "true":
        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED",
            messageParameters={"feature": "streamReader (simple requested)"},
        )
    return AuctionDumpPartitionedStreamReader(self.options)


def _simple_stream_reader(self, schema):
    return AuctionDumpStreamReader(self.options)


AuctionDumpDataSource.streamReader = _stream_reader
AuctionDumpDataSource.simpleStreamReader = _simple_stream_reader
AuctionDumpDataSource.writer = _writer
AuctionDumpDataSource.streamWriter = _stream_writer
