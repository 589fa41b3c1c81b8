"""Custom Python Data Source with the reference's object-store contract.

The reference's source pipeline (reference app.py:13-30) is:
list objects under ``{bucket}/{prefix}/{extract_date}`` → keep keys
whose name contains the category substring → GET + parse each CSV →
concat. ``sources/lake.py`` replaces that with Spark's native CSV
reader (the hot path — JVM, vectorized, splittable). This module
implements the SAME contract as a pluggable Spark 4 **Python Data
Source** — the extension point you use when the listing protocol is
NOT a filesystem Spark understands: a REST catalog, a boto3 pagination
loop with custom auth, a proprietary object index.

Execution model: ``partitions()`` runs once on the driver (the cheap
listing call); each listed object becomes one ``InputPartition``, so
the N downloads+parses run in PARALLEL across executors — the
reference does them sequentially in one process. Rows stream back
over Arrow. For plain files this is strictly slower than the native
reader (Python parse path); it exists for protocol extensibility and
as the template for binary/multimodal ingestion connectors.

Usage::

    register(spark)                            # not spark.dataSource.register
    (spark.read.format("lake_objects")
        .schema(LAKE_SCHEMAS[category])        # explicit, never inferred
        .option("root", lake_root)
        .option("category", category)
        .option("extract_date", extract_date)
        .load())

    # streaming: watch the lake, ingest newly landed objects
    # exactly-once (extract_date omitted — dates are discovered)
    (spark.readStream.format("lake_objects")
        .schema(LAKE_SCHEMAS[category])
        .option("root", lake_root)
        .option("category", category)
        .load())

    # streaming sink: land micro-batches as manifest-committed CSV
    # objects (two-phase staging commit, replay-idempotent)
    (df.writeStream.format("lake_objects")
        .option("root", lake_root)
        .option("category", category)
        .option("extract_date", extract_date)
        .option("checkpointLocation", ckpt)
        .start())

Deployment note (why ``register`` exists): Spark ships the DataSource
class to Python workers via cloudpickle, which by default pickles
classes BY REFERENCE — workers then try to import this module and
fail unless the package is on every worker's ``sys.path``. On a real
cluster you ship the package (``--py-files`` zip / pip image). For a
path-independent local run, ``register`` flips this one module to
by-value pickling, which is why the module deliberately has no
package-internal imports (stdlib + pyspark only): by-value
registration does not extend to a module's imports.
"""

from __future__ import annotations

import csv
import glob
import os
import sys
from collections.abc import Iterator, Sequence

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructType,
)

# mirrors sources.lake.LAKE_PREFIX — duplicated literal, not imported,
# to keep this module dependency-free for by-value pickling (see
# module docstring); equality is asserted in tests.
LAKE_PREFIX = "real_estate/cost_of_living"


def register(spark) -> None:
    """Register the source with by-value class pickling so Python
    workers never need this package importable."""
    from pyspark import cloudpickle

    if __name__ not in sys.modules:  # e.g. importlib.spec loading
        raise RuntimeError(
            "import this module as part of its package before calling "
            "register() — by-value pickling needs it in sys.modules"
        )
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(LakeObjectsDataSource)


class LakeObjectsDataSource(DataSource):
    """``format("lake_objects")`` — see module docstring.

    ``schema()`` is deliberately NOT implemented: the engine-wide
    policy is explicit schemas (inference nondeterminism killed at the
    boundary, SURVEY §1.2), so the caller must pass ``.schema(...)``.
    """

    @classmethod
    def name(cls) -> str:
        return "lake_objects"

    def reader(self, schema: StructType) -> "LakeObjectsReader":
        return LakeObjectsReader(schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self.options.get("offset_mode") == "manifest_log":
            if "max_objects_per_batch" in self.options:
                # the manifest log already arrives pre-batched (one
                # manifest per upstream commit); a second cap would
                # need to SPLIT a manifest across offsets, which the
                # position encoding cannot express
                raise ValueError(
                    "offset_mode=manifest_log batches by upstream "
                    "manifest; max_objects_per_batch is not supported "
                    "here (throttle the PRODUCER, or use the listing "
                    "reader)"
                )
            return LakeManifestLogStreamReader(schema, self.options)
        if "max_objects_per_batch" in self.options:
            # throttled mode needs the start-aware simple-reader
            # protocol; raising here makes Spark fall back to
            # simpleStreamReader (pyspark datasource_internal
            # _streamReader contract)
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={
                    "feature": "streamReader with max_objects_per_batch"
                },
            )
        return LakeObjectsStreamReader(schema, self.options)

    def simpleStreamReader(
        self, schema: StructType
    ) -> "LakeObjectsSimpleStreamReader":
        return LakeObjectsSimpleStreamReader(schema, self.options)

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "LakeObjectsStreamWriter":
        if overwrite:
            # complete/truncate output mode asks each batch to REPLACE
            # the sink; this sink is append-only by contract (landed
            # objects are immutable) — appending full snapshots would
            # silently duplicate every row per micro-batch
            raise ValueError(
                "lake_objects sink is append-only (immutable landed "
                "objects); outputMode('complete') is not supported - "
                "use append/update, or a keyed sink (foreachBatch "
                "overwrite) for full-snapshot output"
            )
        return LakeObjectsStreamWriter(schema, self.options)


def _list_objects(root: str, category: str, extract_date: str | None) -> list[str]:
    """The reference's list_objects + key substring filter (app.py:26-27),
    as a pure function shared by the batch and stream readers.

    ``extract_date=None`` widens the listing to EVERY date partition
    under the lake prefix — the stream reader's watch set (each newly
    landed extract-date directory is discovered, not configured).
    """
    prefix = os.path.join(root, LAKE_PREFIX, extract_date or "")
    return sorted(
        p
        for p in glob.glob(os.path.join(prefix, "**", "*"), recursive=True)
        if os.path.isfile(p) and category in os.path.basename(p)
    )


def _parse_object(path: str, schema: StructType) -> Iterator[tuple]:
    """Executor-side: fetch + parse ONE object (the body of the
    reference's sequential loop, app.py:28-29), typed against the
    declared schema instead of re-inferred per file."""
    converters = []
    for field in schema.fields:
        if isinstance(field.dataType, (IntegerType, LongType)):
            converters.append((field.name, int))
        elif isinstance(field.dataType, (DoubleType, FloatType)):
            converters.append((field.name, float))
        else:
            converters.append((field.name, str))
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            yield tuple(
                conv(row[name]) if row.get(name) not in (None, "") else None
                for name, conv in converters
            )


class LakeObjectsReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.category = options["category"]
        self.extract_date = options["extract_date"]

    def partitions(self) -> Sequence[InputPartition]:
        """Driver-side listing: one partition per object."""
        keys = _list_objects(self.root, self.category, self.extract_date)
        return [InputPartition(k) for k in keys]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None or partition.value is None:
            return  # empty listing: Spark still schedules one task
        yield from _parse_object(partition.value, self.schema)


class LakeObjectsStreamReader(DataSourceStreamReader):
    """Streaming half of the lake contract: the reference reruns its
    whole batch job per extract date (app.py:106,132 — one invocation
    per landed partition); here the engine DISCOVERS newly landed
    objects and processes exactly the delta, with checkpointed
    exactly-once progress.

    Offset model: an offset is the sorted list of every object path
    seen so far (``{"files": [...]}``). ``latestOffset`` relists the
    lake; ``partitions(start, end)`` is the set difference — each new
    object becomes one InputPartition, so a micro-batch's downloads
    and parses run in parallel across executors exactly like the
    batch reader. Replaying a committed micro-batch from the
    checkpoint recomputes the same difference → the same files → the
    same rows (objects are immutable once landed; the lake contract).

    Backlog throttle: setting ``max_objects_per_batch`` switches the
    stream to :class:`LakeObjectsSimpleStreamReader` (see its
    docstring for why the throttle lives there) so a trigger takes at
    most that many new objects; without it, this reader's first
    trigger after an outage takes the entire backlog in one batch.

    Scale note: the offset grows O(seen objects) and is rewritten to
    the checkpoint each batch. That is the correct *contract* but the
    wrong *encoding* for a 100 TB lake with millions of objects —
    production swaps the listing for a manifest/notification log
    (S3 inventory, SQS events, a catalog table) and the offset for a
    position in that log; ``partitions``/``read`` stay unchanged.
    Spark's own file source makes the identical trade (its checkpoint
    log records every seen file). That variant ships as
    :class:`LakeManifestLogStreamReader`
    (``.option("offset_mode", "manifest_log")`` — O(1) offsets over
    the sink's ``_commits`` log); THIS reader remains the default
    because it needs no log producer.
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.category = options["category"]
        # unlike the batch reader, extract_date is optional: a stream
        # normally watches every date partition as it lands
        self.extract_date = options.get("extract_date")
        # backlog throttle (the file source's maxFilesPerTrigger):
        # without it, the first micro-batch after an outage swallows
        # the whole backlog — one giant batch, one giant commit, and a
        # failure retries ALL of it. Bounding the per-batch object
        # count turns catch-up into steady, individually-committed
        # micro-batches.
    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {
            "files": _list_objects(self.root, self.category, self.extract_date)
        }

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        new = sorted(set(end.get("files", [])) - set(start.get("files", [])))
        return [InputPartition(k) for k in new]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None or partition.value is None:
            return
        yield from _parse_object(partition.value, self.schema)

    def commit(self, end: dict) -> None:
        # progress lives in the streaming checkpoint; nothing to
        # acknowledge lake-side (objects are immutable)
        pass


class LakeManifestLogStreamReader(DataSourceStreamReader):
    """Manifest-log / position-offset variant of the stream reader
    (round-7 verdict item 7 — the encoding the listing reader's
    docstring promises for production), selected with
    ``.option("offset_mode", "manifest_log")``.

    Instead of relisting the lake and carrying the FULL seen-object
    set in every offset (O(objects) checkpoint growth), this reader
    tails an append-only commit log: the ``{root}/_commits/{id}.json``
    manifests that :class:`LakeObjectsStreamWriter` publishes (stand-in
    for S3 inventory / SQS notifications / a catalog table — each
    manifest names the immutable objects of one upstream commit). The
    offset is a POSITION in that log, ``{"last_batch": N}`` — O(1) per
    batch no matter how many objects the lake holds.

    ``latestOffset`` lists one directory (the log, not the lake);
    ``partitions(start, end)`` expands the manifests with
    ``start < id <= end`` into the usual one-InputPartition-per-object
    fan-out, applying the same category-substring / extract-date
    filters as the listing reader; ``read`` is byte-identical to the
    listing reader's. Replays are deterministic because manifests are
    immutable and never deleted: under the log contract below, the
    same offset pair always expands to the same object set, even
    after the log has grown (growth = ids above the pair's end).

    Log contract (the standard position-log assumption): manifests
    must be PUBLISHED in increasing id order — true for a streaming
    sink's sequential micro-batches. A producer that violates it
    (a straggler id below the consumed high-water mark) degrades
    gracefully, never incorrectly: no future window includes the
    straggler, a replayed UNCOMMITTED pair absorbs it exactly once,
    and a pair already committed skips it forever (pinned by
    tests/test_lake_datasource.py::test_manifest_log_out_of_order_id_degrades_gracefully).
    Multiple concurrent producers therefore need separate logs (their
    batch ids collide anyway).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.category = options["category"]
        self.extract_date = options.get("extract_date")

    def initialOffset(self) -> dict:
        return {"last_batch": -1}

    def _log_ids(self) -> list[int]:
        log_dir = os.path.join(self.root, "_commits")
        if not os.path.isdir(log_dir):
            return []
        ids = []
        for name in os.listdir(log_dir):
            stem, ext = os.path.splitext(name)
            if ext == ".json" and stem.isdigit():
                ids.append(int(stem))
        return sorted(ids)

    def latestOffset(self) -> dict:
        ids = self._log_ids()
        return {"last_batch": ids[-1] if ids else -1}

    def _wanted(self, obj: str) -> bool:
        """Mirror _list_objects exactly (ADVICE r08): the listing reader
        matches any FILE recursively under {root}/{LAKE_PREFIX}/
        {extract_date}/, so the manifest filter anchors on that path
        PREFIX — a basename(dirname(...)) equality check silently
        dropped objects nested one level deeper than the date dir."""
        if self.category not in os.path.basename(obj):
            return False
        prefix = os.path.join(self.root, LAKE_PREFIX, self.extract_date or "")
        return os.path.abspath(obj).startswith(
            os.path.abspath(prefix) + os.sep
        )

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        import json

        lo = start.get("last_batch", -1)
        hi = end.get("last_batch", -1)
        paths: list[str] = []
        for b in self._log_ids():
            if not lo < b <= hi:
                continue
            with open(os.path.join(self.root, "_commits", f"{b}.json")) as f:
                manifest = json.load(f)
            paths.extend(p for p in manifest.get("objects", []) if self._wanted(p))
        return [InputPartition(p) for p in sorted(paths)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None or partition.value is None:
            return
        yield from _parse_object(partition.value, self.schema)

    def commit(self, end: dict) -> None:
        # progress lives in the streaming checkpoint; the log itself is
        # immutable (same contract as the listing reader)
        pass


class LakeObjectsSimpleStreamReader(SimpleDataSourceStreamReader):
    """Throttled variant of the stream reader, selected by setting
    ``max_objects_per_batch`` (the file source's ``maxFilesPerTrigger``).

    Why a second reader: bounding a micro-batch needs the batch's
    START offset — "take at most N objects the stream has not yet
    processed". The full ``DataSourceStreamReader`` protocol never
    shows ``latestOffset`` the start offset (and driver-side reader
    instances are not guaranteed to persist across engine calls, so
    remembering it is unsound — empirically the engine constructs
    several instances and calls ``latestOffset`` before
    ``initialOffset``). ``SimpleDataSourceStreamReader.read(start)``
    IS start-aware: each trigger takes the sorted backlog beyond
    ``start``, caps it at ``max_objects_per_batch``, and returns
    (rows, end) — stateless, so fresh starts, in-run catch-up, and
    restarts all throttle identically, and ``readBetweenOffsets``
    replays any offset pair deterministically from the immutable lake.

    Tradeoff (why the unthrottled reader stays the default): Spark
    wraps simple readers in a driver-side prefetch — rows are parsed
    in the runner process, not fanned out one-InputPartition-per-
    object across executors. Bounded catch-up batches are exactly the
    case where that is acceptable; for full-parallel backfill
    throughput, use the default reader (or the batch reader per
    extract date).
    """

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options["root"]
        self.category = options["category"]
        self.extract_date = options.get("extract_date")
        self.max_per_batch = int(options["max_objects_per_batch"])
        if self.max_per_batch < 1:
            # 0 would stall the stream forever (healthy-looking query,
            # nothing ingested); negatives would silently slice off
            # the end of every backlog
            raise ValueError(
                f"max_objects_per_batch must be >= 1, got {self.max_per_batch}"
            )

    def initialOffset(self) -> dict:
        return {"files": []}

    def _backlog(self, start: dict) -> list[str]:
        listed = _list_objects(self.root, self.category, self.extract_date)
        done = set(start.get("files", []))
        return [p for p in listed if p not in done]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        take = self._backlog(start)[: self.max_per_batch]
        if not take:
            return iter(()), start  # no progress: offset must not move
        end = {"files": sorted(set(start.get("files", [])) | set(take))}
        return self._rows(take), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # uncommitted-batch replay after restart: the same offset pair
        # re-derives the same object set from the immutable lake
        replay = sorted(
            set(end.get("files", [])) - set(start.get("files", []))
        )
        return self._rows(replay)

    def _rows(self, paths: list[str]) -> Iterator[tuple]:
        # materialized: the engine's prefetch cache copy.copy()s this
        # iterator for replay, which list iterators support and
        # generators don't; the batch is bounded by max_objects_per_
        # batch, so the list is bounded too
        rows: list[tuple] = []
        for p in paths:
            rows.extend(_parse_object(p, self.schema))
        return iter(rows)


class LakeCommitMessage(WriterCommitMessage):
    """Per-task commit message: the staged object path + row count."""

    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class LakeObjectsStreamWriter(DataSourceStreamWriter):
    """Streaming half of the lake SINK contract: land each micro-batch
    as CSV objects with an atomic, replay-idempotent commit — the
    reference's append-only warehouse write (app.py:195-197) upgraded
    to exactly-once.

    Protocol (the classic two-phase object-store commit):

    1. ``write`` (executors, one call per partition): rows stream to a
       uuid-named object under ``{root}/_staging/`` — OUTSIDE the lake
       prefix, so concurrent readers never see half-written batches.
       The task returns the staged path in its commit message.
    2. ``commit`` (driver, once per micro-batch, AFTER every task
       succeeded): staged objects move to DETERMINISTIC batch-keyed
       names ``{category}_b{batchId}_{i}.csv`` under the extract-date
       partition, then a manifest lands at
       ``{root}/_commits/{batchId}.json``. A replayed batch (restart
       between commit and checkpoint advance) re-stages and re-commits
       onto the SAME names — overwrite, not duplicate — and a batch
       whose manifest already exists skips publication entirely and
       just discards its staged files. Either way output is
       exactly-once per batch id, same discipline as the repo's
       foreachBatch warehouse sink.
    3. ``abort``: the run's staging dir is cleared; the lake prefix
       was never touched.

    Consistency fine print: UNCOMMITTED batches are never visible (all
    staging happens outside the lake prefix), but a plain
    listing-based reader can observe a commit IN PROGRESS (objects of
    a batch appearing one PUT at a time, or a crashed-then-replayed
    batch being swept and republished). The ``_commits/`` manifests
    are the authority — exact consumers should read the object set
    from the manifests; listing readers get eventual append-only
    consistency, which is the usual lake contract. A run that dies
    also leaves its ``_staging/<run_id>/`` dir behind; a TTL sweep of
    ``_staging`` older than the checkpoint horizon reclaims it —
    standard object-store housekeeping, same as Spark's own
    ``_temporary`` dirs.

    Dialect note: CSV cannot represent NULL distinctly from the empty
    string — both land as an empty field and read back as NULL (the
    native Spark CSV default and the reference's pandas ``read_csv``
    behave the same). Pipelines that must preserve empty-vs-null
    round-trips belong on the parquet warehouse sink, not a CSV lake.

    On a real object store ``os.replace`` becomes copy+delete (or a
    multipart-complete) and the manifest write must be the
    last-writer-wins atomic PUT; the protocol is unchanged — only
    rename atomicity moves from POSIX to the store's PUT semantics.
    """

    def __init__(self, schema: StructType, options: dict):
        import uuid

        self.fields = [f.name for f in schema.fields]
        self.root = options["root"]
        self.category = options["category"]
        self.extract_date = options["extract_date"]
        # one staging dir per query run: batches within a run are
        # sequential, so after each commit/abort the run's staging dir
        # holds only orphans of THAT batch's failed task attempts and
        # can be cleared wholesale; concurrent queries (distinct run
        # ids) never see each other's staging
        self.run_id = uuid.uuid4().hex

    def write(self, iterator) -> LakeCommitMessage:
        import uuid

        staging = os.path.join(self.root, "_staging", self.run_id)
        os.makedirs(staging, exist_ok=True)
        path = os.path.join(staging, f"{self.category}_{uuid.uuid4().hex}.csv")
        n = 0
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(self.fields)
            for row in iterator:
                w.writerow([row[name] for name in self.fields])
                n += 1
        return LakeCommitMessage(path, n)

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.root, "_commits", f"{batch_id}.json")

    def _clear_staging(self) -> None:
        """Remove every object in this run's staging dir — after a
        commit/abort anything left there is an orphan of a failed or
        superseded task attempt of the just-finished batch (batches
        within a run are sequential), so clearing wholesale is the
        leak-proof cleanup message-list iteration alone is not."""
        import shutil

        staging = os.path.join(self.root, "_staging", self.run_id)
        shutil.rmtree(staging, ignore_errors=True)

    def commit(self, messages, batchId: int) -> None:
        import glob as _glob
        import json

        staged = [m.staged for m in messages if m is not None]
        manifest = self._manifest_path(batchId)
        if os.path.exists(manifest):
            # replayed batch already published: drop the re-staged copies
            self._clear_staging()
            return
        dest_dir = os.path.join(self.root, LAKE_PREFIX, self.extract_date)
        os.makedirs(dest_dir, exist_ok=True)
        os.makedirs(os.path.dirname(manifest), exist_ok=True)
        # a previous attempt may have crashed BETWEEN publishing
        # objects and writing the manifest; this attempt may publish
        # fewer files (different partitioning after restart), so any
        # object of this batch id beyond what we now publish would
        # survive as duplicated rows — remove the batch's objects
        # before republishing
        for stale in _glob.glob(
            os.path.join(dest_dir, f"{self.category}_b{batchId:010d}_*.csv")
        ):
            os.remove(stale)
        published = []
        for i, p in enumerate(sorted(staged)):
            dest = os.path.join(
                dest_dir, f"{self.category}_b{batchId:010d}_{i:05d}.csv"
            )
            os.replace(p, dest)  # object store: copy + delete / atomic PUT
            published.append(dest)
        rows = sum(m.rows for m in messages if m is not None)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batchId, "rows": rows, "objects": published}, f)
        os.replace(tmp, manifest)  # manifest PUT is the commit point
        self._clear_staging()

    def abort(self, messages, batchId: int) -> None:
        self._clear_staging()
