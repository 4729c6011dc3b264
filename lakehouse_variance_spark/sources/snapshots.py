"""Versioned table snapshots — manifest-based time travel over parquet.

The reference stores everything in Iceberg, whose core contract is:
a table IS a chain of immutable snapshots, each listing its data files in
a manifest; readers pin a snapshot, writers commit a new one atomically
(`import_tables.py:14-19` registers tables by metadata file for exactly
this reason). The Iceberg runtime jar is not available here, so this
module provides the same contract natively on any Hadoop-visible
filesystem:

* data files are immutable — every commit writes NEW parquet files under
  ``data/c{n}/`` and never touches existing ones;
* a commit is one manifest file ``_versions/v{n}.json`` listing exactly
  the files visible at that version (append = parent files + new files,
  overwrite = new files only, rollback = an old version's file list under
  a new version number — history is never rewritten);
* the manifest write is atomic (temp file + ``os.replace``), and the
  version number doubles as the optimistic-concurrency token: two racing
  writers produce the same target name and the loser's replace is
  detectable by re-reading — the multi-writer story a real deployment
  delegates to a catalog's compare-and-swap, noted here, not faked.

Readers never LIST the data directory (an object-store LIST over millions
of files is the scalability killer manifests exist to avoid): they read
one small JSON and pass the explicit file list to the parquet source.
Schema evolution rides parquet's mergeSchema on read: each manifest also
records the schema DDL at commit time, so readers of an old version see
the old shape.

Named refs (Iceberg's branch/tag contract, spec v2 "refs" map): a TAG is
an immutable name → version pin (audit/WAP publish points); a BRANCH is a
mutable head that `commit_to_branch` advances independently of main —
version numbers stay one global monotonic sequence (Iceberg snapshot ids
are likewise global; branches are just named heads into the same history).
``main`` itself is a branch ref, maintained by every mainline commit, so
a branch commit NEVER changes what mainline readers see. Refs live in one
small JSON beside the manifests, updated with the same temp+replace
atomicity; `expire_snapshots` keeps every ref target alive.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(table_dir: str) -> Path:
    return Path(table_dir) / "_versions"


def _manifest_path(table_dir: str, version: int) -> Path:
    return _versions_dir(table_dir) / f"v{version}.json"


def current_version(table_dir: str) -> int:
    """Latest committed version, or 0 when the table does not exist."""
    vdir = _versions_dir(table_dir)
    if not vdir.exists():
        return 0
    versions = [
        int(p.stem[1:]) for p in vdir.glob("v*.json") if p.stem[1:].isdigit()
    ]
    return max(versions, default=0)


def _read_manifest(table_dir: str, version: int) -> dict:
    path = _manifest_path(table_dir, version)
    if not path.exists():
        raise FileNotFoundError(
            f"snapshot v{version} does not exist at {table_dir}"
        )
    return json.loads(path.read_text())


def _commit(table_dir: str, manifest: dict) -> int:
    """Atomic manifest publish: temp file + os.replace, then verify the
    committed content is OURS (optimistic-concurrency check — a racing
    writer of the same version would have clobbered one of us)."""
    vdir = _versions_dir(table_dir)
    vdir.mkdir(parents=True, exist_ok=True)
    target = _manifest_path(table_dir, manifest["version"])
    if target.exists():
        raise RuntimeError(
            f"concurrent commit: v{manifest['version']} already exists"
        )
    tmp = vdir / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    os.replace(tmp, target)
    committed = json.loads(target.read_text())
    if committed.get("commit_id") != manifest["commit_id"]:
        raise RuntimeError(
            f"lost commit race on v{manifest['version']}"
        )
    return manifest["version"]


def _refs_path(table_dir: str) -> Path:
    return _versions_dir(table_dir) / "refs.json"


def _read_refs(table_dir: str) -> dict:
    path = _refs_path(table_dir)
    if not path.exists():
        return {"branches": {}, "tags": {}}
    return json.loads(path.read_text())


def _write_refs(table_dir: str, refs: dict) -> None:
    vdir = _versions_dir(table_dir)
    vdir.mkdir(parents=True, exist_ok=True)
    tmp = vdir / f".tmp-refs-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(refs, indent=1, sort_keys=True))
    os.replace(tmp, _refs_path(table_dir))


def _main_head(table_dir: str) -> int:
    """Mainline head: the ``main`` branch ref when present, else the
    latest version (pre-refs tables stay fully compatible)."""
    head = _read_refs(table_dir)["branches"].get("main")
    return head if head is not None else current_version(table_dir)


def _advance_branch(table_dir: str, branch: str, version: int) -> None:
    refs = _read_refs(table_dir)
    refs["branches"][branch] = version
    _write_refs(table_dir, refs)
    # Optimistic lost-race check, mirroring the manifest _commit contract:
    # refs updates are read-modify-write of one file, so a concurrent
    # committer holding a STALE read can clobber this advance — leaving
    # the branch's readers behind a committed version. Re-reading after
    # os.replace catches the clobber when it lands before the re-read; a
    # NEWER version observed here is monotonic progress (a later commit
    # already superseded ours), not a loss, so only a missing or OLDER
    # value raises. This is best-effort detection on a single-writer-per-
    # branch design, not a lock — a stale clobber landing after the
    # re-read window still wins, which full protection would need a
    # compare-and-swap (or refs sequence numbers) to close.
    seen = _read_refs(table_dir)["branches"].get(branch)
    if seen is None or seen < version:
        raise RuntimeError(
            f"lost refs race advancing branch {branch!r} to v{version}: "
            f"refs.json now shows {seen!r} (clobbered by a stale "
            "concurrent ref update)"
        )


def resolve_ref(table_dir: str, name: str) -> int:
    """Version a tag or branch points at (tags win on name collision,
    matching Iceberg's refs map being a single namespace — collisions are
    rejected at create time anyway)."""
    refs = _read_refs(table_dir)
    if name in refs["tags"]:
        return refs["tags"][name]
    if name in refs["branches"]:
        return refs["branches"][name]
    raise KeyError(f"no tag or branch named {name!r} at {table_dir}")


def _seed_main(table_dir: str, refs: dict) -> None:
    """Pin ``main`` at the current head the first time any ref is created
    on a pre-refs table. Without this, a later branch commit would raise
    current_version() and the _main_head fallback would hand mainline
    readers the branch head — breaking branch isolation."""
    if "main" not in refs["branches"]:
        head = current_version(table_dir)
        if head > 0:
            refs["branches"]["main"] = head


def create_tag(table_dir: str, name: str, version: int | None = None) -> int:
    """Pin an immutable name to a version (default: mainline head).
    Re-tagging is an error — tags never move (Iceberg tag semantics)."""
    refs = _read_refs(table_dir)
    if name in refs["tags"] or name in refs["branches"]:
        raise ValueError(f"ref {name!r} already exists")
    v = version if version is not None else _main_head(table_dir)
    _read_manifest(table_dir, v)  # must exist
    _seed_main(table_dir, refs)
    refs["tags"][name] = v
    _write_refs(table_dir, refs)
    return v


def create_branch(table_dir: str, name: str, version: int | None = None) -> int:
    """Fork a mutable head at a version (default: mainline head)."""
    refs = _read_refs(table_dir)
    if name in refs["tags"] or name in refs["branches"]:
        raise ValueError(f"ref {name!r} already exists")
    v = version if version is not None else _main_head(table_dir)
    _read_manifest(table_dir, v)  # must exist
    _seed_main(table_dir, refs)
    refs["branches"][name] = v
    _write_refs(table_dir, refs)
    return v


def list_refs(table_dir: str) -> dict:
    """{"branches": {name: version}, "tags": {name: version}} snapshot."""
    return _read_refs(table_dir)


def read_ref(spark: SparkSession, table_dir: str, name: str) -> DataFrame:
    """Read the table as of a named tag or branch head."""
    return read_snapshot(spark, table_dir, resolve_ref(table_dir, name))


def _commit_dataframe(
    df: DataFrame,
    table_dir: str,
    *,
    parent: int,
    operation: str,
    mode: str,
    ref: str,
    extra: dict | None = None,
) -> int:
    """Shared commit body: write ``df``'s files under a fresh commit dir,
    build the manifest (append = parent's files + new, overwrite = new
    only), publish it atomically, and advance ``ref``. Every writer path
    (mainline, branch, streaming sink) funnels through here so fixes land
    once."""
    version = current_version(table_dir) + 1
    commit_id = uuid.uuid4().hex
    data_dir = Path(table_dir) / "data" / f"c{version}-{commit_id[:8]}"
    df.write.mode("error").parquet(str(data_dir))
    new_files = sorted(str(p) for p in data_dir.glob("*.parquet") if p.is_file())
    files = new_files
    if mode == "append" and parent > 0:
        files = _read_manifest(table_dir, parent)["files"] + new_files
    manifest = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "commit_id": commit_id,
        "schema_ddl": df.schema.simpleString(),
        "files": files,
    }
    if extra:
        manifest.update(extra)
    v = _commit(table_dir, manifest)
    _advance_branch(table_dir, ref, v)
    return v


def commit_to_branch(
    df: DataFrame, table_dir: str, branch: str, mode: str = "append"
) -> int:
    """Commit ``df`` on a branch: parent is the BRANCH head (not main),
    and only the branch ref advances — mainline readers are untouched.
    The version number still comes from the global sequence, so branch
    and main commits interleave in one history (audit stays linear)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = resolve_ref(table_dir, branch)
    if branch not in _read_refs(table_dir)["branches"]:
        raise ValueError(f"{branch!r} is a tag — tags are immutable")
    return _commit_dataframe(
        df,
        table_dir,
        parent=parent,
        operation=f"{mode}@{branch}",
        mode=mode,
        ref=branch,
    )


def write_snapshot(
    df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new table version; returns the version number.

    ``append`` makes the new files visible alongside the parent version's;
    ``overwrite`` replaces the visible set (old files stay on disk for
    time travel — physical removal is `expire_snapshots`' job, mirroring
    Iceberg's separation of logical delete from physical cleanup).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    return _commit_dataframe(
        df,
        table_dir,
        parent=_main_head(table_dir),
        operation=mode,
        mode=mode,
        ref="main",
    )


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (latest when None) — one manifest
    read plus an explicit-file-list parquet scan; the data directory is
    never listed. ``mergeSchema`` unifies evolved schemas (columns added
    in later commits read as NULL for older files)."""
    v = version if version is not None else _main_head(table_dir)
    manifest = _read_manifest(table_dir, v)
    if not manifest["files"]:
        raise ValueError(f"snapshot v{v} has no data files")
    return (
        spark.read.option("mergeSchema", "true").parquet(*manifest["files"])
    )


def rollback(table_dir: str, to_version: int) -> int:
    """Commit a NEW version whose visible file set is ``to_version``'s —
    history stays intact (the rolled-back versions remain readable)."""
    old = _read_manifest(table_dir, to_version)
    parent = _main_head(table_dir)
    commit_id = uuid.uuid4().hex
    v = _commit(
        table_dir,
        {
            "version": current_version(table_dir) + 1,
            "parent": parent,
            "operation": f"rollback->{to_version}",
            "commit_id": commit_id,
            "schema_ddl": old["schema_ddl"],
            "files": old["files"],
        },
    )
    _advance_branch(table_dir, "main", v)
    return v


def history(table_dir: str) -> list[dict]:
    """Commit log, oldest first: (version, parent, operation, n_files)."""
    out = []
    for v in range(1, current_version(table_dir) + 1):
        m = _read_manifest(table_dir, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
            }
        )
    return out


def expire_snapshots(table_dir: str, keep_last: int = 2) -> list[str]:
    """Physically delete data files referenced ONLY by expired versions;
    returns the deleted paths. Retention is PER REF: the ``keep_last``
    most recent ancestors along each ref head's parent chain (plus the
    global head) survive — Iceberg's ref-level retention — so heavy
    branch activity cannot evict main's recent history. The manifests
    themselves stay as tombstones so the commit log remains contiguous —
    reading an expired version raises on the missing files, matching
    Iceberg's expire-snapshots semantics."""
    latest = current_version(table_dir)
    # The keep window is PER REF: keep_last ancestors along each ref's
    # parent chain (plus the global head), the way Iceberg's ref-level
    # retention works. A global last-N window would let heavy branch
    # activity fill the window with branch heads' lineage and physically
    # expire main's recent history far sooner than keep_last suggests.
    refs = _read_refs(table_dir)
    heads = {latest}
    heads.update(refs["branches"].values())
    heads.update(refs["tags"].values())
    keep: set[int] = set()
    for head in heads:
        v, n = head, 0
        while v > 0 and n < keep_last:
            keep.add(v)
            n += 1
            v = _read_manifest(table_dir, v)["parent"]
    live: set[str] = set()
    for v in keep:
        live.update(_read_manifest(table_dir, v)["files"])
    doomed: set[str] = set()
    for v in range(1, latest + 1):
        if v not in keep:
            doomed.update(_read_manifest(table_dir, v)["files"])
    deleted = []
    for f in sorted(doomed - live):
        p = Path(f)
        if p.exists():
            p.unlink()
            deleted.append(f)
    return deleted


def _stream_hwm(table_dir: str, head: int) -> int:
    """Highest stream batch_id committed on the lineage ending at ``head``
    (-1 when none). Walks the parent chain only until the first manifest
    carrying a high-water mark — typically the previous micro-batch commit
    — so the cost per batch is O(non-stream commits since the last stream
    commit), not O(all versions). Pre-HWM manifests (older tables) fall
    back to their own stream_batch_id and keep walking."""
    hwm = -1
    v = head
    while v > 0:
        m = _read_manifest(table_dir, v)
        if "stream_batch_hwm" in m:
            return max(hwm, int(m["stream_batch_hwm"]))
        if "stream_batch_id" in m:
            hwm = max(hwm, int(m["stream_batch_id"]))
        v = m["parent"]
    return hwm


def committed_stream_batches(table_dir: str) -> set[int]:
    """Stream batch_ids already committed to this table (for the
    exactly-once streaming sink's replay check)."""
    out = set()
    for v in range(1, current_version(table_dir) + 1):
        b = _read_manifest(table_dir, v).get("stream_batch_id")
        if b is not None:
            out.add(int(b))
    return out


def snapshot_merge_writer(table_dir: str, merge_fn):
    """``foreachBatch`` function MERGING each micro-batch into the table,
    exactly-once: every batch commits one OVERWRITE snapshot holding
    ``merge_fn(batch_df, current_state)`` (``current_state`` is None for
    the first commit). The same high-water-mark replay guard as
    :func:`snapshot_batch_writer` applies BEFORE ``merge_fn`` is built —
    essential for merges, since re-merging a batch against the
    post-commit state would double-apply it (the additive counters in a
    CDC collapse, for instance, would double-count).

    This is the transactional streaming-MERGE sink Iceberg/Delta expose
    as ``foreachBatch`` + ``MERGE INTO``, on the native snapshot layer:
    each micro-batch is an atomic, time-travelable version, and a crash
    between sink write and checkpoint commit leaves only unreferenced
    files (invisible; reclaimed by expire_snapshots)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        parent = _main_head(table_dir)
        hwm = _stream_hwm(table_dir, parent)
        if int(batch_id) <= hwm:
            return  # replayed batch — already merged, skip
        state = (
            read_snapshot(batch_df.sparkSession, table_dir)
            if parent > 0
            else None
        )
        _commit_dataframe(
            merge_fn(batch_df, state),
            table_dir,
            parent=parent,
            operation="stream-merge",
            mode="overwrite",
            ref="main",
            extra={
                "stream_batch_id": int(batch_id),
                "stream_batch_hwm": max(int(batch_id), hwm),
            },
        )

    return write_batch


def snapshot_batch_writer(table_dir: str):
    """``foreachBatch`` function committing each micro-batch as ONE
    appended snapshot version, exactly-once.

    Structured Streaming guarantees at-least-once delivery to foreachBatch:
    after a crash between sink write and checkpoint commit, the SAME
    batch_id replays. The manifest records the stream batch_id, so a
    replayed batch is recognized and skipped — the committed table never
    double-counts, and every micro-batch is an atomic, time-travelable
    version (the transactional-table streaming sink Iceberg/Delta provide,
    on the native snapshot layer). A batch whose data files were written
    but whose manifest never committed leaves only unreferenced files —
    invisible to readers, reclaimed by expire_snapshots.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Replay detection via the HIGH-WATER MARK carried in the parent
        # chain: Structured Streaming batch ids are monotonic and only the
        # last uncommitted batch replays, so one manifest read answers the
        # check — scanning every manifest (committed_stream_batches) is
        # O(versions) per batch, O(n²) over a stream's life.
        parent = _main_head(table_dir)
        hwm = _stream_hwm(table_dir, parent)
        if int(batch_id) <= hwm:
            return  # replayed batch — already visible, skip
        _commit_dataframe(
            batch_df,
            table_dir,
            parent=parent,
            operation="stream-append",
            mode="append",
            ref="main",
            extra={
                "stream_batch_id": int(batch_id),
                "stream_batch_hwm": max(int(batch_id), hwm),
            },
        )

    return write_batch


def delete_from_snapshot(
    spark: SparkSession, table_dir: str, predicate: str
) -> int:
    """Row-level DELETE, copy-on-write: rewrite ONLY the data files that
    contain matching rows (Iceberg's copy-on-write delete granularity).

    File selection uses ``input_file_name()`` — one scan with the
    predicate pushed down finds the touched files; untouched files carry
    over into the new manifest by reference (zero I/O for them). The
    rewritten files hold the touched files' surviving rows. Old versions
    still see the pre-delete data (time travel is unaffected; physical
    reclaim stays expire_snapshots' job).
    """
    from pyspark.sql import functions as F

    parent = _main_head(table_dir)
    manifest = _read_manifest(table_dir, parent)
    df = read_snapshot(spark, table_dir, parent)
    touched = {
        r[0]
        for r in df.filter(predicate)
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    # input_file_name returns URIs (file:///...); manifests store plain paths
    from urllib.parse import unquote, urlparse

    touched_paths = {
        unquote(urlparse(t).path) if "://" in t or t.startswith("file:") else t
        for t in touched
    }
    keep_files = [
        f for f in manifest["files"] if f not in touched_paths
    ]
    if len(keep_files) == len(manifest["files"]):
        if touched_paths:
            # Rows matched but no manifest file resolved: the URI
            # normalization above failed (relative table_dir, scheme+
            # authority URI, ...). Returning parent here would silently
            # keep the matching rows alive after a DELETE — fail instead.
            raise RuntimeError(
                "delete_from_snapshot matched rows in files "
                f"{sorted(touched_paths)[:3]}... but none map to manifest "
                "paths — file-path normalization mismatch, refusing a "
                "silent no-op DELETE"
            )
        return parent  # predicate matched no rows — delete is a no-op
    version = current_version(table_dir) + 1
    commit_id = uuid.uuid4().hex
    data_dir = Path(table_dir) / "data" / f"c{version}-{commit_id[:8]}"
    # DELETE semantics remove rows where the predicate is TRUE; rows where
    # it evaluates NULL must SURVIVE. A bare NOT(pred) filter drops them
    # (NOT NULL is NULL → filtered out) — coalesce to FALSE first.
    # The survivors read pins the TABLE's merged schema explicitly: a
    # touched file from before a schema evolution lacks later-added
    # columns, and a predicate over such a column would otherwise fail to
    # resolve (the explicit schema surfaces them as NULL, same as the
    # mergeSchema read that selected the files).
    survivors = (
        spark.read.schema(df.schema)
        .parquet(*sorted(touched_paths))
        .filter(f"NOT coalesce({predicate}, false)")
    )
    survivors.write.mode("error").parquet(str(data_dir))
    new_files = sorted(str(p) for p in data_dir.glob("*.parquet") if p.is_file())
    v = _commit(
        table_dir,
        {
            "version": version,
            "parent": parent,
            "operation": f"delete-where({predicate})",
            "commit_id": commit_id,
            "schema_ddl": manifest["schema_ddl"],
            "files": keep_files + new_files,
        },
    )
    _advance_branch(table_dir, "main", v)
    return v


def optimize_snapshot(spark: SparkSession, table_dir: str) -> int:
    """Small-file compaction as a table-service commit (OPTIMIZE): read the
    current visible file set, rewrite it as right-sized files, publish ONE
    new version whose manifest lists only the compacted files. Readers of
    old versions keep the original files; expire_snapshots reclaims them
    once out of retention."""
    parent = _main_head(table_dir)
    manifest = _read_manifest(table_dir, parent)
    df = read_snapshot(spark, table_dir, parent)
    n_rows = df.count()
    # ~128 MB-equivalent sizing downscaled to fixture volumes: one output
    # file per 64k rows, minimum 1 (the production knob is bytes-based via
    # spark.sql.files.maxRecordsPerFile / target-file-size).
    n_out = max(1, n_rows // 65536)
    version = current_version(table_dir) + 1
    commit_id = uuid.uuid4().hex
    data_dir = Path(table_dir) / "data" / f"c{version}-{commit_id[:8]}"
    df.repartition(n_out).write.mode("error").parquet(str(data_dir))
    new_files = sorted(str(p) for p in data_dir.glob("*.parquet") if p.is_file())
    v = _commit(
        table_dir,
        {
            "version": version,
            "parent": parent,
            "operation": f"optimize({len(manifest['files'])}->{len(new_files)})",
            "commit_id": commit_id,
            "schema_ddl": manifest["schema_ddl"],
            "files": new_files,
        },
    )
    _advance_branch(table_dir, "main", v)
    return v


def remove_orphan_files(
    table_dir: str, older_than_seconds: float = 24 * 3600
) -> list[str]:
    """Delete data files referenced by NO manifest — the leftovers of
    commits that wrote files but crashed before publishing (Iceberg's
    remove_orphan_files maintenance action). This is the ONE maintenance
    path that must LIST the data directory, which is why it is a
    scheduled action, never part of a read.

    ``older_than_seconds`` protects IN-FLIGHT commits: a writer that has
    written its files but not yet published its manifest looks exactly
    like an orphan, so only files older than the grace window are
    reclaimed (Iceberg defaults its equivalent to 3 days for the same
    race)."""
    import time

    referenced: set[str] = set()
    for v in range(1, current_version(table_dir) + 1):
        referenced.update(_read_manifest(table_dir, v)["files"])
    cutoff = time.time() - older_than_seconds
    data_root = Path(table_dir) / "data"
    deleted = []
    if data_root.exists():
        for p in sorted(data_root.rglob("*.parquet")):
            if str(p) not in referenced and p.stat().st_mtime <= cutoff:
                p.unlink()
                deleted.append(str(p))
    return deleted


def files_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Iceberg's ``table.files`` metadata table: one row per data file
    visible at the current mainline version, with size and row count from
    the parquet footer (no data read — footer metadata only)."""
    import pyarrow.parquet as pq

    v = _main_head(table_dir)
    rows = []
    for f in _read_manifest(table_dir, v)["files"]:
        meta = pq.read_metadata(f)
        rows.append((f, meta.num_rows, Path(f).stat().st_size))
    return spark.createDataFrame(
        rows, "file_path string, record_count bigint, file_size_bytes bigint"
    )


def history_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Iceberg's ``table.history``/``table.snapshots`` metadata table: the
    commit log as a DataFrame (version, parent, operation, file count)."""
    rows = [
        (h["version"], h["parent"], h["operation"], h["n_files"])
        for h in history(table_dir)
    ]
    return spark.createDataFrame(
        rows, "version int, parent int, operation string, n_files int"
    )


def read_version_changes(
    spark: SparkSession, table_dir: str, from_version: int, to_version: int
) -> DataFrame:
    """Incremental read: rows APPENDED between two versions — the files
    listed by ``to_version`` but not by ``from_version`` (Iceberg's
    incremental append scan / Delta's change-data read for append-only
    commits). Downstream jobs consume exactly the delta instead of
    rescanning the table; with the streaming sink's one-version-per-batch
    commits this is replayable micro-batch lineage. Validation walks the
    PARENT CHAIN from ``to_version`` down to ``from_version`` (not the
    global version sequence — interleaved branch commits occupy versions
    in between without being on this lineage): every commit on the chain
    must be an append, and ``from_version`` must be an ancestor, or the
    file diff would conflate removals with appends — Iceberg's
    incremental scan refuses the same way."""
    if to_version <= from_version:
        raise ValueError("to_version must be after from_version")
    v = to_version
    while v > from_version:
        m = _read_manifest(table_dir, v)
        op = m["operation"]
        if not (op in ("append", "stream-append") or op.startswith("append@")):
            raise ValueError(
                f"incremental read crosses non-append commit v{v} ({op})"
            )
        v = m["parent"]
    if v != from_version:
        raise ValueError(
            f"v{from_version} is not an ancestor of v{to_version} — the "
            "versions are on different lineages (branch vs main)"
        )
    old = set(_read_manifest(table_dir, from_version)["files"])
    new_files = [
        f for f in _read_manifest(table_dir, to_version)["files"] if f not in old
    ]
    if not new_files:
        raise ValueError("no appended files in range")
    return spark.read.option("mergeSchema", "true").parquet(*new_files)


def publish_branch(table_dir: str, branch: str) -> int:
    """Write-audit-publish's publish step: fast-forward ``main`` to the
    branch head. Valid only when main's current head is an ancestor of the
    branch head along the parent chain (i.e. main has NOT advanced since
    the branch forked) — the same fast-forward-only rule as Iceberg's WAP
    cherry-pick for clean histories. On success main readers atomically
    see every audited branch commit; the branch ref remains for further
    staging."""
    head = resolve_ref(table_dir, branch)
    refs = _read_refs(table_dir)
    if branch not in refs["branches"]:
        raise ValueError(f"{branch!r} is a tag — cannot publish a tag")
    main = _main_head(table_dir)
    v = head
    while v > 0 and v != main:
        v = _read_manifest(table_dir, v)["parent"]
    if v != main:
        raise ValueError(
            f"cannot fast-forward: main (v{main}) is not an ancestor of "
            f"{branch!r} (v{head}) — rebase the branch or merge manually"
        )
    _advance_branch(table_dir, "main", head)
    return head
