"""Process-scoped scratch directories for ephemeral engine artifacts.

The streaming helpers materialize bounded streams through real file
sinks (parquet sink + checkpoint + staged source drops). Those artifacts
are EPHEMERAL by construction — they exist so one query invocation can
drain a stream and read the result back, and every directory is removed
at process exit — yet each micro-batch cycle pays dozens of small file
creates, renames and metadata commits on them (sink manifest, checkpoint
offsets/commits, state-store delta files). On a disk-backed /tmp that
metadata churn is a fixed per-batch constant unrelated to data volume
(guide §6: small files hurt twice).

``scratch_dir`` therefore places them on the fastest local ephemeral
storage available: ``$SPARK_GRAFT_SCRATCH_DIR`` when set (the cluster
knob — point it at the instance's NVMe scratch, exactly like
``spark.local.dir``), else ``/dev/shm`` when writable (Linux tmpfs),
else the platform tempdir. Durability is NOT traded away: these dirs
never outlive the process by contract (a restartable deployment passes
its own durable checkpoint location explicitly and does not use this
helper), and everything is registered for removal at interpreter exit —
which also fixes the table-dir/staging leak class flagged in r10's
advice for the sink dirs.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None


def _pick_base() -> str:
    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        os.makedirs(env, exist_ok=True)
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


def scratch_root() -> str:
    """The per-process scratch root (created lazily, removed at exit)."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="lvs_scratch_", dir=_pick_base())
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh ephemeral directory under the process scratch root."""
    return tempfile.mkdtemp(prefix=prefix, dir=scratch_root())


def stage_mod_batches(df, key_col, k: int, staging: str) -> str:
    """Write ``df`` as ``k`` single-file parquet drops (``batch_<b>.parquet``
    holds rows with ``key_col % k == b``) with strictly increasing mtimes,
    so a file-stream source replays them oldest-first, one per micro-batch.

    ONE job stages all k drops: a single task partitioned-writes the k
    slices in one pass (``repartition(1)`` + ``partitionBy`` — the staged
    corpus is micro-batch-sized by construction, so single-task is the
    right shape), replacing the k sequential filter+coalesce(1) jobs that
    each re-scanned the source (guide §1.2: don't compute things k times).
    """
    import time

    from pyspark.sql import functions as F

    build = os.path.join(staging, "_build")
    (
        df.withColumn("_b", (key_col % k).cast("int"))
        .repartition(1)
        .write.partitionBy("_b")
        .mode("overwrite")
        .parquet(build)
    )
    now = time.time()
    for b in range(k):
        part_dir = os.path.join(build, f"_b={b}")
        part = next(p for p in os.listdir(part_dir) if p.endswith(".parquet"))
        dst = os.path.join(staging, f"batch_{b}.parquet")
        os.replace(os.path.join(part_dir, part), dst)
        # Oldest-first delivery (latestFirst=false default), one minute apart.
        os.utime(dst, (now - 60 * (k - b),) * 2)
    shutil.rmtree(build, ignore_errors=True)
    return staging
