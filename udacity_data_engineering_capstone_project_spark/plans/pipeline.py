"""Durable, resumable multi-stage pipeline runner (composition layer).

The corpus example's hand-written pattern — run a stage, materialize a
barrier, go on — formalized: a pipeline is an ordered list of
``(name, fn)`` stages over one DataFrame. Between stages the runner
places a BARRIER so downstream actions never replay upstream lineage
(the quadratic-recompute trap documented in the example):

- with ``checkpoint_dir``: each stage's output is written as parquet
  to ``<dir>/p<fingerprint>/<i>_<name>`` and read back — a DURABLE
  checkpoint (the fingerprint segment keys the tree to the stage list
  + version, see `run_pipeline`). On a
  rerun, stages whose directory is committed (``_SUCCESS``) are
  SKIPPED entirely (their fn is never invoked) and the stored output
  feeds the next stage — the real 100 TB failure-recovery shape: a
  9-hour pipeline that died in stage 7 resumes at stage 7, and the
  commit marker means a torn write from the crash is recomputed, not
  trusted.
- without ``checkpoint_dir``: eager ``localCheckpoint`` barriers —
  fast, session-local, not resumable.

Stage functions must be deterministic for resume to be meaningful
(same input -> same output; all engine operators here qualify). The
runner records wall-clock per stage; pass ``count_rows=True`` to also
record row counts (one extra count job per stage against the
materialized barrier — cheap).
"""

from __future__ import annotations

import hashlib
import re
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class StageResult:
    name: str
    wall_s: float
    skipped: bool
    rows: int | None
    path: str | None


def _slug(name: str) -> str:
    s = re.sub(r"[^A-Za-z0-9_.-]+", "_", name).strip("_")
    if not s:
        raise ValueError(f"stage name {name!r} has no usable characters")
    return s


def _committed(spark, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    return p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()).exists(p)


def orphaned_checkpoint_trees(
    spark, checkpoint_dir: str, keep_fingerprint: str
) -> list[str]:
    """Fingerprint trees (``p*/`` children of ``checkpoint_dir``) that
    no longer match ``keep_fingerprint`` — the disk the current
    pipeline version will never read again."""
    jvm = spark.sparkContext._jvm
    p = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    fp_shape = re.compile(r"^p[0-9a-f]{12}$")  # exactly a fingerprint tree
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and fp_shape.match(name)
            and name != f"p{keep_fingerprint}"
        ):
            out.append(str(st.getPath()))
    return sorted(out)


def run_pipeline(
    df: DataFrame,
    stages: Sequence[tuple[str, Callable[[DataFrame], DataFrame]]],
    checkpoint_dir: str | None = None,
    resume: bool = True,
    count_rows: bool = False,
    version: str | None = None,
    prune_orphans: bool = False,
):
    """Run ``stages`` over ``df`` with a barrier between each — see the
    module docstring for the durability/resume contract.

    Resume matches checkpoints by a pipeline FINGERPRINT (the ordered
    stage-name list plus the caller-supplied ``version`` token), so
    inserting/renaming/reordering stages invalidates the whole tree
    rather than silently serving a stale stage. Stage BODIES are not
    hashed (closures make that unreliable); when stage code or the
    input snapshot changes, bump ``version`` — checkpoints land under
    ``<dir>/p<fingerprint>/`` so old trees are simply never matched.

    The never-matched trees are also never DELETED by default: each
    fingerprint change (stage rename, version bump) permanently
    orphans the previous tree, so a long-lived ``checkpoint_dir``
    grows by one full pipeline footprint per version — deliberate
    (the old tree may belong to a still-running or rollback-able
    deployment), but unbounded. Pass ``prune_orphans=True`` to delete
    every sibling fingerprint tree that is not the current one before
    running, or call `orphaned_checkpoint_trees` to list them and
    decide; prune only when no other pipeline version shares the
    directory. Only directories matching the exact fingerprint shape
    (``p`` + 12 hex chars) are ever listed or deleted — an unrelated
    ``prod/`` or ``parts/`` sibling is never touched.

    Returns ``(final_df, [StageResult, ...])``. ``final_df`` reads
    from the last barrier (stored parquet or local checkpoint blocks),
    so further actions never recompute the pipeline.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    names = [_slug(n) for n, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"stage names must be unique after slugging: {names}")

    fp = hashlib.sha256(
        ("\x1f".join(names) + "\x00" + (version or "")).encode()
    ).hexdigest()[:12]
    spark = df.sparkSession
    if prune_orphans and checkpoint_dir:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for tree in orphaned_checkpoint_trees(spark, checkpoint_dir, fp):
            tp = jvm.org.apache.hadoop.fs.Path(tree)
            tp.getFileSystem(hconf).delete(tp, True)
    cur = df
    results: list[StageResult] = []
    for i, ((name, fn), slug) in enumerate(zip(stages, names)):
        t0 = time.time()
        path = f"{checkpoint_dir}/p{fp}/{i:02d}_{slug}" if checkpoint_dir else None
        if path and resume and _committed(spark, path):
            cur = spark.read.parquet(path)
            skipped = True
        else:
            out = fn(cur)
            if path:
                out.write.mode("overwrite").parquet(path)
                cur = spark.read.parquet(path)
            else:
                cur = out.localCheckpoint(eager=True)
            skipped = False
        rows = cur.count() if count_rows else None
        results.append(
            StageResult(
                name=name,
                wall_s=round(time.time() - t0, 3),
                skipped=skipped,
                rows=rows,
                path=path,
            )
        )
    return cur, results
