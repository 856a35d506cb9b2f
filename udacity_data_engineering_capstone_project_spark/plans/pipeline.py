"""Durable, resumable multi-stage pipeline runner (composition layer).

The corpus example's hand-written pattern — run a stage, materialize a
barrier, go on — formalized: a pipeline is an ordered list of
``(name, fn)`` stages over one DataFrame. Between stages the runner
places a BARRIER so downstream actions never replay upstream lineage
(the quadratic-recompute trap documented in the example):

- with ``checkpoint_dir``: each stage's output is written as parquet
  to ``<dir>/<i>_<name>`` and read back — a DURABLE checkpoint. On a
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


def run_pipeline(
    df: DataFrame,
    stages: Sequence[tuple[str, Callable[[DataFrame], DataFrame]]],
    checkpoint_dir: str | None = None,
    resume: bool = True,
    count_rows: bool = False,
    version: str | None = None,
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
