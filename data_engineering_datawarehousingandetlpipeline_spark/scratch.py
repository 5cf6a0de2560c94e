"""Scratch-workdir hygiene for end-to-end drain queries.

Several registered queries prove streaming / warehouse semantics by
actually RUNNING a pipeline at query time: they stage input shards into
a fresh ``tempfile.mkdtemp`` workdir, drain a stream (or replay a table
lifecycle) against it, and return a DataFrame that reads the sink files
back. Until r15 those workdirs were abandoned — every invocation (twice
per bench warm-up, once per sweep per tier, every driver round) leaked
staged shards, state stores, checkpoints and sinks into /tmp (r14
verdict, "what's wrong" #2).

:func:`materialized_result` is the shared fix: pin the query's final
(small, aggregated) result into Spark block storage with an EAGER
``localCheckpoint`` — severing the plan's dependency on the sink files —
then delete the workdir. The caller's contract stays identical: same
schema, same rows, same row order (localCheckpoint preserves partition
contents and order); only the physical plan changes (a ``Scan
ExistingRDD`` over the pinned blocks instead of a file scan — the same
pinning idiom the iterative queries already rely on).

On the FAILURE path the workdir is deliberately left in place: a drain
that dies mid-stream leaves its checkpoint and sink exactly as the
failure saw them, which is what you want for a post-mortem, and the next
successful invocation cannot trip over it (every invocation gets a fresh
``mkdtemp``).

Production deployments never hit this module: these queries' staging
blocks exist only because the test image has no Kafka broker / object
store — a real pipeline points the stream at its transport and the sink
at a durable path that outlives any one query.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame


def materialized_result(result: DataFrame, workdir: str) -> DataFrame:
    """Materialize ``result`` off its scratch ``workdir``, then delete it.

    ``result`` must be the query's FINAL DataFrame (small: an aggregate
    or a bounded report), lazily reading files under ``workdir``. The
    pinned copy no longer references the deleted files.

    Pinning strategy is master-aware (ADVICE r15): ``localCheckpoint``
    stores blocks NON-reliably in executor storage, so on a
    multi-executor cluster an executor loss after ``workdir`` is deleted
    would make the result unrecomputable (lineage severed, source files
    gone). In local mode — the only place these drain queries run in
    this image — the executor IS the driver, so localCheckpoint is safe
    and cheap and preserves partition contents/order exactly. On any
    non-local master the result (small by contract) is collected to the
    driver and recreated instead, which survives executor loss.
    """
    spark = result.sparkSession
    if spark.sparkContext.master.startswith("local"):
        pinned = result.localCheckpoint(eager=True)
    else:
        pinned = spark.createDataFrame(result.collect(), result.schema)
    shutil.rmtree(workdir, ignore_errors=True)
    return pinned
