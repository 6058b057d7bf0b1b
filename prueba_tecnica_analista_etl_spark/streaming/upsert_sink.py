"""Stateful streaming upsert sink (T5/T7/T8): the reference's
staging→UPSERT procedure per micro-batch, via ``foreachBatch``.

Each micro-batch is merged into a parquet target with the J4
join-rewrite, written to a temp path and atomically swapped (the
metastore-free equivalent of the reference's re-runnable DROP+ADD
idempotency). An ``etl_control`` ledger records (batch_id, estado,
filas) per batch — reference design ``nb:372``/``nb:356`` — and makes
replays idempotent: an already-recorded batchId is skipped, so
at-least-once delivery becomes effectively-once in the sink.

DLQ (T6): rows failing the caller's rules are routed to
``{target}/_rejects`` with a ``reject_reason`` column instead of
poisoning the merge.
"""

from __future__ import annotations

import os
import shutil
import time
from collections.abc import Callable, Sequence
from typing import TypeVar

from pyspark.sql import Column, DataFrame, SparkSession

from prueba_tecnica_analista_etl_spark.operators.quality import split_rejects
from prueba_tecnica_analista_etl_spark.operators.upsert import upsert

CONTROL = "_etl_control"
REJECTS = "_rejects"
DATA = "data"


_R = TypeVar("_R")


def run_with_retry(
    fn: Callable[[], _R],
    attempts: int = 3,
    backoff_s: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> _R:
    """Driver-side retry with exponential backoff (T8, reference design
    ``nb:372``): transient failures (executor loss, storage hiccups)
    get ``attempts`` tries with 1×, 2×, 4×… ``backoff_s`` waits; the
    idempotent batch ledger makes a retried ``process(batch, id)`` a
    safe no-op for work that already committed. Last failure re-raises
    so the caller's control table records the batch as failed, not
    silently skipped."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as ex:  # noqa: BLE001 - retry then re-raise
            last = ex
            if i < attempts - 1:
                sleep(backoff_s * (2**i))
    assert last is not None
    raise last


def _paths(target: str) -> tuple[str, str, str]:
    return (
        os.path.join(target, DATA),
        os.path.join(target, CONTROL),
        os.path.join(target, REJECTS),
    )


def read_control(spark: SparkSession, target: str) -> DataFrame | None:
    ctrl = _paths(target)[1]
    if not os.path.exists(ctrl):
        return None
    return spark.read.parquet(ctrl)


def foreach_batch_upsert(
    spark: SparkSession,
    target: str,
    keys: Sequence[str],
    rules: dict[str, Column] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callback. Usage::

        stream.writeStream.foreachBatch(
            foreach_batch_upsert(spark, target, ["event_id"])
        ).trigger(availableNow=True).start()
    """
    data_path, ctrl_path, rej_path = _paths(target)

    def process(batch: DataFrame, batch_id: int) -> None:
        ctrl = read_control(spark, target)
        if ctrl is not None and (
            ctrl.filter(ctrl.batch_id == batch_id).limit(1).count() > 0
        ):
            return  # replayed batch → already merged (idempotent)

        if rules:
            batch, rejected = split_rejects(batch, rules)
            if rejected.limit(1).count() > 0:
                rejected.write.mode("append").parquet(rej_path)

        if os.path.exists(data_path):
            base = spark.read.parquet(data_path)
            merged = upsert(base, batch.select(*base.columns), keys)
        else:
            merged = batch

        # write-then-swap: the target is never half-written
        tmp = data_path + f"._tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(data_path):
            shutil.rmtree(data_path)
        os.rename(tmp, data_path)

        n = spark.read.parquet(data_path).count()
        spark.createDataFrame(
            [(int(batch_id), "OK", int(n))],
            "batch_id long, estado string, filas long",
        ).write.mode("append").parquet(ctrl_path)

    return process
