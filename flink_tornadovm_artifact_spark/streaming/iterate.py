"""Stream iteration — the ``DataStream.iterate()`` feedback edge
(``FT/flink-streaming-java/.../datastream/DataStream.java:543``,
``IterativeStream.closeWith``; canonical use:
``flink-examples-streaming/.../iteration/IterateExample.java``).

Flink's streaming iteration is an ASYNCHRONOUS feedback edge: the step
operator consumes input ∪ feedback, routes each element either back to
the head or to the output, and ``iterate(maxWaitMillis)`` terminates
when no data arrives for the wait window. There is no barrier and no
per-round synchronization — which is exactly why a micro-batch analog
works: the head here is ``source ∪ fileStream(feedback_dir)``, the step
runs inside ``foreachBatch``, feedback rows are appended as parquet
segments to ``feedback_dir`` (becoming new available data for the SAME
query), and the drain loop stops when a pass produces no new feedback —
the maxWaitTime condition, detected by file count instead of wall
clock.

Semantics kept from the reference:
- feedback type = input type (Flink's default); ``withFeedbackType``
  — a feedback edge of a DIFFERENT type with a co-function step — is
  ``ConnectedStreamIteration`` below,
- the feedback edge is partitioned like the head input (the file
  round trip re-enters the same exchange),
- elements loop an unbounded number of times; each pass through the
  step is one micro-batch rather than one operator hop, so ordering
  between input and feedback elements is unspecified — same as Flink,
  which documents no ordering guarantee across the feedback edge.

Scale note: the feedback channel is storage-backed, so iteration state
never accumulates in executor memory; each pass is an ordinary
micro-batch over only the NEW elements (input deltas + last pass's
feedback), not the full history.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class _IterationBase:
    """Shared mechanics of both iteration scopes: workdir layout, the
    feedback-segment counter, the drain loop (no-new-feedback
    termination with a max_passes bound), the empty-write-skipping
    foreachBatch sink, and the final output read. Subclasses supply
    only the head-stream construction and the step adapter."""

    def __init__(self, spark: SparkSession, workdir: str, output_schema: str):
        self.spark = spark
        self.output_schema = output_schema
        self.feedback_dir = os.path.join(workdir, "feedback")
        self.output_dir = os.path.join(workdir, "output")
        self.checkpoint_dir = os.path.join(workdir, "checkpoint")
        os.makedirs(self.feedback_dir, exist_ok=True)
        os.makedirs(self.output_dir, exist_ok=True)

    def _feedback_segments(self) -> int:
        return sum(
            1 for f in os.listdir(self.feedback_dir) if f.endswith(".parquet")
        )

    def _sink(self, fb: DataFrame, out: DataFrame) -> None:
        # feedback first: rows become available input for the next
        # micro-batch of this same query. Empty writes are skipped — an
        # empty parquet segment would still count as channel activity
        # and keep the drain loop spinning.
        if not fb.isEmpty():
            fb.write.mode("append").parquet(self.feedback_dir)
        if not out.isEmpty():
            out.write.mode("append").parquet(self.output_dir)

    def _drain(self, head: DataFrame, body, max_passes: int) -> DataFrame:
        q = (
            head.writeStream.foreachBatch(body)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )
        try:
            # drain: a pass that adds no feedback segments means no
            # element chose the iterate channel — the stream is dry
            for _ in range(max_passes):
                before = self._feedback_segments()
                q.processAllAvailable()
                if self._feedback_segments() == before:
                    break
            else:
                raise RuntimeError(
                    f"stream iteration did not converge in {max_passes} passes"
                )
        finally:
            q.stop()
        out_files = [
            f for f in os.listdir(self.output_dir) if f.endswith(".parquet")
        ]
        if not out_files:
            return self.spark.createDataFrame([], self.output_schema)
        return self.spark.read.schema(self.output_schema).parquet(
            self.output_dir
        )


class StreamIteration(_IterationBase):
    """One iteration scope: holds the feedback/output directories and
    the drain loop. ``step(df) -> (feedback_df, output_df)`` plays the
    role of the Step map + OutputSelector split in IterateExample."""

    def __init__(self, spark: SparkSession, schema: str, workdir: str,
                 output_schema: str | None = None):
        super().__init__(spark, workdir, output_schema or schema)
        self.schema = schema

    def run(
        self,
        source: DataFrame,
        step: Callable[[DataFrame], tuple[DataFrame, DataFrame]],
        max_passes: int = 100,
    ) -> DataFrame:
        """Run the iteration until the feedback channel runs dry
        (IterativeStream's no-new-data termination), then return the
        accumulated output as a batch DataFrame. ``source`` is a
        STREAMING DataFrame with ``schema``; ``max_passes`` bounds
        runaway feedback loops (a diverging step function)."""
        feedback = self.spark.readStream.schema(self.schema).parquet(
            self.feedback_dir
        )
        head = source.unionByName(feedback)

        def body(batch_df: DataFrame, epoch_id: int) -> None:
            fb, out = step(batch_df)
            self._sink(fb, out)

        return self._drain(head, body, max_passes)


class ConnectedStreamIteration(_IterationBase):
    """``iterate().withFeedbackType(T)`` (``DataStream.java:579`` →
    ``ConnectedIterativeStreams``, IterativeStream.java): the feedback
    edge carries a DIFFERENT type than the input, and the step operator
    is a co-function over (input-type, feedback-type) — Flink hands it
    a ConnectedStreams to CoMap/CoProcess over.

    Micro-batch analog of the co-stream: the head is a TAGGED UNION of
    the input stream and the feedback file stream (each side
    null-padded to the superset schema, discriminated by ``_side``),
    the same encoding the batch coGroup and the temporal join use. The
    step receives the two sides already split back out —
    ``step(input_df, feedback_df) -> (feedback_df, output_df)`` — so a
    user ports a CoFlatMapFunction body 1:1 (flatMap1 = the input leg,
    flatMap2 = the feedback leg). Termination, storage-backed feedback,
    and the no-ordering caveat are identical to ``StreamIteration``.
    """

    def __init__(
        self,
        spark: SparkSession,
        input_schema: str,
        feedback_schema: str,
        workdir: str,
        output_schema: str | None = None,
    ):
        super().__init__(spark, workdir, output_schema or feedback_schema)
        self.input_schema = input_schema
        self.feedback_schema = feedback_schema

    def run(
        self,
        source: DataFrame,
        step: Callable[[DataFrame, DataFrame], tuple[DataFrame, DataFrame]],
        max_passes: int = 100,
    ) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        in_struct = StructType.fromDDL(self.input_schema)
        fb_struct = StructType.fromDDL(self.feedback_schema)
        overlap = {f.name for f in in_struct} & {f.name for f in fb_struct}
        if overlap:
            raise ValueError(
                f"input/feedback field names must be disjoint for the "
                f"tagged union (rename one side): {sorted(overlap)}"
            )

        feedback = self.spark.readStream.schema(self.feedback_schema).parquet(
            self.feedback_dir
        )
        pad_in = source.select(
            F.lit("in").alias("_side"),
            *[F.col(f.name) for f in in_struct],
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in fb_struct],
        )
        pad_fb = feedback.select(
            F.lit("fb").alias("_side"),
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in in_struct],
            *[F.col(f.name) for f in fb_struct],
        )
        head = pad_in.unionByName(pad_fb)

        def body(batch_df: DataFrame, epoch_id: int) -> None:
            in_df = batch_df.filter(F.col("_side") == "in").select(
                *[f.name for f in in_struct]
            )
            fb_df = batch_df.filter(F.col("_side") == "fb").select(
                *[f.name for f in fb_struct]
            )
            fb_out, out = step(in_df, fb_df)
            self._sink(fb_out, out)

        return self._drain(head, body, max_passes)
