"""Sequence training-example construction from event logs.

The dataset-builder step for sequence models: turn a raw event log into
(context, label) next-event prediction examples — per user, events in
time order, each example the previous ``_CTX`` event types joined as
the context string and the current event type as the label. The same
shape (sliding context window over an ordered partition) builds
next-token corpora from any sessionized log.

Plan shape: one window over (user_id, ordered by ts, event_id) carrying
both the ROW_NUMBER guard and the frame-ordered collect — a single
shuffle on user_id, no self-join (the naive formulation joins the log
to itself ``_CTX`` times). At 100 TB this shards by user; a power user
is one partition's window state, not a join explosion. Examples with a
partial context (the first ``_CTX`` events of each user) are excluded —
a padded variant is a mix-time policy, not a builder concern.

Cross-engine determinism: the window orders by (ts, event_id) — ts has
collisions, event_id is unique — and both engines' windowed collects
respect frame row order, so the context strings are bit-identical.

No reference counterpart — LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch

_CTX = 3  # context length (events)


def next_event_examples(events: DataFrame, ctx: int = _CTX) -> DataFrame:
    """(user_id, event_id, context, label) — ``context`` the space-joined
    previous ``ctx`` event types, ``label`` the current event type."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_id",
            F.concat_ws(
                " ",
                F.collect_list("event_type").over(w.rowsBetween(-ctx, -1)),
            ).alias("context"),
            F.col("event_type").alias("label"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") > ctx)
        .drop("rn")
        .orderBy("user_id", "event_id")
    )


_SEQ_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type,
         ROW_NUMBER() OVER w AS rn,
         string_agg(event_type, ' ')
           OVER (w ROWS BETWEEN {_CTX} PRECEDING AND 1 PRECEDING) AS context
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, context, event_type AS label
FROM ordered
WHERE rn > {_CTX}
ORDER BY user_id, event_id
"""


@query("train_next_event_examples", oracle=_SEQ_SQL, defer=True)
def train_next_event_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction examples from the events log: per-user
    3-event sliding contexts with the following event type as label."""
    return next_event_examples(tpch.load(spark, sf_dir, "events"))
