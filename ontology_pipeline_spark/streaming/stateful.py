"""Custom stateful streaming operator: first-crossing entity alerts.

Semantics Spark's built-ins don't express: emit one row the FIRST time an
entity's cumulative mention count (across all triggers, i.e. across the whole
stream's lifetime) reaches a threshold.  A windowed/update-mode aggregation
re-emits on every change and forgets across watermark expiry;
`dropDuplicates` dedups rows, not a crossing condition over evolving state.
So this is the `applyInPandasWithState` case: per-key state = (cumulative
count, already-alerted flag), kept in the state store, exactly-once with the
query checkpoint.

Scale shape: state is one tiny row per (entity_class, canonical) — bounded by
the ontology lexicon size, not the page stream — so the state store stays
KB-sized even at web scale; the shuffle is the same groupBy key the batch
entity aggregation (A1) uses.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERTS_SCHEMA = "entity_class string, canonical string, cumulative long"
_STATE_SCHEMA = "cnt long, alerted boolean"


def entity_threshold_alerts(mentions: DataFrame, threshold: int = 3) -> DataFrame:
    """mention stream (… entity_class, canonical …) -> alert rows
    (entity_class, canonical, cumulative) emitted once per entity, at the
    trigger where its lifetime mention count first reaches `threshold`."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        entity_class, canonical = key
        cnt, alerted = state.get if state.exists else (0, False)
        cnt += sum(len(p) for p in pdfs)
        out: list[tuple[Any, ...]] = []
        if not alerted and cnt >= threshold:
            alerted = True
            out.append((entity_class, canonical, cnt))
        state.update((cnt, alerted))
        if out:
            yield pd.DataFrame(
                out, columns=["entity_class", "canonical", "cumulative"]
            )

    return (
        mentions.select("entity_class", "canonical")
        .groupBy("entity_class", "canonical")
        .applyInPandasWithState(
            fn,
            outputStructType=ALERTS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
