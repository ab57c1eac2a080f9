"""Custom stateful streaming operator (applyInPandasWithState): first-crossing
entity alerts, exactly-once across triggers via the query checkpoint."""

from __future__ import annotations

import datetime
import os

from ontology_pipeline_spark.lexicon import lexicon_rows
from ontology_pipeline_spark.operators.mentions import detect_mentions
from ontology_pipeline_spark.schemas import PAGES
from ontology_pipeline_spark.streaming.stateful import entity_threshold_alerts
from ontology_pipeline_spark.streaming.stream import read_page_stream

_TS = datetime.datetime(2026, 1, 1)


def _row(url: str, text: str):
    return (url, _TS, None, text, "en")


def _drain(spark, src, sink, ckpt):
    alerts = entity_threshold_alerts(
        detect_mentions(read_page_stream(spark, src), lexicon_rows()), threshold=3
    )
    q = (
        alerts.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_first_crossing_alerts_fire_once(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    half1 = [
        _row("a", "Sleep Quality. Sleep Quality."),          # 2 mentions (< 3)
        _row("b", "Oura Ring. Oura Ring. Oura Ring."),       # 3 mentions -> alert
    ]
    spark.createDataFrame(half1, schema=PAGES).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, sink, ckpt)
    got1 = {(r["entity_class"], r["canonical"], r["cumulative"]) for r in spark.read.parquet(sink).collect()}
    assert got1 == {("technology", "Oura Ring", 3)}

    # second trigger: Sleep Quality crosses now; Oura Ring must NOT re-alert
    half2 = [_row("c", "Sleep Quality. Oura Ring.")]
    spark.createDataFrame(half2, schema=PAGES).coalesce(1).write.mode("append").parquet(src)
    _drain(spark, src, sink, ckpt)
    got2 = {(r["entity_class"], r["canonical"], r["cumulative"]) for r in spark.read.parquet(sink).collect()}
    assert got2 == {
        ("technology", "Oura Ring", 3),
        ("construct", "Sleep Quality", 3),
    }
