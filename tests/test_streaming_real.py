"""Real Structured Streaming maintenance: readStream over a parquet
directory -> foreachBatch(StreamingMaintainer.on_batch) with an
availableNow trigger — the production wiring of the R15 insert hook."""

import pytest

from recdb_postgresql_spark.engine import RecEngine
from recdb_postgresql_spark.streaming import StreamingMaintainer


def test_streaming_foreachbatch_retrain(spark, tmp_path):
    schema = "userid long, itemid long, ratingval double"
    base_rows = [(u, i, float(u + i)) for u in range(1, 5) for i in range(1, 5)]
    events = spark.createDataFrame(base_rows, schema)

    eng = RecEngine(spark, update_threshold=0.5)
    eng.create_recommender("stream1", events, "userid", "itemid",
                           "ratingval", "itemcoscf")
    maint = StreamingMaintainer(eng, "stream1", events,
                                "userid", "itemid", "ratingval")

    # drop 9 new events (> 0.5 * 16) into the watched directory
    stream_dir = tmp_path / "incoming"
    new = spark.createDataFrame([(9, i % 5 + 1, 1.0 * i) for i in range(9)], schema)
    new.write.parquet(str(stream_dir))

    q = (spark.readStream.schema(schema).parquet(str(stream_dir))
         .writeStream.foreachBatch(maint.on_batch)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    info = eng.catalog.get("stream1")
    assert info.update_counter == 0          # threshold hit -> retrained
    assert info.event_total == 16 + 9
    assert maint.retrain_count >= 1
    eng.drop_recommender("stream1")
