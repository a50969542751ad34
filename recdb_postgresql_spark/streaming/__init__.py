from recdb_postgresql_spark.streaming.ingest import (StreamingIndexDeduper,
                                                     StreamingMerger,
                                                     StreamingNearDupDeduper,
                                                     StreamingSpanScrubber)
from recdb_postgresql_spark.streaming.maintenance import StreamingMaintainer
from recdb_postgresql_spark.streaming.rollup import (count_milestones,
                                                     dedup_stream,
                                                     hourly_rollup,
                                                     sessionize,
                                                     trending_items)

__all__ = ["StreamingMaintainer", "StreamingIndexDeduper",
           "StreamingMerger", "StreamingNearDupDeduper",
           "StreamingSpanScrubber", "hourly_rollup",
           "sessionize", "count_milestones", "dedup_stream",
           "trending_items"]
