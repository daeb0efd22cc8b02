"""Physical-layout plans: the MergeTree analog (partitioned + sorted
Parquet) and compaction."""
