"""spark-cdc-transcripts: a from-scratch PySpark-native CDC / incremental-ingest
engine with the data-processing capabilities of qubic/go-data-publisher.

Design (see SURVEY.md for the operator inventory and the reference mapping):

- a binlog/WAL-shaped change stream of I/U/D events keyed by (conv_id, turn_idx)
  and ordered by a global LSN (the reference's tick/offset) is tailed by
  Structured Streaming,
- each microbatch is deduplicated per key (last-wins by LSN, skew-aware),
- then MERGE-upserted idempotently into a partitioned lake table with an
  atomic manifest commit and an epoch_id replay guard (exactly-once-in-effect,
  the reference's offsets-committed-after-bulk-index protocol),
- with per-partition lineage manifests and per-microbatch metrics.

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
