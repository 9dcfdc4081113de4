"""hydra_ray — a Ray-Data-native structured-streaming / CEP engine.

A from-scratch rebuild of the data-plane capabilities of the reference
streaming platform (ps-dev/hydra, see SURVEY.md): receive → transform →
transport replication over tables of audio clip + transcript pairs,
expressed Ray-Data-first:

- micro-batched ingestion: each epoch is a ``ray.data.Dataset`` built from
  the delta of a versioned fragment table (``hydra_ray.table.lancelite``)
- vectorized transforms: ``map_batches(batch_format="pyarrow")`` over
  zero-copy Arrow (audio decode, validation, key extraction, projection)
- stateful operators: per-partition actor state stores implementing
  tumbling / sliding / session windows, event-time watermarks, a
  symmetric-hash stream-stream join, and keyed compaction (last-write-wins
  views with tombstones)
- an idempotent exactly-once sink: per-partition epoch ids + two-phase
  commit into the versioned table; replaying an epoch is a no-op
- resume-from-checkpoint with per-partition lineage + metrics

Nothing here imports from or depends on the reference implementation; the
reference is cited in docstrings (file:line) only to document behavioural
parity.
"""

__version__ = "0.1.0"
