"""Tags view (T7): a compacted tags table + request validation.

Reference parity (`ingest/.../algebras/TagsAlgebra.scala:59-141`): tags
live in a compacted topic keyed by tag name (create-or-update = keyed
upsert, delete = tombstone), `getAllTags` reads the compacted snapshot,
and `validateTags` rejects any requested tag not in the registered set.

Built on the same machinery as the T2 metadata view: a lancelite table
with a declared key, merge-on-read compaction (`Table.read_compacted`).
The view is a plain table, so a long-running deployment can hold the
snapshot in an actor's ``__init__`` and refresh per epoch — the same
worker-state pattern as the schema cache (T1/T6).
"""

from __future__ import annotations

import pyarrow as pa

from .lancelite import Table

__all__ = ["TagsView", "UnknownTagError"]

_SCHEMA = pa.schema(
    [
        pa.field("name", pa.string(), nullable=False),
        pa.field("description", pa.string()),
    ]
)


class UnknownTagError(ValueError):
    """A requested tag is not registered (TagsAlgebra.scala:120-135)."""


class TagsView:
    def __init__(self, root: str):
        self.table = Table.create(root, schema=_SCHEMA, key=["name"])

    def create_or_update(self, name: str, description: str = "") -> int:
        """Keyed upsert — last write wins on compaction."""
        return self.table.upsert(
            pa.table({"name": [name], "description": [description]}, schema=_SCHEMA)
        )

    def delete(self, name: str) -> int:
        """Tombstone the tag; compaction drops it."""
        return self.table.delete_by_key(pa.table({"name": [name]}))

    def all_tags(self) -> pa.Table:
        """Compacted snapshot (reference ``getAllTags``)."""
        return self.table.read_compacted()

    def validate(self, requested: list[str]) -> None:
        """Reject unknown tags (reference ``validateTags``)."""
        known = set(self.all_tags()["name"].to_pylist())
        bad = [t for t in requested if t not in known]
        if bad:
            raise UnknownTagError(
                f"unknown tags {bad}; registered: {sorted(known)}"
            )
