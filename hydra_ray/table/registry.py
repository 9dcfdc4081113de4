"""Schema registry client: TTL-cached lookups behind a circuit breaker.

Reference parity (T6, `core/.../akka/SchemaRegistryActor.scala:32-190`;
retry/compat semantics `avro/.../registry/SchemaRegistry.scala:118-157,
211-213, 253-274`; TTL memo-cache `services/IngestionFlowV2.scala:46-51`):

- subjects are ``{topic}-key`` / ``{topic}-value``; registration enforces
  the same compatibility rules as ``lancelite.Table.check_schema`` (type
  changes and non-nullable adds rejected, nullable adds evolve), plus the
  key-subject rule: key schemas may NEVER evolve
  (`SchemaRegistry.scala:118-129`);
- ``get`` memoizes with a TTL (default 180 s, the v2 flow's cache);
- the backing store is pluggable (a callable for fetch, a dict-backed
  default) and every fetch goes through a CIRCUIT BREAKER: after
  ``failure_threshold`` consecutive errors the breaker opens for
  ``reset_timeout_s`` (calls fail fast with ``CircuitOpenError``), then a
  half-open probe decides close vs re-open — the Akka breaker semantics.

In the engine, an instance lives in an actor's ``__init__`` (one per
worker, like the reference's per-JVM cache) — see ``stages/decode.py``
for the actor-state pattern.  Time is injected for deterministic tests.
"""

from __future__ import annotations

import re
import time
from typing import Any, Callable

import pyarrow as pa

__all__ = ["CircuitOpenError", "InvalidTopicName", "SchemaRegistry",
           "TagsException", "TagsView", "TopicCatalog", "check_compatible",
           "valid_topic_name", "validate_topic_name"]


class CircuitOpenError(RuntimeError):
    """Fetch rejected fast: the breaker is open after repeated failures."""


# ----------------------------------------------------------- topic grammar
# Reference parity (`ingestors/kafka/.../model/TopicMetadataV2Transport.scala:
# 113-127`): topic names are `<org>.<segment>(.<segment>)*` where org is one
# of the allowed organizations (or `_`-prefixed alphanumeric), segments are
# alphanumeric with single internal hyphens, total length ≤ 249 (the broker
# limit minus changelog suffix headroom), full-match semantics (refined
# `MatchesRegex`).
TOPIC_ORGANIZATIONS = "cloud|skills|flow|tech|fin|dvs|_[a-zA-Z0-9]+"
_TOPIC_NAME_RE = re.compile(
    rf"(?=^.{{0,249}}$)(?:{TOPIC_ORGANIZATIONS})"
    r"(\.[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*)+$"
)


class InvalidTopicName(ValueError):
    """Topic name fails the grammar (reference ``Subject.invalidFormat``)."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(
            f"Invalid Topic Name {name!r}. Topic Name must start with a "
            f"prefix matching `{TOPIC_ORGANIZATIONS}`. It may contain only "
            "alphanumeric characters, hyphens(-) and periods(.) and must "
            "not contain consecutive special characters anywhere within "
            "the topic name."
        )


def valid_topic_name(name: str) -> bool:
    return bool(_TOPIC_NAME_RE.match(name or ""))


def validate_topic_name(name: str) -> str:
    """Return ``name`` or raise ``InvalidTopicName``."""
    if not valid_topic_name(name):
        raise InvalidTopicName(name)
    return name


def check_compatible(
    stored: pa.Schema, new: pa.Schema, allow_evolution: bool = True
) -> pa.Schema | None:
    """Shared compatibility kernel (same rules as lancelite commits,
    `SchemaRegistry.scala:134-157, 237-274` semantics): returns the
    evolved schema when nullable columns were added, None when unchanged,
    raises on incompatibility."""
    for f in stored:
        i = new.get_field_index(f.name)
        if i < 0:
            if not f.nullable:
                raise ValueError(f"non-nullable column {f.name!r} removed")
            continue
        nf = new.field(i)
        if nf.type != f.type:
            raise ValueError(
                f"incompatible evolution: column {f.name!r} type "
                f"{f.type} → {nf.type}"
            )
    added = [f for f in new if stored.get_field_index(f.name) < 0]
    if added and not allow_evolution:
        raise ValueError(
            f"schema may not evolve: new columns {[f.name for f in added]}"
        )
    for f in added:
        if not f.nullable:
            raise ValueError(
                f"incompatible evolution: new column {f.name!r} must be nullable"
            )
    return pa.schema(list(stored) + added) if added else None


class SchemaRegistry:
    def __init__(
        self,
        fetch: Callable[[str], pa.Schema] | None = None,
        ttl_s: float = 180.0,
        failure_threshold: int = 3,
        reset_timeout_s: float = 30.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._store: dict[str, pa.Schema] = {}
        # full version history per subject: FULL_TRANSITIVE compatibility
        # checks every registration against ALL prior versions, not just
        # the latest (`SchemaRegistry.scala:155-157` —
        # FULL_TRANSITIVE_CHECKER over getAllVersions, `:253-274`)
        self._versions: dict[str, list[pa.Schema]] = {}
        self._fetch = fetch if fetch is not None else self._store.__getitem__
        self._ttl = ttl_s
        self._cache: dict[str, tuple[float, pa.Schema]] = {}
        self._clock = clock
        # breaker state
        self._failures = 0
        self._threshold = failure_threshold
        self._reset_s = reset_timeout_s
        self._opened_at: float | None = None

    # ------------------------------------------------------------- register
    def register(self, subject: str, schema: pa.Schema) -> pa.Schema:
        """Register/evolve a subject.  Key subjects (``*-key``) may never
        change; value subjects must be FULL_TRANSITIVE-compatible: the
        new schema is checked against EVERY prior version, so e.g.
        re-adding a column that an old version held at a different type
        is rejected even though the latest version would accept it."""
        history = self._versions.setdefault(subject, [])
        cur = self._store.get(subject)
        if cur is not None:
            if subject.endswith("-key"):
                if not cur.equals(schema):
                    raise ValueError(
                        f"key schema for {subject!r} may not evolve"
                    )
            else:
                for old in history:  # transitive: all versions must pass
                    check_compatible(old, schema)
                evolved = check_compatible(cur, schema)
                stored = evolved if evolved is not None else cur
                # history holds AS-REGISTERED versions (the reference's
                # getAllVersions), while the served schema is the evolved
                # union (lancelite read-schema semantics)
                if not any(v.equals(schema) for v in history):
                    history.append(schema)
                self._store[subject] = stored
                self._cache.pop(subject, None)
                return stored
        self._store[subject] = schema
        if not history or not history[-1].equals(schema):
            history.append(schema)
        self._cache.pop(subject, None)
        return schema

    # ----------------------------------------------------------------- get
    def get(self, subject: str) -> pa.Schema:
        now = self._clock()
        hit = self._cache.get(subject)
        if hit is not None and now - hit[0] < self._ttl:
            return hit[1]
        schema = self._guarded_fetch(subject)
        self._cache[subject] = (now, schema)
        return schema

    def _guarded_fetch(self, subject: str) -> pa.Schema:
        now = self._clock()
        if self._opened_at is not None:
            if now - self._opened_at < self._reset_s:
                raise CircuitOpenError(
                    f"registry breaker open ({self._failures} consecutive failures)"
                )
            # half-open: allow exactly this probe through
        try:
            schema = self._fetch(subject)
        except CircuitOpenError:
            raise
        except Exception:
            self._failures += 1
            if self._failures >= self._threshold:
                self._opened_at = now
            raise
        self._failures = 0
        self._opened_at = None
        return schema

    # -------------------------------------------------------------- breaker
    @property
    def breaker_open(self) -> bool:
        return (
            self._opened_at is not None
            and self._clock() - self._opened_at < self._reset_s
        )


class TopicCatalog:
    """TTL-cached topic-existence lookups (T5).

    Reference parity (`ingestors/kafka/.../ingestors/KafkaTopicsActor.scala`):
    the v1 ingestor asks "does this topic exist?" before publishing; the
    actor holds the broker's topic list, refreshes it on a TTL, and keeps
    serving the LAST KNOWN list when a refresh fails (stale-over-outage —
    the actor's state survives a failed poll).

    ``fetch`` returns the current topic collection (the broker metadata
    call in the reference; a lancelite catalog listing here).  Time is
    injected for deterministic tests, same convention as SchemaRegistry.
    """

    def __init__(
        self,
        fetch: Callable[[], Any],
        ttl_s: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._fetch = fetch
        self._ttl = ttl_s
        self._clock = clock
        self._topics: frozenset[str] | None = None
        self._fetched_at: float = -float("inf")

    def _refresh_if_stale(self) -> None:
        now = self._clock()
        if self._topics is not None and now - self._fetched_at < self._ttl:
            return
        try:
            self._topics = frozenset(self._fetch())
            self._fetched_at = now
        except Exception:
            if self._topics is None:  # no stale state to fall back on
                raise
            # serve stale; retry at next call past the TTL
            self._fetched_at = now

    def exists(self, topic: str) -> bool:
        self._refresh_if_stale()
        return topic in (self._topics or ())

    def topics(self) -> frozenset[str]:
        self._refresh_if_stale()
        return self._topics or frozenset()


class TagsException(RuntimeError):
    """One or more requested tags is not in the catalog; carries the
    acceptable list (reference ``TagsAlgebra.TagsException``,
    `ingestors/kafka/.../algebras/TagsAlgebra.scala:62-63`)."""

    def __init__(self, acceptable: list[tuple[str, str]]):
        self.acceptable = acceptable
        listing = "\n".join(f"{n}: {d}" for n, d in acceptable)
        super().__init__(
            "One or more of the tags provided is invalid. "
            f"Here is a list of acceptable tags:\n{listing}"
        )


class TagsView:
    """Compacted tags view (T7, `TagsAlgebra.scala:58-141`).

    The reference consumes a compacted tags topic into an in-memory
    name → description map: a value upserts (`:82`), a null value
    (tombstone) removes (`:84`), malformed records are skipped
    (`consumeSafelyMessages` keeps only Rights, `:72-74`), and the map
    seeds with the ``DVS`` tag (`TagsStorageFacade.empty:140`).  Here the
    "topic" is a keyed lancelite table — upsert/delete_by_key are the
    publishes, ``read_compacted`` is the consumer — and the in-memory map
    is a TTL memo over it (same read-through convention as
    ``TopicCatalog``; the reference's map is push-updated by a long-lived
    stream, which a query-side view replaces with a bounded-staleness
    read).  ``validate_tags`` raises ``TagsException`` listing the
    acceptable tags when any requested tag is unknown (`:111-119`).
    """

    SEED = ("DVS", "Created by the DVS")

    def __init__(
        self,
        root: str,
        ttl_s: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        from . import lancelite

        schema = pa.schema(
            [
                pa.field("name", pa.string(), nullable=False),
                pa.field("description", pa.string()),
            ]
        )
        fresh = not lancelite.Table.exists(root)
        self._table = lancelite.Table.create(root, schema=schema, key=["name"])
        if fresh:
            self._table.upsert(
                pa.table({"name": [self.SEED[0]], "description": [self.SEED[1]]})
            )
        self._ttl = ttl_s
        self._clock = clock
        self._cache: dict[str, str] | None = None
        self._fetched_at = -float("inf")

    def _map(self) -> dict[str, str]:
        now = self._clock()
        if self._cache is not None and now - self._fetched_at < self._ttl:
            return self._cache
        t = self._table.read_compacted()
        names = t["name"].to_pylist()
        descs = t["description"].to_pylist()
        # skip malformed rows (null description = undecodable value; the
        # reference drops Left records rather than poisoning the view)
        self._cache = {n: d for n, d in zip(names, descs) if d is not None}
        self._fetched_at = now
        return self._cache

    def create_or_update(self, name: str, description: str) -> int:
        version = self._table.upsert(
            pa.table({"name": [name], "description": [description]})
        )
        self._cache = None
        return version

    def remove(self, name: str) -> int:
        version = self._table.delete_by_key(pa.table({"name": [name]}))
        self._cache = None
        return version

    def all_tags(self) -> list[tuple[str, str]]:
        return sorted(self._map().items())

    def validate_tags(self, tags: list[str]) -> None:
        m = self._map()
        if not all(t in m for t in tags):
            raise TagsException(self.all_tags())
