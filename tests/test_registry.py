"""Schema registry client: TTL cache, compat rules, circuit breaker (T6)."""

import pyarrow as pa
import pytest

from hydra_ray.stages.validate import fill_defaults
from hydra_ray.table.registry import CircuitOpenError, SchemaRegistry


def _s(**fields):
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


def test_register_and_evolve_value_subject():
    r = SchemaRegistry()
    s1 = _s(a=pa.int64())
    r.register("t-value", s1)
    s2 = pa.schema(list(s1) + [pa.field("b", pa.string())])
    r.register("t-value", s2)
    assert r.get("t-value").names == ["a", "b"]
    with pytest.raises(ValueError, match="incompatible"):
        r.register("t-value", _s(a=pa.string()))


def test_key_subject_never_evolves():
    r = SchemaRegistry()
    r.register("t-key", _s(k=pa.int64()))
    with pytest.raises(ValueError, match="may not evolve"):
        r.register("t-key", _s(k=pa.int64(), extra=pa.string()))


def test_ttl_cache_and_breaker():
    clock = [0.0]
    calls = []

    def fetch(subject):
        calls.append(subject)
        if subject == "bad-value" and calls.count("bad-value") <= 4:
            raise ConnectionError("registry down")
        return _s(a=pa.int64())

    r = SchemaRegistry(fetch=fetch, ttl_s=10, failure_threshold=3,
                       reset_timeout_s=30, clock=lambda: clock[0])
    # TTL: second get within ttl doesn't re-fetch
    r.get("ok-value")
    r.get("ok-value")
    assert calls.count("ok-value") == 1
    clock[0] += 11
    r.get("ok-value")
    assert calls.count("ok-value") == 2
    # breaker: 3 consecutive failures open it; then calls fail FAST
    for _ in range(3):
        with pytest.raises(ConnectionError):
            r.get("bad-value")
    assert r.breaker_open
    with pytest.raises(CircuitOpenError):
        r.get("bad-value")
    n_calls = len(calls)
    with pytest.raises(CircuitOpenError):
        r.get("bad-value")
    assert len(calls) == n_calls  # no fetch while open
    # half-open probe after the reset timeout; failure re-opens
    clock[0] += 31
    with pytest.raises(ConnectionError):
        r.get("bad-value")
    assert r.breaker_open
    # next probe succeeds (fetch recovers) and closes the breaker
    clock[0] += 31
    assert r.get("bad-value").names == ["a"]
    assert not r.breaker_open


def test_fill_defaults_normalizer():
    schema = pa.schema(
        [
            pa.field("a", pa.int64()),
            pa.field("b", pa.string(), metadata={b"default": b"unknown"}),
            pa.field("c", pa.float64()),
        ]
    )
    batch = pa.table({"a": pa.array([1, None]), "extra": pa.array(["x", "y"])})
    out = fill_defaults(batch, schema, defaults={"a": 0})
    assert out.column_names == ["a", "b", "c"]            # extra projected away
    assert out["a"].to_pylist() == [1, 0]                  # explicit default fills nulls
    assert out["b"].to_pylist() == ["unknown", "unknown"]  # metadata default
    assert out["c"].null_count == 2                        # nullable, no default

    req = pa.schema([pa.field("r", pa.int64(), nullable=False)])
    with pytest.raises(ValueError, match="required column"):
        fill_defaults(pa.table({"a": pa.array([1])}), req)


# ----------------------------------------------------------------- tags (T7)
def test_topic_catalog_ttl_stale_and_session_gate():
    from hydra_ray.table.registry import TopicCatalog
    from hydra_ray.sources.session import IngestSession

    clock = {"t": 0.0}
    calls = {"n": 0}
    topics = {"clips", "updates"}

    def fetch():
        calls["n"] += 1
        if calls["n"] == 3:
            raise ConnectionError("broker down")
        return set(topics)

    cat = TopicCatalog(fetch, ttl_s=60, clock=lambda: clock["t"])
    assert cat.exists("clips") and not cat.exists("nope")
    assert calls["n"] == 1  # within TTL: cached, no refetch
    clock["t"] = 61
    topics.add("late-topic")
    assert cat.exists("late-topic")  # TTL expiry refreshed the list
    assert calls["n"] == 2
    clock["t"] = 122  # third fetch fails → serve stale last-known list
    assert cat.exists("clips") and cat.exists("late-topic")
    assert calls["n"] == 3
    clock["t"] = 183  # recovery: next expiry refetches fine
    topics.discard("late-topic")
    assert not cat.exists("late-topic")

    # session gate: unknown topic rejected 404 before the handler runs
    seen = []
    s = IngestSession(handler=seen.append, catalog=cat)
    s.process("-c set hydra-kafka-topic=nope")
    code, msg = s.process("-i 7 payload-bytes")
    assert code == 404 and "nope" in msg and seen == []
    s.process("-c set hydra-kafka-topic=clips")
    code, _ = s.process("-i 7 payload-bytes")
    assert code == 200 and len(seen) == 1


def test_tags_view_compacted_semantics(tmp_path):
    """T7 tags view (TagsAlgebra.scala:58-141): seeded DVS tag, upsert
    overwrites, tombstone removes, validate raises with the acceptable
    list, TTL-bounded staleness with write-through invalidation."""
    import pytest

    from hydra_ray.table.registry import TagsException, TagsView

    clock = {"t": 0.0}
    v = TagsView(str(tmp_path / "tags"), ttl_s=60, clock=lambda: clock["t"])

    # facade seed (TagsStorageFacade.empty:140)
    assert v.all_tags() == [("DVS", "Created by the DVS")]
    v.validate_tags(["DVS"])  # no raise

    v.create_or_update("gold", "curated gold set")
    v.create_or_update("gold", "curated GOLD set")  # upsert overwrites
    v.create_or_update("raw", "unfiltered")
    assert dict(v.all_tags())["gold"] == "curated GOLD set"
    v.validate_tags(["DVS", "gold", "raw"])
    with pytest.raises(TagsException) as ei:
        v.validate_tags(["gold", "nope"])
    assert "acceptable tags" in str(ei.value) and "raw: unfiltered" in str(ei.value)

    # tombstone removes (TagsAlgebra.scala:83-84)
    v.remove("raw")
    assert "raw" not in dict(v.all_tags())
    with pytest.raises(TagsException):
        v.validate_tags(["raw"])

    # a second reader sees the same compacted state; its TTL memo serves
    # stale until expiry, then picks up new writes
    r = TagsView(str(tmp_path / "tags"), ttl_s=60, clock=lambda: clock["t"])
    assert dict(r.all_tags()) == {"DVS": "Created by the DVS",
                                  "gold": "curated GOLD set"}
    v.create_or_update("eval", "held-out eval")
    assert "eval" not in dict(r.all_tags())  # within TTL: memoized
    clock["t"] = 61
    assert dict(r.all_tags())["eval"] == "held-out eval"


def test_topic_name_grammar():
    """V2 topic-name grammar (TopicMetadataV2Transport.scala:113-127):
    org prefix, alnum segments, single hyphens/periods, length cap."""
    from hydra_ray.table.registry import (
        InvalidTopicName,
        valid_topic_name,
        validate_topic_name,
    )

    good = [
        "cloud.clips",
        "skills.audio-ingest.raw",
        "dvs.data-platform.v2",
        "_exp42.sandbox",
        "fin.a.b.c-d",
    ]
    for n in good:
        assert valid_topic_name(n), n
        assert validate_topic_name(n) == n
    bad = [
        "",                       # empty
        "clips",                  # no org / no segment
        "cloud",                  # org alone, no segment
        "other.clips",            # unknown org
        "cloud..clips",           # consecutive periods
        "cloud.clips-",           # trailing hyphen in segment
        "cloud.-clips",           # leading hyphen in segment
        "cloud.cli--ps",          # consecutive hyphens
        "cloud.clips!",           # illegal char
        "Cloud.clips",            # org is case-sensitive
        "cloud." + "x" * 250,     # over the 249 length cap
    ]
    for n in bad:
        assert not valid_topic_name(n), n
        import pytest

        with pytest.raises(InvalidTopicName):
            validate_topic_name(n)


def test_session_topic_grammar_gate():
    """IngestSession(validate_topic=True) rejects malformed names 400 at
    SET time, before any catalog lookup."""
    from hydra_ray.sources.session import IngestSession
    from hydra_ray.table.registry import TopicCatalog

    cat = TopicCatalog(lambda: ["cloud.clips"], ttl_s=60)
    s = IngestSession(catalog=cat, validate_topic=True)
    code, msg = s.process("-c set hydra-kafka-topic=bad..name")
    assert code == 400 and "Invalid Topic Name" in msg
    assert "HYDRA-KAFKA-TOPIC" not in s.metadata  # rejected before store
    code, _ = s.process("-c set hydra-kafka-topic=cloud.clips")
    assert code == 200
    code, _ = s.process("-i 1 payload")
    assert code == 200
    # well-formed but unknown topic: the 404 existence gate still applies
    code, _ = s.process("-c set hydra-kafka-topic=cloud.unknown")
    assert code == 200
    code, msg = s.process("-i 2 payload")
    assert code == 404 and "UNKNOWN_TOPIC" in msg


def test_full_transitive_compat():
    """FULL_TRANSITIVE (SchemaRegistry.scala:155-157, 253-274): a change
    compatible with the LATEST version but not an OLDER one is rejected."""
    import pyarrow as pa
    import pytest

    from hydra_ray.table.registry import SchemaRegistry

    reg = SchemaRegistry()
    v1 = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("x", pa.int64()),          # nullable → may be removed
    ])
    reg.register("t-value", v1)
    v2 = pa.schema([pa.field("id", pa.int64(), nullable=False)])
    reg.register("t-value", v2)             # nullable removal: fine
    # re-adding "x" at a DIFFERENT type is compatible with v2 (a plain
    # nullable add) but clashes with v1's int64 "x" — transitive check
    # must reject it
    v3_bad = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("x", pa.string()),
    ])
    with pytest.raises(ValueError, match="incompatible"):
        reg.register("t-value", v3_bad)
    # the transitive path is what catches it: v3_bad IS compatible with
    # the as-registered v2 (plain nullable add) but not with v1
    from hydra_ray.table.registry import check_compatible

    assert check_compatible(v2, v3_bad) is not None      # v2 alone: fine
    with pytest.raises(ValueError):
        check_compatible(v1, v3_bad)                     # v1: clash
    # history records AS-REGISTERED versions (getAllVersions semantics)
    assert [s.names for s in reg._versions["t-value"]] == [
        ["id", "x"], ["id"]]
    # re-adding it at the ORIGINAL type passes every version
    v3_ok = pa.schema([
        pa.field("id", pa.int64(), nullable=False),
        pa.field("x", pa.int64()),
    ])
    got = reg.register("t-value", v3_ok)
    assert got.field("x").type == pa.int64()
