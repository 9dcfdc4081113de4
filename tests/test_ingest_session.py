"""S3 ingest-session FSM: command grammar, metadata state, request build
(mirrors IngestionSocketActorSpec behaviors)."""

from hydra_ray.sources import IngestSession


def test_set_and_list_metadata():
    s = IngestSession()
    code, msg = s.process("-c SET hydra-kafka-topic=test.Topic")
    assert code == 200 and msg == "OK[HYDRA-KAFKA-TOPIC=test.Topic]"
    code, msg = s.process("-c set")
    assert code == 200 and "HYDRA-KAFKA-TOPIC=test.Topic" in msg


def test_ack_strategy_validation():
    s = IngestSession()
    code, msg = s.process("-c set hydra-ack-strategy=replicated")
    assert code == 200 and "Replicated" in msg
    code, msg = s.process("-c set hydra-ack-strategy=invalid-strategy")
    assert code == 400 and "not a valid ack strategy" in msg


def test_help_and_bad_command():
    s = IngestSession()
    assert s.process("-c help")[0] == 200
    code, msg = s.process("-c whatever")
    assert code == 400 and "BAD_REQUEST" in msg


def test_ingest_builds_request_from_session():
    got = []
    s = IngestSession(handler=got.append)
    s.process("-c set hydra-kafka-topic=t1")
    s.process("-c set hydra-client-id=TestClient")
    s.process("-c set hydra-ack-strategy=persisted")
    code, msg = s.process("-i abc123 {\"k\": 1}")
    assert code == 200 and msg == "OK[abc123]"
    code, msg = s.process("{\"k\": 2}")        # bare payload, correlation 0
    assert code == 200 and msg == "OK[0]"
    assert len(got) == 2
    r = got[0]
    assert r["correlation_id"] == "abc123"
    assert r["payload"] == '{"k": 1}'
    assert r["client_id"] == "testclient"       # lowercased like the reference
    assert r["ack"] == "Persisted"
    assert r["validation"] == "Strict"          # default
    assert r["metadata"]["HYDRA-KAFKA-TOPIC"] == "t1"
    assert got[1]["correlation_id"] == "0"


def test_session_feeds_a_table(tmp_path):
    """The session handler is how interactive ingest lands in a lancelite
    source table feeding micro-batch epochs."""
    import pyarrow as pa

    from hydra_ray.table import Table

    schema = pa.schema([("correlation_id", pa.string()), ("payload", pa.string())])
    t = Table.create(str(tmp_path / "src"), schema=schema)
    s = IngestSession(
        handler=lambda r: t.append(
            pa.table({"correlation_id": [r["correlation_id"]],
                      "payload": [r["payload"]]}, schema=schema)
        )
    )
    s.feed(["-i a one", "-i b two", "three"])
    got = t.to_arrow()
    assert got.num_rows == 3
    assert got["correlation_id"].to_pylist() == ["a", "b", "0"]
