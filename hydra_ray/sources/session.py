"""Interactive ingest-session source (the S3 WebSocket command protocol).

Driver-side rebuild of the reference's per-session ingest FSM
(`ingest/src/main/scala/hydra.ingest/services/IngestionSocketActor.scala:37-141`,
session request building `:151-187`, command grammar `:145-149`):

- ``-c set``            → report current session metadata
- ``-c set K=V``        → set metadata (keys uppercased; the ack-strategy
                          key is validated specially, invalid → 400)
- ``-c help``           → usage line
- ``-c <anything else>``→ 400 BAD_REQUEST
- ``-i <cid> <payload>``/ bare payload → build a request from the session
  metadata (validation default Strict, ack default NoAck) and hand it to
  the pluggable handler — in this engine the handler typically appends
  to a lancelite table feeding the micro-batch epochs.

There is no actual WebSocket here (no server in the engine core, SURVEY
§7.5): the FSM + grammar + request semantics are the data-plane essence,
and ``feed`` drives them from any transport (CLI loop, test, socket).
"""

from __future__ import annotations

import re
from typing import Any, Callable

__all__ = ["AckStrategy", "ValidationStrategy", "IngestSession"]

# canonical metadata keys (RequestParams.scala:21-99)
HYDRA_ACK_STRATEGY = "HYDRA-ACK-STRATEGY"
HYDRA_VALIDATION_STRATEGY = "HYDRA-VALIDATION-STRATEGY"
HYDRA_CLIENT_ID = "HYDRA-CLIENT-ID"
HYDRA_KAFKA_TOPIC = "HYDRA-KAFKA-TOPIC"


class AckStrategy:
    NO_ACK = "NoAck"
    PERSISTED = "Persisted"
    REPLICATED = "Replicated"
    ALL = (NO_ACK, PERSISTED, REPLICATED)

    @classmethod
    def parse(cls, s: str) -> str:
        for a in cls.ALL:
            if s.strip().lower() == a.lower():
                return a
        raise ValueError(f"{s!r} is not a valid ack strategy")


class ValidationStrategy:
    STRICT = "Strict"
    RELAXED = "Relaxed"


_HELP = re.compile(r"(?i)-c\s+help\s*$")
_SET = re.compile(r"(?i)-c\s+set(?:[ \t]*(.*?)=(.*))?\s*$")
_CMD = re.compile(r"^\s*-c\b")
_INGEST = re.compile(r"^(?:-i\s+(\w+)\s+)?(.*)$", re.S)


class IngestSession:
    """One ingest session: metadata state + command dispatch.

    ``handler(request: dict)`` receives each built request; responses are
    ``(status_code, message)`` pairs mirroring SimpleOutgoingMessage.
    """

    def __init__(
        self,
        handler: Callable[[dict], Any] | None = None,
        catalog: Any | None = None,
        validate_topic: bool = False,
    ):
        """``catalog`` (a ``table.registry.TopicCatalog``) gates ingest on
        topic existence like the v1 ingestor's KafkaTopicsActor lookup:
        a request targeting an unknown topic is rejected 404 before the
        handler runs.  ``validate_topic`` additionally enforces the topic
        NAME GRAMMAR at SET time (the V2 metadata-request rule,
        `TopicMetadataV2Transport.scala:113-127` — org prefix, alnum
        segments, single hyphens, ≤ 249 chars): a malformed name is
        rejected 400 before it ever reaches the catalog."""
        self.metadata: dict[str, str] = {}
        self.handler = handler or (lambda req: None)
        self.catalog = catalog
        self.validate_topic = validate_topic

    # ------------------------------------------------------------ commands
    def process(self, line: str) -> tuple[int, str]:
        if _CMD.match(line):
            if _HELP.match(line.strip()):
                return 200, "Set metadata: --set (name)=(value)"
            m = _SET.match(line.strip())
            if m:
                key, value = m.group(1), m.group(2)
                if key is None:
                    listing = ";".join(
                        f"{k}={v}" for k, v in sorted(self.metadata.items())
                    )
                    return 200, listing
                the_key = key.upper().strip()
                the_value = value.strip()
                if the_key == HYDRA_KAFKA_TOPIC and self.validate_topic:
                    from ..table.registry import valid_topic_name

                    if not valid_topic_name(the_value):
                        return 400, (
                            f"BAD REQUEST[{HYDRA_KAFKA_TOPIC}={the_value}] "
                            "Invalid Topic Name. Topic Name must start "
                            "with a valid organization prefix and may "
                            "contain only alphanumeric characters, "
                            "hyphens(-) and periods(.)."
                        )
                if the_key == HYDRA_ACK_STRATEGY:
                    try:
                        the_value = AckStrategy.parse(the_value)
                    except ValueError:
                        return 400, (
                            f"BAD REQUEST[{HYDRA_ACK_STRATEGY}={value.strip()}] "
                            "is not a valid ack strategy."
                        )
                self.metadata[the_key] = the_value
                return 200, f"OK[{the_key}={the_value}]"
            return 400, "BAD_REQUEST:Not a valid message. Use 'HELP' for help."
        m = _INGEST.match(line)
        cid, payload = m.group(1), m.group(2)
        return self._ingest(cid, payload)

    def _ingest(self, correlation_id: str | None, payload: str) -> tuple[int, str]:
        topic = self.metadata.get(HYDRA_KAFKA_TOPIC)
        if self.catalog is not None and topic and not self.catalog.exists(topic):
            return 404, f"UNKNOWN_TOPIC[{topic}]"
        req = {
            "correlation_id": correlation_id or "0",
            "payload": payload,
            "client_id": next(
                (
                    v.lower()
                    for k, v in self.metadata.items()
                    if k.upper() == HYDRA_CLIENT_ID
                ),
                None,
            ),
            "metadata": dict(self.metadata),
            "validation": self.metadata.get(
                HYDRA_VALIDATION_STRATEGY, ValidationStrategy.STRICT
            ),
            "ack": self.metadata.get(HYDRA_ACK_STRATEGY, AckStrategy.NO_ACK),
        }
        self.handler(req)
        return 200, f"OK[{req['correlation_id']}]"

    def feed(self, lines) -> list[tuple[int, str]]:
        """Drive a sequence of protocol lines; returns all responses."""
        return [self.process(ln) for ln in lines]
