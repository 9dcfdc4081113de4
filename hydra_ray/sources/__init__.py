from .session import AckStrategy, IngestSession  # noqa: F401
