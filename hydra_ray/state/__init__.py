from .store import PartitionState, PartitionStateActor, WATERMARK_MAX  # noqa: F401
