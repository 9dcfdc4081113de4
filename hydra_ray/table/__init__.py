from .lancelite import Table, FragmentMeta  # noqa: F401
