from .table import LakeTable, CommitConflict  # noqa: F401
