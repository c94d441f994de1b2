from .table import TranscriptTable  # noqa: F401
