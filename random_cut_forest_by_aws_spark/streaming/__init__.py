from .drift_stream import streaming_drift_scores  # noqa: F401
