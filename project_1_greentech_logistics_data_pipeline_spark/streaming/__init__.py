from .jobs import run_stream_pipeline, sessionized_counts, windowed_event_counts

__all__ = ["run_stream_pipeline", "windowed_event_counts", "sessionized_counts"]
