from .pipeline import EventDrivenPipeline, streaming_windowed_kpis

__all__ = ["EventDrivenPipeline", "streaming_windowed_kpis"]
