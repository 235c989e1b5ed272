from .harness import BenchmarkRecorder, StageRecord, max_rss_kb, run_pipeline_benchmark

__all__ = ["BenchmarkRecorder", "StageRecord", "max_rss_kb", "run_pipeline_benchmark"]
