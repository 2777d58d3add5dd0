"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch graft of the dedup semantics of Qwant/addresses-importer
(/root/reference, Apache-2.0) onto an audio clip + transcript corpus:
MinHash-over-shingles LSH (transcripts), SimHash on log-mel fingerprints
(acoustic), bottom-k shingle sketch + exact substring verify (suffix
containment), large-star/small-star connected components, deterministic
rank-based survivor selection, checkpoint/resume, skew caps.
"""

from .config import DEFAULT_CONFIG, DedupConfig
from .plans.pipeline import PipelineResult, run_pipeline
from .session import get_spark
from .sources.clips import export_survivors_csv, read_clips
from .streaming.dedup_probe import (
    prepare_probe_index, probe_edges, start_dedup_probe,
)

#: The frozen public surface (README "Run the pipeline on your own
#: parquet" + "Probe a stream of new clips"): everything a user needs
#: without reaching into submodules.
__all__ = [
    "DEFAULT_CONFIG",
    "DedupConfig",
    "PipelineResult",
    "export_survivors_csv",
    "get_spark",
    "prepare_probe_index",
    "probe_edges",
    "read_clips",
    "run_pipeline",
    "start_dedup_probe",
]
__version__ = "0.1.0"
