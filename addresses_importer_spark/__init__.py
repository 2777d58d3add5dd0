"""PySpark-native near-duplicate detection + clustering engine.

A from-scratch graft of the dedup semantics of Qwant/addresses-importer
(/root/reference, Apache-2.0) onto an audio clip + transcript corpus:
MinHash-over-shingles LSH (transcripts), SimHash on log-mel fingerprints
(acoustic), bottom-k shingle sketch + exact substring verify (suffix
containment), large-star/small-star connected components, deterministic
rank-based survivor selection, checkpoint/resume, skew caps.
"""

from .config import DEFAULT_CONFIG, DedupConfig

__all__ = ["DEFAULT_CONFIG", "DedupConfig"]
__version__ = "0.1.0"
