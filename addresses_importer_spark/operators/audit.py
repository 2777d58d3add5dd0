"""Per-row invariant audits (BASELINE.json `input_hint`):

1. payload passthrough — survivor rows carry byte-identical `bytes` and
   `transcript` vs the input table (the engine deduplicates, it never
   rewrites payloads);
2. acoustic-dup SNR — for every verified SimHash edge, the two decoded
   PCM streams are allclose at SNR >= threshold (the 30 dB boundary the
   fixtures plant their perturbations against).

Both are vectorized (join + expressions for 1; Arrow-batched pandas UDF
for 2 — the only place besides signature building that decodes audio).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType

from ..config import DedupConfig
from ..functions import audio as A


def audit_payload_passthrough(inputs: DataFrame, survivors: DataFrame) -> DataFrame:
    """Rows violating passthrough: survivor payload != input payload.
    Empty result == invariant holds. Join on clip_id; md5 comparison so
    no binary blob crosses the shuffle twice."""
    a = inputs.select(
        "clip_id",
        F.md5(F.col("bytes")).alias("in_bytes_md5"),
        F.md5(F.coalesce(F.col("transcript"), F.lit(""))).alias("in_tr_md5"),
    )
    b = survivors.select(
        "clip_id",
        F.md5(F.col("bytes")).alias("out_bytes_md5"),
        F.md5(F.coalesce(F.col("transcript"), F.lit(""))).alias("out_tr_md5"),
    )
    return (
        b.join(a, "clip_id", "inner")
        .filter(
            (~F.col("in_bytes_md5").eqNullSafe(F.col("out_bytes_md5")))
            | (~F.col("in_tr_md5").eqNullSafe(F.col("out_tr_md5")))
        )
        .select("clip_id")
    )


def snr_udf(cfg: DedupConfig):
    @F.pandas_udf(DoubleType())
    def _snr(a_bytes: pd.Series, b_bytes: pd.Series) -> pd.Series:
        out = []
        for ab, bb in zip(a_bytes, b_bytes):
            if ab is None or bb is None:
                out.append(None)
                continue
            try:
                ra = A.decode_wav_pcm16(bytes(ab))
                rb = A.decode_wav_pcm16(bytes(bb))
                out.append(A.snr_db(ra, rb))
            except ValueError:
                out.append(None)
        return pd.Series(out, dtype="float64")

    return _snr


def audit_acoustic_snr(verified_edges: DataFrame, clips: DataFrame,
                       cfg: DedupConfig) -> DataFrame:
    """(src, dst, snr_db) for verified simhash edges between same-rate
    clips. Callers assert min(snr_db) >= cfg.snr_db_min for planted
    dups; production runs record it as a quality metric."""
    acoustic = verified_edges.filter(F.col("detector") == "simhash")
    a = clips.select(
        F.col("clip_id").alias("src"),
        F.col("bytes").alias("src_bytes"),
        F.col("sr_hz").alias("src_sr"),
    )
    b = clips.select(
        F.col("clip_id").alias("dst"),
        F.col("bytes").alias("dst_bytes"),
        F.col("sr_hz").alias("dst_sr"),
    )
    return (
        acoustic.join(a, "src").join(b, "dst")
        .filter(F.col("src_sr") == F.col("dst_sr"))
        .select(
            "src", "dst",
            snr_udf(cfg)(F.col("src_bytes"), F.col("dst_bytes")).alias("snr_db"),
        )
    )
