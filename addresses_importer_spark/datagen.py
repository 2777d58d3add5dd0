"""Deterministic synthesis of the `clips` corpus + golden fixtures.

Transposes the reference's golden SQL fixtures to the audio+transcript
payload (FIXTURES.md):

- ``fixture_no_dupes``  ≈ deduplicator/data/tests/no_dupes.sql (109 unique
  rows incl. adversarial near-misses, asserted in tests.rs:69-90);
- ``fixture_with_dupes`` ≈ with_dupes.sql (26 rows in 10 annotated
  clusters → exactly 10 survivors, tests.rs:124-143);
- ``fixture_x10``       ≈ the idempotence test (tests.rs:94-120);
- ``synth_corpus``      — scalable seeded corpus with planted dup clusters
  for bench runs (distributed generation via mapInPandas).

Everything is seeded; no wall clock, no external data.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .config import DedupConfig
from .functions.audio import encode_wav_pcm16

CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
    ]
)

TRUTH_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("cluster_id", T.StringType()),
    ]
)

WORDS = (
    "the quick brown fox jumps over lazy dog river stone market garden "
    "bright morning silver cloud whisper thunder velvet canyon ember "
    "harbor lantern meadow ripple saffron timber willow zephyr quarry "
    "orchid pebble drift cascade juniper marble nectar osprey prairie "
    "quill raven sable tundra umber vortex walnut yonder zenith amber "
    "basil cedar dahlia elm fennel ginger hazel iris jade kelp"
).split()

#: abbreviation table mirroring the reference's "Avenue"/"av." lexical
#: jitter (with_dupes.sql:18-44)
ABBREV = {"morning": "morn", "mountain": "mtn", "garden": "gdn", "market": "mkt",
          "harbor": "hbr", "river": "rvr"}

CODECS = ["pcm_s16le", "flac", "opus"]
SR_CHOICES = [8000, 16000, 22050]


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


def _signal(rng: random.Random, sr_hz: int, dur_s: float) -> np.ndarray:
    """Seeded sum-of-sinusoids + light noise, float32 in [-1, 1]."""
    t = np.arange(int(sr_hz * dur_s)) / sr_hz
    sig = np.zeros_like(t)
    for _ in range(rng.randint(4, 7)):
        f = rng.uniform(80.0, sr_hz / 2.5)
        a = rng.uniform(0.1, 0.3)
        ph = rng.uniform(0, 2 * np.pi)
        sig = sig + a * np.sin(2 * np.pi * f * t + ph)
    # a linear chirp per clip: spreads spectral energy so distinct clips
    # get well-separated fingerprints (sparse pure-tone mixes from a
    # narrow random space can otherwise land Hamming-close by chance)
    f0 = rng.uniform(100.0, sr_hz / 4)
    f1 = rng.uniform(100.0, sr_hz / 4)
    sig = sig + rng.uniform(0.15, 0.3) * np.sin(
        2 * np.pi * (f0 * t + 0.5 * (f1 - f0) / max(t[-1], 1e-9) * t * t)
    )
    # spectrally-shaped noise: white noise filtered by a random smooth
    # envelope (8 control points). Pure-tone mixes live on a
    # low-dimensional manifold, so at >10k clips their 64-bit SimHashes
    # birthday-collide into huge blocking buckets (observed: 3.4M
    # acoustic candidate pairs from 15.6k clips). A random broadband
    # component gives each clip a high-dimensional spectral identity —
    # which is also what real speech/audio looks like to a log-mel
    # frontend.
    noise_rng2 = np.random.default_rng(rng.randrange(2**31))
    white = noise_rng2.standard_normal(len(t))
    spec = np.fft.rfft(white)
    # 32 independent control points ≈ one random gain per mel band: the
    # pooled log-mel profile then has ~32 degrees of freedom per clip
    # (a smoother envelope would *lower* fingerprint entropy)
    ctrl = noise_rng2.uniform(0.02, 1.0, 32) ** 2
    envelope = np.interp(np.linspace(0, 31, len(spec)), np.arange(32), ctrl)
    shaped = np.fft.irfft(spec * envelope, n=len(t))
    shaped /= max(np.max(np.abs(shaped)), 1e-9)
    sig = sig + 0.6 * shaped
    noise_rng = np.random.default_rng(rng.randrange(2**31))
    sig = sig + 0.002 * noise_rng.standard_normal(len(t))
    # normalize to 0.5 peak: headroom so a +3 dB re-render (FIXTURES §2)
    # does not clip — clipping is nonlinear and would legitimately move
    # the fingerprint
    peak = np.max(np.abs(sig)) or 1.0
    return (0.5 * sig / peak).astype(np.float64)


def _row(clip_id: str, samples: np.ndarray, sr_hz: int, codec: str,
         transcript: str) -> dict:
    return {
        "clip_id": clip_id,
        "bytes": encode_wav_pcm16(samples, sr_hz),
        "sr_hz": sr_hz,
        "dur_ms": int(len(samples) * 1000 // sr_hz),
        "codec": codec,
        "transcript": transcript,
    }


def _perturb_gain_noise(samples: np.ndarray, rng: random.Random,
                        gain_db: float, snr_db: float) -> np.ndarray:
    """Re-render: gain shift + additive noise at the given SNR (the
    FIXTURES.md ±3 dB / SNR ≥ 30 dB acoustic jitter)."""
    g = 10.0 ** (gain_db / 20.0)
    out = samples * g
    noise_rng = np.random.default_rng(rng.randrange(2**31))
    sig_pow = np.mean(out**2)
    noise_pow = sig_pow / (10.0 ** (snr_db / 10.0))
    out = out + np.sqrt(noise_pow) * noise_rng.standard_normal(len(out))
    return np.clip(out, -1.0, 1.0)


def _perturb_transcript(text: str, rng: random.Random) -> str:
    """Lexical jitter above the Jaccard-0.6 bar: case flips and
    punctuation (free under normalization) plus at most 2 abbreviation
    swaps — mirroring with_dupes.sql:18-44's "Avenue"/"av." jitter while
    keeping within-cluster shingle similarity >= ~0.75."""
    words = text.split()
    out = []
    swaps = 0
    for w in words:
        if w in ABBREV and swaps < 2 and rng.random() < 0.8:
            out.append(ABBREV[w])
            swaps += 1
        elif rng.random() < 0.15:
            out.append(w.upper())
        else:
            out.append(w)
    s = " ".join(out)
    if rng.random() < 0.5:
        s = s.replace(" ", ",  ", 1)
    return s


# ---------------------------------------------------------------------------
# Golden fixtures (driver-side pandas; tiny)
# ---------------------------------------------------------------------------

def fixture_with_dupes() -> tuple[pd.DataFrame, pd.DataFrame]:
    """26 rows in 10 planted clusters → exactly 10 survivors.

    Cluster plan (sizes sum to 26, matching with_dupes.sql's shape):
      c0-c3  transcript near-dups (lexical jitter)      sizes 3,3,2,3
      c4-c6  acoustic near-dups (gain/noise re-render,
             transcripts unrelated)                     sizes 3,2,3
      c7-c8  substring containment                      sizes 2,2
      c9     exact dup (identical payload)              size 3
    """
    rng = random.Random(1042)
    rows: list[dict] = []
    truth: list[dict] = []
    cid = 0

    def add(cluster: str, row: dict) -> None:
        truth.append({"clip_id": row["clip_id"], "cluster_id": cluster})
        rows.append(row)

    def next_id() -> str:
        nonlocal cid
        cid += 1
        return f"wd_{cid:04d}"

    # transcript near-dup clusters
    for k, size in zip(range(4), [3, 3, 2, 3]):
        base_text = _sentence(rng, 24)
        for m in range(size):
            sr = rng.choice(SR_CHOICES)
            sig = _signal(rng, sr, rng.uniform(0.5, 1.5))
            text = base_text if m == 0 else _perturb_transcript(base_text, rng)
            add(f"c{k}", _row(next_id(), sig, sr, rng.choice(CODECS), text))

    # acoustic near-dup clusters (same signal re-rendered; transcripts
    # unrelated so ONLY the SimHash detector can find them)
    for k, size in zip(range(4, 7), [3, 2, 3]):
        sr = rng.choice(SR_CHOICES)
        base_sig = _signal(rng, sr, rng.uniform(0.8, 2.0))
        for m in range(size):
            sig = base_sig if m == 0 else _perturb_gain_noise(
                base_sig, rng, gain_db=rng.uniform(-3, 3), snr_db=rng.uniform(34, 40))
            add(f"c{k}", _row(next_id(), sig, sr, rng.choice(CODECS),
                              _sentence(rng, 20)))

    # substring containment clusters: short transcript embedded verbatim
    for k, size in zip(range(7, 9), [2, 2]):
        short = _sentence(rng, 10)
        long_text = f"{_sentence(rng, 15)} {short} {_sentence(rng, 15)}"
        sr = rng.choice(SR_CHOICES)
        add(f"c{k}", _row(next_id(), _signal(rng, sr, 0.6), sr,
                          rng.choice(CODECS), short))
        for _ in range(size - 1):
            sr2 = rng.choice(SR_CHOICES)
            add(f"c{k}", _row(next_id(), _signal(rng, sr2, 1.2), sr2,
                              rng.choice(CODECS), long_text))

    # exact-dup cluster: identical payload, distinct clip_ids
    sr = rng.choice(SR_CHOICES)
    sig = _signal(rng, sr, 1.0)
    text = _sentence(rng, 18)
    for _ in range(3):
        add("c9", _row(next_id(), sig, sr, "pcm_s16le", text))

    assert len(rows) == 26
    return pd.DataFrame(rows), pd.DataFrame(truth)


def fixture_no_dupes() -> pd.DataFrame:
    """109 all-unique clips incl. adversarial near-misses (controls that
    must NOT merge; ≈ no_dupes.sql:16-28's same-postcode/different-city
    and hash-collision-regression pairs)."""
    rng = random.Random(2042)
    rows: list[dict] = []
    i = 0

    def next_id() -> str:
        nonlocal i
        i += 1
        return f"nd_{i:04d}"

    def uniq(n_words: int = 20, dur: float | None = None) -> dict:
        sr = rng.choice(SR_CHOICES)
        sig = _signal(rng, sr, dur or rng.uniform(0.5, 1.5))
        return _row(next_id(), sig, sr, rng.choice(CODECS), _sentence(rng, n_words))

    # 93 plain unique rows
    for _ in range(93):
        rows.append(uniq())

    # 4 rows: two pairs with the same word multiset in different order
    for _ in range(2):
        ws = [rng.choice(WORDS) for _ in range(12)]
        shuffled = ws[:]
        rng.shuffle(shuffled)
        for words in (ws, shuffled):
            sr = rng.choice(SR_CHOICES)
            rows.append(_row(next_id(), _signal(rng, sr, 0.7), sr,
                             rng.choice(CODECS), " ".join(words)))

    # 4 rows: two pairs sharing a long prefix but diverging tails
    # (must NOT be substring dups — tails differ)
    for _ in range(2):
        prefix = _sentence(rng, 10)
        for _ in range(2):
            sr = rng.choice(SR_CHOICES)
            rows.append(_row(next_id(), _signal(rng, sr, 0.7), sr,
                             rng.choice(CODECS), f"{prefix} {_sentence(rng, 12)}"))

    # 4 rows: two pairs sharing a 6-word stem but differing in their
    # last 3 words (the number-26-vs-27 / Avenue-vs-Route analog:
    # adversarially similar, must stay below the Jaccard threshold)
    for tail_a, tail_b in [
        ("amber harbor stone", "umber lantern marble"),
        ("cedar meadow drift", "walnut canyon ripple"),
    ]:
        stem = _sentence(rng, 6)
        for tail in (tail_a, tail_b):
            sr = rng.choice(SR_CHOICES)
            rows.append(_row(next_id(), _signal(rng, sr, 0.6), sr,
                             rng.choice(CODECS), f"{stem} {tail}"))

    # 4 rows: acoustically near-miss pairs — same base signal plus three
    # extra loud sinusoids: shared structure, but far enough in mel
    # profile to sit above the Hamming verify threshold (the fingerprint
    # equivalent of with_dupes.sql's coordinate near-misses)
    for _ in range(2):
        sr = rng.choice(SR_CHOICES)
        base = _signal(rng, sr, 1.0)
        t = np.arange(len(base)) / sr
        extra = np.zeros_like(base)
        for _ in range(3):
            extra = extra + rng.uniform(0.4, 0.6) * np.sin(
                2 * np.pi * rng.uniform(150, sr / 2.5) * t + rng.uniform(0, 6.28)
            )
        rows.append(_row(next_id(), base, sr, rng.choice(CODECS), _sentence(rng, 20)))
        rows.append(_row(next_id(), np.clip(base + extra, -1, 1), sr,
                         rng.choice(CODECS), _sentence(rng, 20)))

    assert len(rows) == 109
    return pd.DataFrame(rows)


def fixture_x10() -> pd.DataFrame:
    """no_dupes unioned 10× with distinct clip_ids, byte-identical
    payloads → exactly one survivor per original row (tests.rs:94-120)."""
    base = fixture_no_dupes()
    copies = []
    for rep in range(10):
        c = base.copy()
        c["clip_id"] = c["clip_id"] + f"_r{rep}"
        copies.append(c)
    return pd.concat(copies, ignore_index=True)


def to_spark(spark: SparkSession, pdf: pd.DataFrame,
             schema: T.StructType = CLIPS_SCHEMA) -> DataFrame:
    return spark.createDataFrame(pdf, schema=schema)


# ---------------------------------------------------------------------------
# Scalable bench corpus (distributed generation)
# ---------------------------------------------------------------------------

def synth_corpus(spark: SparkSession, n_base: int, seed: int = 7,
                 dup_fraction: float = 0.3, partitions: int | None = None,
                 with_audio: bool = True) -> DataFrame:
    """Seeded corpus: ``n_base`` unique clips + planted dup rows
    (~dup_fraction * n_base extra rows in clusters of 2-3), generated in
    parallel via mapInPandas — each output row derived only from its
    (seed, index), so the corpus is deterministic at any parallelism.
    """
    n_dup_clusters = int(n_base * dup_fraction / 2)
    total = n_base + 2 * n_dup_clusters  # each cluster adds 2 dup rows

    plan = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for idx in pdf["id"].tolist():
                rng = random.Random((seed << 20) ^ idx)
                if idx < n_base:
                    clip_id = f"base_{idx:09d}"
                    text = _sentence(rng, rng.randint(12, 40))
                    sr = rng.choice(SR_CHOICES)
                    dur = rng.uniform(0.4, 1.2)
                    sig = _signal(rng, sr, dur) if with_audio else np.zeros(64)
                else:
                    # dup member of cluster k, derived from base row k
                    k = (idx - n_base) // 2
                    member = (idx - n_base) % 2
                    base_rng = random.Random((seed << 20) ^ k)
                    clip_id = f"dup_{k:09d}_{member}"
                    text = _sentence(base_rng, base_rng.randint(12, 40))
                    sr = base_rng.choice(SR_CHOICES)
                    dur = base_rng.uniform(0.4, 1.2)
                    sig = _signal(base_rng, sr, dur) if with_audio else np.zeros(64)
                    if member == 0:
                        text = _perturb_transcript(text, rng)
                    else:
                        sig = _perturb_gain_noise(sig, rng, rng.uniform(-3, 3),
                                                  rng.uniform(34, 40))
                rows.append(_row(clip_id, sig, sr, rng.choice(CODECS), text))
            yield pd.DataFrame(rows)

    return plan.mapInPandas(gen, schema=CLIPS_SCHEMA)
