"""Audio codecs + log-mel SimHash, numpy-vectorized (Arrow batches only).

The acoustic detector is the graft analog of the reference's geo side of
``hash_address``: geohash-precision-5 blocking keys (dedupe.rs:11-16,
61-86) become 16-bit SimHash band buckets, and the 10 m/100 m/1 km
haversine verify tiers (dedupe.rs:133-135, 177-195) become a Hamming
distance threshold on the 64-bit SimHash.

Container format: standard RIFF/WAVE PCM16 ("pcm_s16le"). FLAC/Opus
decode requires codec libraries not present in this container — those
paths raise NotImplementedError behind the codec gate; fixtures label
codecs but always carry PCM16 payloads (FIXTURES.md §1).

Everything here operates on numpy arrays / pandas Series so the Spark
entry points are vectorized pandas UDFs over Arrow batches — never
per-row Python rows.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

_RIFF_FMT = "<4sI4s4sIHHIIHH4sI"
_HEADER_LEN = 44

DECODABLE_CODECS = {"pcm_s16le"}


def encode_wav_pcm16(samples: np.ndarray, sr_hz: int) -> bytes:
    """float32 [-1,1] -> RIFF/WAVE PCM16 bytes (44-byte canonical header)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    data = pcm16.tobytes()
    header = struct.pack(
        _RIFF_FMT,
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sr_hz, sr_hz * 2, 2, 16,
        b"data", len(data),
    )
    return header + data


def decode_wav_pcm16(blob: bytes) -> np.ndarray:
    """RIFF/WAVE PCM16 bytes -> float32 in [-1, 1]."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pcm16 = np.frombuffer(blob, dtype="<i2", offset=_HEADER_LEN)
    return pcm16.astype(np.float32) / 32767.0


def decode_clip(blob: bytes, codec: str) -> np.ndarray:
    """Codec gate: PCM16 decodes for real; flac/opus would need external
    codec libs (absent here) — fixtures carry PCM16 payloads regardless
    of label, so only a genuinely non-RIFF payload raises."""
    if codec in DECODABLE_CODECS or blob[:4] == b"RIFF":
        return decode_wav_pcm16(blob)
    raise NotImplementedError(f"codec {codec!r} requires external decoder")


def mel_filterbank(n_mels: int, n_fft: int, sr_hz: int) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2 + 1), HTK mel scale."""
    fmax = sr_hz / 2.0
    mel_max = 2595.0 * np.log10(1.0 + fmax / 700.0)
    mel_pts = np.linspace(0.0, mel_max, n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / sr_hz).astype(int)
    bins = np.clip(bins, 0, n_fft // 2)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        if center > left:
            fb[m - 1, left:center] = (np.arange(left, center) - left) / (center - left)
        if right > center:
            fb[m - 1, center:right] = (right - np.arange(center, right)) / (right - center)
    return fb


@lru_cache(maxsize=64)
def _mel_filterbank_cached(n_mels: int, n_fft: int, sr_hz: int) -> np.ndarray:
    """Per-(n_mels, n_fft, sr) filterbank, computed once per worker.
    Building it per clip was ~40% of the whole UDF (profiled at
    0.12 s of a 0.30 s / 406-clip batch); sr takes a handful of values
    so the cache is tiny. Marked read-only: callers only matmul it."""
    fb = mel_filterbank(n_mels, n_fft, sr_hz)
    fb.setflags(write=False)
    return fb


@lru_cache(maxsize=8)
def _hanning_cached(frame_len: int) -> np.ndarray:
    w = np.hanning(frame_len)
    w.setflags(write=False)
    return w


def log_mel_features(samples: np.ndarray, sr_hz: int, n_mels: int,
                     frame_len: int, hop_len: int) -> np.ndarray:
    """Per-frame gain-invariant log-mel: log-energy with per-frame mean
    removed (log(g*X) = log g + log X, so subtracting the frame mean
    cancels constant gain — the ±3 dB re-render in FIXTURES.md §2 maps
    to the same fingerprint)."""
    if len(samples) < frame_len:
        samples = np.pad(samples, (0, frame_len - len(samples)))
    n_frames = 1 + (len(samples) - frame_len) // hop_len
    idx = np.arange(frame_len)[None, :] + hop_len * np.arange(n_frames)[:, None]
    frames = samples[idx] * _hanning_cached(frame_len)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    fb = _mel_filterbank_cached(n_mels, frame_len, sr_hz)
    mel = mag @ fb.T
    # adaptive floor at -30 dB of the clip's mean band energy: additive
    # noise at SNR >= 30 dB stays below the floor, so low-energy bands
    # (where log() would amplify it) can't flip fingerprint bits. The
    # floor scales with the signal, preserving gain invariance.
    eps = 1e-3 * max(mel.mean(), 1e-12)
    logmel = np.log(np.maximum(mel, eps))
    return logmel - logmel.mean(axis=1, keepdims=True)


def simhash_planes(n_mels: int, bits: int, seed: int) -> np.ndarray:
    """Deterministic random hyperplanes (bits, n_mels - 1) for SimHash
    over band-difference features."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, n_mels - 1))


def audio_simhash(samples: np.ndarray, sr_hz: int, planes: np.ndarray,
                  n_mels: int, frame_len: int, hop_len: int) -> int:
    """64-bit SimHash of band-to-band differences of time-pooled (mean)
    log-mel features.

    Two design choices, both measured:
    - mean-only pooling: ~2x more noise-stable than mean++std (std is a
      second moment and amplifies additive noise);
    - first-difference across mel bands before projection (the
      Haitsma–Kalker trick): raw pooled profiles are band-correlated,
      which compressed unrelated-pair Hamming to a median of ~22/64 and
      made banded blocking collide on 7.5% of all pairs; delta features
      whiten the smooth component — unrelated median ~31 (≈ the ideal
      32), blocking false-positive rate 0.5%, while SNR>=30dB
      re-renders still flip <= ~2 bits.

    Returned as a Python int in [0, 2**64); stored in Spark as int64
    via two's complement (to_int64)."""
    feats = log_mel_features(samples, sr_hz, n_mels, frame_len, hop_len)
    pooled = np.diff(feats.mean(axis=0))
    bits = (planes @ pooled) > 0
    # bit i of the result = bits[i]; packbits(bitorder="little") lays the
    # bools out exactly that way (the python `val |= 1 << i` loop it
    # replaces, bit-identical)
    return int.from_bytes(
        np.packbits(bits, bitorder="little").tobytes(), "little"
    )


def to_int64(u: int) -> int:
    """u64 -> i64 two's complement (reference stores libpostal's u64 hash
    as SQLite i64 the same way, deduplicator.rs:401)."""
    return u - (1 << 64) if u >= (1 << 63) else u


def simhash_band_values(u: int, bands: int, bits: int) -> list[int]:
    """Split a simhash into `bands` contiguous bit-slices (blocking keys:
    two hashes within hamming distance < bands share >= 1 slice —
    the pigeonhole guarantee that replaces geohash-cell blocking)."""
    width = bits // bands
    mask = (1 << width) - 1
    return [(u >> (b * width)) & mask for b in range(bands)]


def snr_db(ref: np.ndarray, other: np.ndarray, align_gain: bool = True) -> float:
    """SNR of `other` vs `ref` after length alignment (dB). Used by the
    per-row invariant audit: verified acoustic dup pairs must decode
    allclose at SNR >= 30 dB (BASELINE.json input_hint).

    align_gain: least-squares gain fit before the residual — a ±3 dB
    re-render is a lossless transform (FIXTURES §2), so the invariant is
    scale-invariant; without the fit, a 1 dB gain mismatch alone caps
    raw SNR at ~18 dB and the floor would be unmeetable by design."""
    n = min(len(ref), len(other))
    if n == 0:
        return float("-inf")
    r, o = ref[:n].astype(np.float64), other[:n].astype(np.float64)
    sig = np.sum(r**2)
    if sig == 0:
        return float("-inf")
    if align_gain:
        denom = np.sum(o**2)
        alpha = (np.sum(r * o) / denom) if denom > 0 else 0.0
        o = alpha * o
    noise = np.sum((r - o) ** 2)
    if noise == 0:
        return float("inf")
    return float(10.0 * np.log10(sig / noise))
