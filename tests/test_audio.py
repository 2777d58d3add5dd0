"""Audio codec + SimHash robustness (the acoustic detector contract).

Transposes the reference's is_duplicate distance-tier doctests
(dedupe.rs:106-127): perturbations inside the tier (gain ±3 dB, noise
at SNR >= 30 dB) stay within Hamming threshold; genuinely different
signals land far outside it.
"""

import random

import numpy as np
import pytest

from addresses_importer_spark.config import DedupConfig
from addresses_importer_spark.datagen import _perturb_gain_noise, _signal
from addresses_importer_spark.functions import audio as A

CFG = DedupConfig()
PLANES = A.simhash_planes(CFG.n_mels, CFG.simhash_bits, CFG.seed)


def _hash(sig, sr):
    return A.audio_simhash(sig, sr, PLANES, CFG.n_mels, CFG.frame_len, CFG.hop_len)


def _hamming(a, b):
    return bin(a ^ b).count("1")


def test_wav_roundtrip():
    rng = random.Random(3)
    sig = _signal(rng, 16000, 0.5)
    blob = A.encode_wav_pcm16(sig, 16000)
    out = A.decode_wav_pcm16(blob)
    assert len(out) == len(sig)
    assert A.snr_db(sig.astype(np.float32), out) > 40  # 16-bit quantization only


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        A.decode_wav_pcm16(b"not a wav file at all........." * 4)


def test_codec_gate():
    with pytest.raises(NotImplementedError):
        A.decode_clip(b"\x00" * 100, "opus")


def test_simhash_deterministic():
    rng = random.Random(5)
    sig = _signal(rng, 16000, 1.0)
    assert _hash(sig, 16000) == _hash(sig, 16000)


def test_simhash_gain_invariant():
    rng = random.Random(7)
    sig = _signal(rng, 16000, 1.0)
    for gain_db in (-3, 3, -5, 5):
        scaled = np.clip(sig * 10 ** (gain_db / 20), -1, 1)
        assert _hamming(_hash(sig, 16000), _hash(scaled, 16000)) <= 1


def test_simhash_noise_within_threshold():
    rng = random.Random(11)
    for trial in range(10):
        sr = random.Random(trial).choice([8000, 16000, 22050])
        sig = _signal(random.Random(100 + trial), sr, 1.0)
        pert = _perturb_gain_noise(sig, rng, gain_db=rng.uniform(-3, 3),
                                   snr_db=rng.uniform(34, 40))
        h = _hamming(_hash(sig, sr), _hash(pert, sr))
        assert h <= CFG.simhash_max_hamming, f"trial {trial}: hamming {h}"


def test_simhash_different_signals_far():
    a = _signal(random.Random(21), 16000, 1.0)
    b = _signal(random.Random(22), 16000, 1.0)
    assert _hamming(_hash(a, 16000), _hash(b, 16000)) > CFG.simhash_max_hamming


def test_band_values_pigeonhole():
    """Hamming <= 2*bands - 1 ⇒ some band differs by <= 1 bit, so the
    1-bit probe set of one side contains the other side's band value
    (the blocking guarantee behind simhash_band_exprs)."""
    u = 0xDEADBEEFCAFEBABE
    for flips in [(3,), (3, 40), (3, 40, 63)]:  # hamming 1..2*bands-1
        v = u
        for f in flips:
            v ^= 1 << f
        bu = A.simhash_band_values(u, CFG.simhash_bands, CFG.simhash_bits)
        bv = A.simhash_band_values(v, CFG.simhash_bands, CFG.simhash_bits)
        assert any(bin(x ^ y).count("1") <= 1 for x, y in zip(bu, bv))


def test_to_int64_roundtrip():
    assert A.to_int64(2**63) == -(2**63)
    assert A.to_int64(5) == 5
    assert A.to_int64(2**64 - 1) == -1


def test_snr_db():
    sig = np.sin(np.linspace(0, 100, 16000)).astype(np.float32)
    assert A.snr_db(sig, sig) == float("inf")
    noisy = sig + 0.001 * np.random.default_rng(1).standard_normal(len(sig)).astype(np.float32)
    assert 50 < A.snr_db(sig, noisy) < 70
