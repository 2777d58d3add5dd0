"""Dedup pipeline configuration.

The reference (Qwant/addresses-importer) hard-codes its blocking/verify
parameters: libpostal near-dupe hashing with geohash precision 5
(deduplicator/src/lib/dedupe.rs:11-16), verification distance tiers of
10 m / 100 m / 1 km (dedupe.rs:177-195), and a skew kill-switch at packs
of > 5000 members (deduplicator/src/lib/deduplicator.rs:120-155).

The graft re-expresses those as an explicit, frozen config so that (a)
the recall-vs-reference contract is pinned to one parameterization and
(b) every stage manifest records a config hash for checkpoint/resume.
"""

from __future__ import annotations

import hashlib
import json
import random
from dataclasses import asdict, dataclass, field

#: 2**31 - 1, Mersenne prime. Keeps (a*x + b) % MOD inside int64 even
#: under ANSI arithmetic (a, x < 2**31 so a*x < 2**62).
MINHASH_MOD = 2_147_483_647


@dataclass(frozen=True)
class DedupConfig:
    """Parameters for the three detectors + clustering.

    MinHash-LSH threshold ~= (1/bands)**(1/rows); with 16 bands x 4 rows
    that is ~0.50 Jaccard, mirroring the reference's "lexically close
    records share >= 1 blocking key" contract (dedupe.rs:36-59).
    """

    # --- transcript MinHash-LSH detector -------------------------------
    shingle_width: int = 8          # char shingles over normalized text
    num_perm: int = 64              # MinHash signature length
    bands: int = 16                 # LSH bands
    rows: int = 4                   # rows per band (bands*rows == num_perm)
    minhash_mod: int = MINHASH_MOD
    seed: int = 42
    jaccard_threshold: float = 0.6  # verify threshold (exact Jaccard).
    #   Sits between planted-dup similarity (>= ~0.75 under the
    #   fixtures' lexical jitter) and adversarial controls (<= ~0.5,
    #   the Avenue-vs-Route analog, with_dupes.sql:46-57)

    # --- acoustic SimHash detector -------------------------------------
    simhash_bits: int = 64
    simhash_bands: int = 2          # 32-bit band slices
    simhash_probe_bits: int = 1     # 1-bit multi-probe per band: probes
    #   emit as query-role keys against original-value index keys, so by
    #   pigeonhole any pair within Hamming <= 2*bands - 1 = 3 shares a
    #   key — exactly the verify threshold. 32-bit slices put the
    #   per-random-pair blocking false-positive rate at
    #   ~bands*(width+1)/2^width ≈ 1.5e-8: with 16-bit slices the rate
    #   was ~5e-3/pair, which is QUADRATIC candidate growth (6.4M pairs
    #   at 52k clips; would be 1e13 at 100x scale)
    simhash_max_hamming: int = 3    # verify threshold (~= 10m/100m tiers).
    #   On broadband-content audio, SNR>=30dB re-renders measure <= ~1
    #   flipped bit (noise perturbs log-mel energies far below band
    #   level); unrelated clips measure >= ~5 even adversarially.
    #   Multi-probe blocking guarantees a shared key for Hamming
    #   <= 2*bands - 1 = 3 — exactly the verify threshold, zero margin
    #   (pigeonhole: some band differs by <= 1 bit and the 1-flip probe
    #   hits the other side's original). Raising simhash_max_hamming
    #   therefore requires more bands or multi-bit probes.
    n_mels: int = 32                # log-mel bands
    frame_len: int = 512
    hop_len: int = 256

    # --- suffix / substring-containment detector -----------------------
    suffix_shingle_width: int = 16  # wider than minhash shingles: any
    #   substring shares all its w-shingles with its container for ANY
    #   w, and wider shingles have far lower document frequency, so the
    #   rarest-shingle query key fans out to few postings even on
    #   low-vocabulary corpora
    suffix_bottom_k: int = 8        # (unused by the rarest-df scheme; kept
    #   for config-hash stability of older checkpoints)
    min_containment_len: int = 24   # min normalized chars to be containable
    suffix_prune_postings: bool = True  # drop index postings in buckets no
    #   rarest-shingle query key ever probes, via a broadcast semi-join of
    #   the distinct rarest-hash set (<= one int64 per containable clip).
    #   The candidates equi-join discards those rows anyway — pruning just
    #   moves the drop MAP-SIDE, before the postings (the job's largest
    #   table; measured 99.3% prunable at 130k clips) are checkpointed or
    #   shuffled. Disable for jobs with >~10^7 containable clips, where
    #   the probed-set broadcast outgrows the shuffle it saves; a
    #   shuffle-side semi-join would share the pair join's partitioning
    #   and save nothing, so at that scale the inner join's own drop is
    #   already optimal.

    # --- skew handling (reference: drop packs > 5000,
    #     deduplicator.rs:120-155; we cap + count, never silently) ------
    bucket_cap: int = 5000

    # --- survivors anti-join strategy -----------------------------------
    broadcast_ids_max: int = 5_000_000  # loser sets up to this many ids
    #   are broadcast for the final anti-join (~125 MB hashed — payload
    #   bytes never enter an Exchange); above it the pipeline writes the
    #   valid clips as a clip_id-bucketed table and anti-joins against
    #   it, exchanging only the slim loser ids (survivors.py)

    # --- connected components ------------------------------------------
    cc_max_iters: int = 25
    cc_checkpoint_every: int = 4

    # --- per-row invariants --------------------------------------------
    snr_db_min: float = 30.0

    def __post_init__(self) -> None:
        if self.bands * self.rows != self.num_perm:
            raise ValueError("bands * rows must equal num_perm")
        if self.simhash_bits % self.simhash_bands != 0:
            raise ValueError("simhash_bits must divide into simhash_bands")
        if self.simhash_probe_bits not in (0, 1):
            # only single-bit flips are ever emitted by
            # simhash_band_keys_sql; >1 would silently under-probe
            raise ValueError("simhash_probe_bits must be 0 or 1")
        # blocking guarantee depends on probing: plain banding shares a
        # key only for Hamming <= bands-1 (pigeonhole on identical
        # bands); 1-bit probes extend that to 2*bands-1 (some band
        # differs by <= 1 bit and the flip probe hits the other side's
        # original). Validating against 2*bands-1 unconditionally let a
        # probe_bits=0 config pass while blocking silently missed
        # verified-range pairs at Hamming in [bands, 2*bands-1].
        guaranteed = (
            2 * self.simhash_bands - 1
            if self.simhash_probe_bits == 1
            else self.simhash_bands - 1
        )
        if guaranteed < self.simhash_max_hamming:
            raise ValueError(
                "blocking only guarantees Hamming <= "
                f"{guaranteed} (bands={self.simhash_bands}, "
                f"probe_bits={self.simhash_probe_bits}) but "
                f"simhash_max_hamming={self.simhash_max_hamming}: "
                "verified-range pairs could be missed by blocking"
            )

    def minhash_perms(self) -> list[tuple[int, int]]:
        """Deterministic (a, b) pairs for h_i(x) = (a*x + b) % mod.

        Seeded so Spark exprs and the DuckDB oracle SQL embed the very
        same constants (recall-reproducibility requirement; SURVEY §7.4).
        """
        rng = random.Random(self.seed)
        return [
            (rng.randrange(1, self.minhash_mod), rng.randrange(0, self.minhash_mod))
            for _ in range(self.num_perm)
        ]

    def config_hash(self) -> str:
        """Stable hash identifying this parameterization (stage manifests).

        ``_hash_family`` tags the shingle→int64 base-hash family baked
        into the signature expressions (round 5: polynomial rolling
        hash base 131 mod 2^31-1, hashing.poly_hashes_from_codes_sql;
        rounds 1-4 used md5-per-shingle). It participates in the hash
        so checkpoints written under one family can never silently
        resume under the other — same parameters, different values.
        The tag is DERIVED from the live constants (ADVICE r5): a
        hardcoded literal would leave config_hash unchanged if
        POLY_BASE/POLY_MOD ever moved, silently resuming checkpoints
        whose hash values no longer match — the exact failure this tag
        exists to prevent.
        """
        from .functions.hashing import POLY_BASE, POLY_MOD

        payload = json.dumps(
            {
                **asdict(self),
                "_hash_family": f"poly{POLY_BASE}-{POLY_MOD}",
                # round-6 signature layout: simhash bucket keys are
                # bit-packed band values and probe flips are derived at
                # candidate/probe time, not stored — checkpoints and
                # prepared probe indexes written under the old md5-key
                # 66-rows-per-clip layout must never be resumed
                "_sig_layout": "simhash-bitkeys-v2",
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()

#: codec quality priority, mirroring the reference's source priority
#: (deduplicator/src/lib/sources.rs:39-45: Bano=3 > OSM=2 > OpenAddresses=1).
CODEC_PRIORITY: dict[str, int] = {"pcm_s16le": 3, "flac": 2, "opus": 1}
