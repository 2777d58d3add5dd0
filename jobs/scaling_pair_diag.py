"""Per-AB-pair diagnostic over SCALING.json (analysis aid, not the
contract estimator — the contract number is summary.scaling_efficiency,
the conventional median over hw-gated valid ABBA reps).

Each ABBA rep contains two adjacent (2-core, 8-core) leg pairs:
legs (1,2) and (4,3). A pair's efficiency is (tp8/tp2)/4 over legs that
ran back-to-back (~16 min apart), so the pair view localizes WHEN a
recurring exogenous host load landed inside a rep window: a throttled
pair shows uniform per-stage slowdown (host), a genuine engine
bottleneck would show one straggler stage. Prints every pair with its
efficiency and the 8-core leg's stage walls.
"""

import json
import sys


def main(path: str = "SCALING.json") -> None:
    doc = json.load(open(path))
    if "reps" not in doc:
        # round-3 pre-gate format: top-level {"runs": [...], "summary"}
        print(f"{path}: pre-ABBA (round-3) format — no per-rep legs to "
              f"pair; nothing to diagnose")
        return
    pair_effs = []
    for i, rep in enumerate(doc["reps"]):
        legs = rep.get("legs") or {}
        if not legs:
            print(f"rep{i}: skipped (gate never passed)")
            continue
        lo_key, hi_key = sorted(legs, key=lambda k: int(k))
        # pre-ABBA (round-3) reps carry per-leg scalars, not a runs
        # list; legs recorded before --one emitted stage_sec lack that
        # key — skip with a note instead of KeyError (ADVICE r4)
        lo, hi = legs[lo_key].get("runs"), legs[hi_key].get("runs")
        if not lo or not hi:
            print(f"rep{i}: skipped (pre-ABBA rep format, no runs list)")
            continue
        ratio = int(hi_key) / int(lo_key)
        # ABBA order: (lo0, hi0, hi1, lo1) -> pairs (lo0,hi0), (lo1,hi1)
        for p, (l, h) in enumerate([(lo[0], hi[0]), (lo[-1], hi[-1])]):
            eff = (h["clips_per_sec"] / l["clips_per_sec"]) / ratio
            pair_effs.append(eff)
            stages = {k: v for k, v in h.get("stage_sec", {}).items()
                      if ":" not in k}
            print(f"rep{i} pair{p}: eff {eff:.3f} "
                  f"(lo {l['clips_per_sec']:.0f} c/s, "
                  f"hi {h['clips_per_sec']:.0f} c/s; valid={rep['valid']}) "
                  f"hi-leg stages {stages}")
    if pair_effs:
        import statistics
        print(f"\npairs n={len(pair_effs)} "
              f"min {min(pair_effs):.3f} max {max(pair_effs):.3f} "
              f"median {statistics.median(pair_effs):.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:])
