"""Unit tests for the scaling protocol's pre-registered stopping rule
(VERDICT r4 #8) and the ABBA survivor cross-check (ADVICE r4) — pure
driver-side logic, no Spark.
"""

import bench_scaling as BS


def _rep(eff, valid, lo=2, hi=8, surv=100, tp_lo=100.0):
    tp_hi = tp_lo * eff * (hi / lo)
    def leg(c, tp):
        return {
            "cores": c, "clips": 1000, "survivors": surv,
            "clips_per_sec_gm": tp,
            "runs": [
                {"cores": c, "clips": 1000, "survivors": surv,
                 "wall_sec": 1000 / tp, "clips_per_sec": tp}
            ] * 2,
        }
    return {
        "legs": {lo: leg(lo, tp_lo), hi: leg(hi, tp_hi)},
        "hw_control_before": 0.9, "hw_control_after": 0.9,
        "efficiency": eff, "valid": valid,
    }


def test_sufficient_valid_reps_publishes_median():
    reps = [_rep(e, True) for e in (0.7, 0.9, 0.8)]
    s = BS.summarize(reps, reps=3, gate=0.85, gate_hi=1.2)
    assert s["status"] == "ok"
    assert s["scaling_efficiency"] == 0.8
    assert s["meets_target"] is True
    assert s["valid_rep_count"] == 3


def test_insufficient_valid_reps_withholds_the_median():
    """Budget exhausted at 2 valid of 5: SCALING.json must say
    insufficient_valid_reps and publish NO contract median — only the
    explicitly-labeled provisional number."""
    reps = [_rep(0.85, True), _rep(0.9, True), _rep(0.3, False)]
    s = BS.summarize(reps, reps=5, gate=0.85, gate_hi=1.2)
    assert s["status"] == "insufficient_valid_reps"
    assert s["scaling_efficiency"] is None
    assert s["meets_target"] is None
    assert s["provisional_efficiency"] == 0.875
    assert s["valid_rep_count"] == 2
    assert s["target_valid_reps"] == 5


def test_invalid_reps_never_enter_the_median():
    reps = [_rep(0.9, True), _rep(0.91, True), _rep(0.89, True),
            _rep(0.1, False), _rep(2.0, False)]
    s = BS.summarize(reps, reps=3, gate=0.85, gate_hi=1.2)
    assert s["status"] == "ok"
    assert s["scaling_efficiency"] == 0.9
    assert len(s["invalid_reps"]) == 2


def test_resume_round_trips_recorded_reps(tmp_path, monkeypatch):
    """--resume must reload exactly the reps a crashed run persisted
    (ABBA format and gate-skips) and drop pre-ABBA-format reps, so a
    harness crash mid-protocol never discards a completed valid rep."""
    import json

    skipped = {"legs": {}, "hw_control_before": 0.4, "hw_control_after": None,
               "efficiency": None, "valid": False, "skipped_gate": True}
    pre_abba = {"legs": {"2": {"cores": 2, "clips_per_sec": 100.0}},
                "efficiency": 0.7, "valid": True}  # no runs list
    good = _rep(0.74, True)
    monkeypatch.chdir(tmp_path)
    assert BS.load_existing() == []  # no SCALING.json yet
    with open("SCALING.json", "w") as f:
        json.dump({"reps": [good, skipped, pre_abba], "summary": {}}, f)
    loaded = BS.load_existing()
    assert [r.get("efficiency") for r in loaded] == [0.74, None]
    assert sum(r["valid"] for r in loaded) == 1


def test_gate_skipped_reps_summarize_to_none():
    reps = [{"legs": {}, "hw_control_before": 0.4, "hw_control_after": None,
             "efficiency": None, "valid": False, "skipped_gate": True}]
    assert BS.summarize(reps, reps=5, gate=0.85, gate_hi=1.2) is None
