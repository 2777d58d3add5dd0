"""N → 4N scaling protocol (BASELINE.md sandbox protocol).

No real cluster in the sandbox, so cluster size is evidenced by core
count: the identical pipeline on identical input at local[8] vs
local[32]; efficiency = (throughput@32 / throughput@8) / 4. Each
measurement is a fresh JVM (subprocess) so executor-thread pools,
shuffle partitions, and memory are configured per run exactly as
spark-submit would.

Usage:
    python bench_scaling.py                 # full protocol -> BENCH.md
    python bench_scaling.py --resume        # continue from SCALING.json's reps
    python bench_scaling.py --one N         # one measurement (internal)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# ramdisk: this sandbox is one VM with one virtual disk — shuffle spill
# and stage checkpoints on it are a serial resource that masks CPU
# scaling (real clusters have per-executor local disks). /dev/shm keeps
# the scaling measurement about the engine, not the single vda device.
_BASE = "/dev/shm/spark_graft_scaling" if os.path.isdir("/dev/shm") else "/tmp/spark_graft_scaling"
os.environ.setdefault("SPARK_LOCAL_DIRS", os.path.join(_BASE, "local"))
CORPUS = f"{_BASE}/clips.parquet"
N_BASE = int(os.environ.get("SCALING_CLIPS", "40000"))

# N and 4N. Default 2 -> 8: this sandbox VM reports 32 vCPUs but pure
# numpy-FFT process pools measure only ~0.61-0.65 scaling efficiency
# for 8->32 and 4->16 (SMT threads / memory bandwidth, not Spark), while
# 2->8 measures 0.92 — i.e. 8 is the largest "4N" whose hardware is
# actually 4x the "N". Override with SCALING_CORES="8,32" to reproduce
# the ceiling measurement.
CORES = tuple(
    int(x) for x in os.environ.get("SCALING_CORES", "2,8").split(",")
)

# Per-CORE-constant JVM memory: a real N→4N scale-up quadruples
# aggregate executor memory along with the cores, so giving both legs
# the same fixed heap models the WRONG cluster (the 4N leg ran on a
# quarter of the per-core memory and measured 20% slower from GC
# pressure alone: 1099 → 1321 clips/s at 260k clips when the 8-core
# heap was raised from 8g to 32g). 4 GB/core matches common
# executor sizing (4 cores / 16g).
MEM_PER_CORE_GB = int(os.environ.get("SCALING_MEM_PER_CORE_GB", "4"))


def run_one(cores: int) -> None:
    os.environ["SPARK_DRIVER_MEM"] = f"{MEM_PER_CORE_GB * cores}g"
    from addresses_importer_spark.config import DedupConfig
    from addresses_importer_spark.plans.pipeline import run_pipeline
    from addresses_importer_spark.session import get_spark

    spark = get_spark(app_name=f"scaling-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    clips = spark.read.parquet(CORPUS)
    n = clips.count()
    # warm the page cache identically for every measurement (the corpus
    # is GBs; first-touch disk reads would bias whichever run goes first)
    from pyspark.sql import functions as F
    clips.select(F.sum(F.length("bytes"))).collect()
    # JIT/codegen warmup: run the full pipeline once on a small slice
    # and discard it. Each measurement is a fresh JVM; without warmup,
    # 30-60 s of interpreter/C2-compilation time lands in every leg as
    # a core-independent constant (real executors are long-lived and
    # warm, so the cold-JVM tax is a local-mode artifact).
    # pid-suffixed checkpoint dirs: a debug/manual leg racing a
    # protocol leg over a SHARED ckpt dir cross-contaminates both
    # pipelines' manifests (observed round 4: two concurrent --one 2
    # runs produced 22,660 survivors instead of 299,060 — each leg
    # resumed/overwrote the other's stages mid-flight)
    warm_ckpt = f"{_BASE}/ckpt_warm_{cores}_{os.getpid()}"
    ckpt = f"{_BASE}/ckpt_{cores}_{os.getpid()}"
    try:
        shutil.rmtree(warm_ckpt, ignore_errors=True)
        warm = run_pipeline(spark, clips.limit(4000), DedupConfig(), warm_ckpt)
        warm.survivors.count()
        shutil.rmtree(warm_ckpt, ignore_errors=True)

        t0 = time.time()
        res = run_pipeline(spark, clips, DedupConfig(), ckpt)
        n_surv = res.survivors.count()
        wall = time.time() - t0
    finally:
        shutil.rmtree(warm_ckpt, ignore_errors=True)
        # survivors/metrics are already counted into plain values; the
        # stage parquet is dead weight in /dev/shm after the leg
        shutil.rmtree(ckpt, ignore_errors=True)
    print(json.dumps({
        "cores": cores, "clips": n, "survivors": n_surv,
        "wall_sec": round(wall, 2),
        "clips_per_sec": round(n / wall, 2),
        # per-stage walls ride along so every scaling rep doubles as a
        # which-stage-stops-scaling profile (Amdahl diagnosis)
        "stage_sec": {k[4:]: round(v, 2) for k, v in res.metrics.items()
                      if k.startswith("sec:")},
    }))
    spark.stop()


def ensure_corpus() -> None:
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    from addresses_importer_spark.datagen import synth_corpus
    from addresses_importer_spark.session import get_spark

    spark = get_spark(app_name="scaling-gen", cores=16)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)
    synth_corpus(spark, n_base=N_BASE, dup_fraction=0.3, partitions=64).write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()


def load_existing() -> list[dict]:
    """Reps already recorded by a previous (crashed / budget-killed) run
    of THIS protocol version. Resume exists because each rep costs ~35
    min of legs; losing a valid rep to a session crash (round 5: the
    harness died mid-rep1 and took the tmux server with it) must not
    discard rep0. Only reps with the ABBA `runs` lists are loadable —
    pre-ABBA formats are a different protocol and are never mixed in."""
    if not os.path.exists("SCALING.json"):
        return []
    with open("SCALING.json") as f:
        reps = json.load(f).get("reps", [])
    ok = []
    for r in reps:
        legs = r.get("legs", {})
        if r.get("skipped_gate") or all(
            isinstance(leg, dict) and "runs" in leg for leg in legs.values()
        ):
            ok.append(r)
    return ok


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]))
        return
    resume = "--resume" in sys.argv[1:]

    ensure_corpus()
    # The sandbox VM's deliverable throughput swings +-40% minute to
    # minute (noisy neighbors; pure-numpy pools measured 3.3 -> 2.0
    # units/s across an hour at fixed proc count — and in the worst
    # windows an 8-thread run measures barely FASTER than a 2-thread
    # run: the host simply refuses to deliver 8 simultaneous cores).
    # Two defenses: (1) interleave the legs and take per-rep ratios /
    # per-leg medians; (2) gate each rep's WHOLE WINDOW on a HARDWARE
    # CONTROL (bench_hw_control: pure numpy-FFT process pool, zero
    # Spark) — a rep only starts once the host demonstrates a 2->8
    # ceiling >= SCALING_GATE, and the control is re-measured AFTER the
    # legs: a rep is valid only if both ends pass. The pre-only gate
    # measured reps whose 8-core leg the host throttled MID-rep
    # (controls 0.983/1.048 before, legs 2x slower than clean-window
    # reps — the noise arrived after the gate). A failed window
    # measures the host, not the engine; invalid reps are recorded,
    # never counted. Engine efficiency is only meaningful relative to
    # what the hardware delivered across the same window.
    # ODD valid-rep count by default: with an even count any "median"
    # is a choice between two order statistics, and round 3's upper-
    # middle pick was exactly the difference between pass and fail
    # (VERDICT r3 #1). Odd count + statistics.median leaves no choice.
    reps = int(os.environ.get("SCALING_REPS", "5"))
    gate = float(os.environ.get("SCALING_GATE", "0.85"))
    # a control ABOVE this band is as invalid as one below the gate: a
    # 2->8 control "efficiency" of e.g. 1.67 can only mean the control's
    # own 2-proc leg was throttled (super-linear core scaling does not
    # exist) — the window is junk, not extra-clean
    gate_hi = float(os.environ.get("SCALING_GATE_HI", "1.2"))
    gate_tries = int(os.environ.get("SCALING_GATE_TRIES", "15"))
    # ABBA reps are ~2x the legs of an AB rep, so bound total attempts
    # tighter than r3's reps*3 (wall budget, not statistics)
    max_attempts = int(os.environ.get("SCALING_MAX_ATTEMPTS", str(reps + 3)))
    from bench_hw_control import measure as hw_measure

    def control_eff() -> float:
        lo_t, hi_t = hw_measure(CORES[0]), hw_measure(CORES[1])
        return round((hi_t / lo_t) / (CORES[1] / CORES[0]), 3)

    def ctl_ok(c: float) -> bool:
        return gate <= c <= gate_hi

    lo, hi = CORES
    all_reps: list[dict] = load_existing() if resume else []
    if all_reps:
        print(f"resuming: {len(all_reps)} recorded reps "
              f"({sum(r['valid'] for r in all_reps)} valid) loaded from "
              f"SCALING.json")

    def write_snapshot() -> None:
        """Summarize + persist after EVERY rep: a wall-clock budget or
        crash must never lose the completed reps (round-4 lesson — the
        r3 protocol only wrote SCALING.json at the very end)."""
        summary = summarize(all_reps, reps, gate, gate_hi)
        if summary is not None:
            print(json.dumps(summary))
            with open("SCALING.json", "w") as f:
                json.dump({"reps": all_reps, "summary": summary}, f, indent=2)

    # resumed reps spend attempt budget too: the stopping rule is about
    # total protocol cost, not cost-since-last-crash
    attempt = len(all_reps)
    while sum(r["valid"] for r in all_reps) < reps and attempt < max_attempts:
        r = attempt
        attempt += 1
        ctl = control_eff()
        for _ in range(gate_tries):
            if ctl_ok(ctl):
                break
            print(f"rep{r} gate: hw control {ctl} outside [{gate}, {gate_hi}], "
                  f"host busy; waiting")
            time.sleep(45)
            ctl = control_eff()
        if not ctl_ok(ctl):
            # the gate never passed: the window is already known-invalid,
            # so running ~30 min of Spark legs inside it would only
            # measure the host (ADVICE r3). Count the attempt and move on.
            print(f"rep{r} SKIPPED: hw control {ctl} never entered "
                  f"[{gate}, {gate_hi}] after {gate_tries} tries")
            all_reps.append({
                "legs": {}, "hw_control_before": ctl, "hw_control_after": None,
                "efficiency": None, "valid": False, "skipped_gate": True,
            })
            write_snapshot()
            continue
        print(f"rep{r} hw_control_eff_before {ctl}")
        # ABBA leg ordering (lo, hi, hi, lo): any linear host-speed
        # drift across the rep window hits the lo and hi legs with the
        # same average weight, so the per-rep ratio of geometric means
        # cancels it to first order. A plain AB rep aliases drift
        # directly into the efficiency (BENCH.md r3 named this as the
        # next refinement; VERDICT r3 task #1 requires it).
        runs: list[dict] = []
        for cores in (lo, hi, hi, lo):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(cores)],
                capture_output=True, text=True, timeout=3600,
            )
            json_lines = [ln for ln in out.stdout.splitlines()
                          if ln.startswith("{")]
            if not json_lines:
                # surface the subprocess failure instead of a bare
                # IndexError (round-4 crash: stderr was swallowed)
                sys.stderr.write(out.stderr[-4000:])
                raise RuntimeError(
                    f"leg local[{cores}] produced no JSON (rc={out.returncode})"
                )
            line = json_lines[-1]
            runs.append(json.loads(line))
            print(f"rep{r} {line}")
        ctl_after = control_eff()

        def gm_tp(cores: int) -> float:
            vals = [run["clips_per_sec"] for run in runs if run["cores"] == cores]
            return math.exp(sum(math.log(v) for v in vals) / len(vals))

        eff_r = (gm_tp(hi) / gm_tp(lo)) / (hi / lo)
        # identical input + config must yield identical survivors across
        # all four legs; a divergent leg means cross-contaminated or
        # corrupt state (observed round 4: two runs racing one shared
        # checkpoint dir produced 22,660 vs 299,060) and its throughput
        # is meaningless — the rep is invalid regardless of the hw gate
        # (ADVICE r4).
        survivor_sets = {run["survivors"] for run in runs}
        survivors_consistent = len(survivor_sets) == 1
        if not survivors_consistent:
            print(f"rep{r} INVALID: legs disagree on survivors "
                  f"{sorted(survivor_sets)} — identical input+config must "
                  f"be byte-identical")
        rep = {
            "legs": {c: {
                "cores": c,
                "clips": runs[0]["clips"],
                "survivors": [run["survivors"] for run in runs
                              if run["cores"] == c][0],
                "runs": [run for run in runs if run["cores"] == c],
                "clips_per_sec_gm": round(gm_tp(c), 2),
            } for c in CORES},
            "hw_control_before": ctl,
            "hw_control_after": ctl_after,
            "efficiency": round(eff_r, 3),
            "survivors_consistent": survivors_consistent,
            "valid": ctl_ok(ctl) and ctl_ok(ctl_after) and survivors_consistent,
        }
        all_reps.append(rep)
        print(f"rep{r} hw_control_eff_after {ctl_after} "
              f"eff {rep['efficiency']} valid {rep['valid']}")
        write_snapshot()

    if not any(r["legs"] for r in all_reps):
        print("no reps ran (gate never passed); nothing to summarize")


def summarize(all_reps: list[dict], reps: int,
              gate: float, gate_hi: float) -> dict | None:
    # conventional (interpolated) median — round 3's sorted(v)[n//2] was
    # the UPPER median, the most favorable order statistic that can be
    # called "median" on an even count, and it flipped a 0.777 into a
    # 0.803 (VERDICT r3 #1). statistics.median leaves no such choice.
    median = statistics.median
    lo, hi = CORES

    valid_reps = [r for r in all_reps if r["valid"]]
    counted = valid_reps or [r for r in all_reps if r["legs"]]
    if not counted:
        return None
    # Pre-registered stopping rule (VERDICT r4 #8): the protocol's
    # deliverable is a median over >= `reps` VALID gated reps. If the
    # wall budget exhausts first, the honest output is
    # "insufficient_valid_reps" and NO efficiency median at all — a
    # 3-of-5 median is an under-powered number wearing the protocol's
    # clothes (round 4 summarized anyway; this encodes the fix).
    sufficient = len(valid_reps) >= reps
    # legs dicts round-trip through json with string keys
    def leg(r, c):
        return r["legs"].get(c) or r["legs"][str(c)]
    tp = {c: round(median([leg(r, c)["clips_per_sec_gm"] for r in counted]), 2)
          for c in CORES}
    wall = {c: round(median([run["wall_sec"] for r in counted
                             for run in leg(r, c)["runs"]]), 2)
            for c in CORES}
    # efficiency per rep, then median: the four ABBA legs of one rep run
    # back-to-back, so host drift (which moves slower than a rep) is
    # cancelled within the rep, unlike a ratio of cross-rep medians
    eff = round(median([r["efficiency"] for r in counted]), 3)
    summary = {
        "status": "ok" if sufficient else "insufficient_valid_reps",
        "protocol": (
            f"local[{lo}] vs local[{hi}], identical input+config, fresh JVM "
            f"per leg; ABBA leg order ({lo},{hi},{hi},{lo}) per rep with "
            f"per-parallelism geometric means (cancels linear host drift "
            f"within a rep); each rep's window gated on a hardware control "
            f"(pure numpy process pool, zero Spark) in [{gate}, {gate_hi}] "
            f"both BEFORE and AFTER its legs; CONVENTIONAL interpolated "
            f"median (statistics.median) over the {len(valid_reps)} valid "
            f"of {len(all_reps)} attempted reps (invalid reps recorded "
            f"below, never counted)"
        ),
        "estimator": "statistics.median over per-rep ABBA efficiencies",
        "clips": leg(counted[0], lo)["clips"],
        f"throughput_local{lo}": tp[lo],
        f"throughput_local{hi}": tp[hi],
        f"wall_local{lo}_sec": wall[lo],
        f"wall_local{hi}_sec": wall[hi],
        "per_rep_efficiency": [r["efficiency"] for r in counted],
        "per_rep_hw_control": [
            [r["hw_control_before"], r["hw_control_after"]] for r in counted
        ],
        "invalid_reps": [
            {"efficiency": r["efficiency"],
             "hw_control": [r["hw_control_before"], r["hw_control_after"]]}
            for r in all_reps if not r["valid"]
        ],
        "valid_rep_count": len(valid_reps),
        "target_valid_reps": reps,
        # the contract median exists ONLY when the protocol completed;
        # provisional_efficiency carries the running number for mid-run
        # snapshots and diagnostics, explicitly labeled non-contractual
        "scaling_efficiency": eff if sufficient else None,
        "provisional_efficiency": eff,
        "target": 0.8,
        "meets_target": (sufficient and eff >= 0.8) if sufficient else None,
    }
    return summary


if __name__ == "__main__":
    main()
