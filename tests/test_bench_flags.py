"""bench.py's contention self-flag (r10 verdict item 3): the old
steady-tail max/min spread criterion fired on every run — including
fully idle ones — because single canary samples landing beside a heavy
query's GC routinely spike 2-3×. The replacement must DISCRIMINATE:
an idle-profile series (warm-up ramp + spiky-but-stable tail) passes;
sustained load at start, load arriving mid-run, and warm-up-window
contention each flag. No Spark needed — the logic is a pure function."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CANARY_REF_SEC, compute_load_flags

# a real idle-host profile shape: JIT warm-up ramp over the first 5
# samples, then a steady ~0.16-0.20 tail with two GC-adjacent spikes
# (the exact pattern that made the old spread criterion useless —
# 0.527/0.152 = 3.5× "spread" on an idle box)
IDLE_SERIES = (
    [0.398, 0.359, 0.288, 0.225, 0.210]
    + [0.165, 0.172, 0.158, 0.527, 0.163, 0.170, 0.152, 0.168,
       0.161, 0.175, 0.166, 0.159, 0.490, 0.164, 0.171, 0.157,
       0.169, 0.162, 0.173, 0.160]
)


def test_idle_run_is_unflagged():
    out = compute_load_flags(0.2, 0.279, IDLE_SERIES)
    assert not out["flagged"], out
    # and the normalized interval stays tight: drift bounds ≤ 1.3×
    assert out["drift"] <= 1.3, out


def test_presession_load_flags():
    out = compute_load_flags(9.8, 0.279, IDLE_SERIES)
    assert out["flagged"] and out["load_start"]


def test_cold_canary_deviation_flags():
    # sustained contention at start: the cold canary itself slows
    out = compute_load_flags(0.2, 0.55, IDLE_SERIES)
    assert out["flagged"] and out["cold_dev"]


def test_midrun_load_flags_via_half_median_drift():
    # load arrives halfway through the battery: the tail's second
    # half sustains ~2.5× the first — medians diverge, single spikes
    # could never fake this
    loaded_tail = (
        [0.398, 0.359, 0.288, 0.225, 0.210]
        + [0.165, 0.172, 0.158, 0.163, 0.170, 0.152, 0.168, 0.161,
           0.175, 0.166]
        + [0.420, 0.445, 0.410, 0.460, 0.430, 0.415, 0.450, 0.425,
           0.440, 0.435]
    )
    out = compute_load_flags(0.2, 0.279, loaded_tail)
    assert out["flagged"] and out["midrun_drift"]
    assert out["drift"] > 1.35


def test_single_spike_does_not_fake_drift():
    # one 6× GC-adjacent sample in the second half: medians unmoved
    series = list(IDLE_SERIES)
    series[-3] = 1.0
    out = compute_load_flags(0.2, 0.279, series)
    assert not out["midrun_drift"]


def test_warmup_window_contention_flags():
    # contention confined to the warm-up window the tail excludes:
    # 3× the steady median is beyond any JIT ramp (~2.2× measured)
    series = [0.90, 0.80, 0.70, 0.30, 0.25] + IDLE_SERIES[5:]
    out = compute_load_flags(0.2, 0.279, series)
    assert out["flagged"] and out["early_contended"]


def test_flat_load_after_warmup_flags_via_midpoint_sample():
    """r11 verdict item 3 — the evasion window: load arrives right
    after warm-up and stays FLAT for the rest of the battery. Start
    samples were clean; both half-medians inflate equally so drift is
    ~1.0; the warm-up window itself was idle. Only the midpoint
    re-sample of the start criteria can see it."""
    # warm-up ramp clean, then a uniformly ~3x tail (flat contention)
    series = [0.398, 0.359, 0.288, 0.225, 0.210] + [0.48] * 25
    # old criteria alone: unflagged (the window)
    out = compute_load_flags(0.2, 0.279, series)
    assert not out["flagged"], out
    # midpoint min-of-3 canary sees the contention (> 1.5x the cold
    # reference even though the JVM is warm)
    out = compute_load_flags(0.2, 0.279, series, mid_canary=0.52)
    assert out["flagged"] and out["mid_dev"], out
    # or the midpoint load average does
    out = compute_load_flags(0.2, 0.279, series, load_mid1=11.0)
    assert out["flagged"] and out["load_mid"], out


def test_self_load_with_clean_mid_canary_does_not_flag():
    """r15 (VERDICT r14 item 9): the bench's own 32-thread bursts push
    the midpoint 1-min load average past LOAD_FLAG on a genuinely idle
    host (r14 final4: load 6.33, warm mid canary 0.235 — BELOW the
    cold idle reference, i.e. compute provably uncontended). load_mid
    must attribute that to self-load; the raw boolean stays visible."""
    out = compute_load_flags(
        0.2, 0.279, IDLE_SERIES, load_mid1=6.33, mid_canary=0.235
    )
    assert not out["flagged"], out
    assert not out["load_mid"]
    assert out["load_mid_raw"]  # the evidence is preserved, not erased


def test_high_mid_load_with_slowed_canary_still_flags():
    # genuine contention: high midpoint load AND a warm canary above
    # the cold reference (but under the 1.5x mid_dev threshold —
    # load_mid retains sensitivity in that band)
    out = compute_load_flags(
        0.2, 0.279, IDLE_SERIES, load_mid1=11.0, mid_canary=0.30
    )
    assert out["flagged"] and out["load_mid"], out
    assert not out["mid_dev"]


def test_high_mid_load_without_canary_sample_still_flags():
    # conservative default: no midpoint canary (pre-r11 artifact
    # replay) -> the load number stands un-attributed and flags
    out = compute_load_flags(0.2, 0.279, IDLE_SERIES, load_mid1=11.0)
    assert out["flagged"] and out["load_mid"]


def test_idle_run_with_midpoint_samples_stays_unflagged():
    # a warm midpoint canary on an idle host runs FASTER than the
    # cold reference — well under the 1.5x threshold
    out = compute_load_flags(
        0.2, 0.279, IDLE_SERIES, load_mid1=0.4, mid_canary=0.17
    )
    assert not out["flagged"], out


def test_reference_constant_unchanged():
    # the frozen cross-round anchor must never drift silently
    assert CANARY_REF_SEC == 0.250
