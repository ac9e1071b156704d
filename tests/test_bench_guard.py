"""Units for bench.py's scaling-noise guard and the uid+pid-scoped
tmpfs scratch cleanup — pure-Python, no Spark session needed.

The guard exists because the driver's measurement of record
(BENCH_r{N}) runs in whatever host window it gets: round 4 recorded
16-CPU trials spread 46.2-98.2 s while a quiet re-run measured
36.1-36.8 s tight. A trial more than SPREAD_LIMIT x its level's
fastest trial measured the neighbors, not the code; the bench re-draws
such pairs and computes estimators over clean trials only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from crusty_spark import session as S  # noqa: E402


def test_clean_trial_mask_flags_spikes():
    # the round-4 record's 16-CPU trial bests: 46.2 .. 61.3 (+ a 98.2
    # epoch that best-of-2 absorbed). 61.3/46.2 = 1.33 < 1.4: clean.
    assert bench.clean_trial_mask([46.2, 53.6, 56.2, 61.3], 1.4) == [True] * 4
    # a genuine spike trial is flagged, the quiet ones kept
    assert bench.clean_trial_mask([36.1, 36.8, 98.2], 1.4) == [True, True, False]
    # all-equal and single-trial levels are trivially clean
    assert bench.clean_trial_mask([10.0], 1.4) == [True]
    assert bench.clean_trial_mask([], 1.4) == []


def test_poisoned_pair_indices_either_side():
    hi = [36.0, 36.5, 80.0]  # pair 2's hi leg spiked
    lo = [130.0, 300.0, 131.0]  # pair 1's lo leg spiked
    assert bench.poisoned_pair_indices(hi, lo, 1.4) == [1, 2]
    # a quiet window poisons nothing
    assert bench.poisoned_pair_indices([36.0, 37.0], [130.0, 135.0], 1.4) == []


def test_spike_on_one_leg_does_not_drag_median():
    # estimator semantics the bench relies on: the clean median ignores
    # the spiked trial, the all-trials median is still reported
    secs = [36.1, 36.5, 98.2]
    clean = [s for s, ok in zip(secs, bench.clean_trial_mask(secs)) if ok]
    assert bench.median(clean) == 36.3
    assert bench.median(secs) == 36.5


def test_median_even_and_odd():
    assert bench.median([3.0, 1.0, 2.0]) == 2.0
    assert bench.median([4.0, 1.0, 3.0, 2.0]) == 2.5


def test_levelbest_efficiency_marries_both_level_floors():
    # each level's fastest trial is its capability sample, regardless
    # of which pair it arrived in: a run whose quiet-lo pairs saw noisy
    # hi legs (and vice versa) still recovers floor/floor.
    hi = [41.0, 46.4, 60.8]  # floor 41.0
    lo = [172.1, 125.3, 187.3]  # floor 125.3
    got = bench.levelbest_efficiency(hi, lo, 4.0)
    assert abs(got - 125.3 / (4 * 41.0)) < 1e-9
    # degenerate: single clean trial per level
    assert bench.levelbest_efficiency([36.0], [124.0], 4.0) == 124.0 / 144.0


def test_scratch_dir_is_uid_and_pid_scoped():
    d = S.local_scratch_dir()
    assert f"crusty-spark-local-{os.getuid()}" in d
    assert d.endswith(str(os.getpid()))


def test_cleanup_reaps_only_dead_pid_dirs(tmp_path, monkeypatch):
    root = tmp_path / f"crusty-spark-local-{os.getuid()}"
    root.mkdir()
    # a dir named after a pid that cannot exist (> pid_max), one named
    # after OUR live pid, and one non-numeric (not ours to touch)
    dead = root / "999999999"
    alive = root / str(os.getpid())
    other = root / "not-a-pid"
    for p in (dead, alive, other):
        p.mkdir()
        (p / "blockmgr").mkdir()
    monkeypatch.setattr(S, "local_scratch_root", lambda: str(root))
    removed = S.cleanup_stale_scratch()
    assert removed == [str(dead)]
    assert not dead.exists()
    assert alive.exists() and other.exists()


def test_cleanup_missing_root_is_noop(monkeypatch):
    monkeypatch.setattr(S, "local_scratch_root", lambda: "/nonexistent/nowhere")
    assert S.cleanup_stale_scratch() == []


def test_cleanup_keeps_dead_pid_dir_with_live_writer(tmp_path, monkeypatch):
    """Orphan window: the Python driver died but its child JVM still
    holds files open inside the driver-pid-named dir — the dir must
    NOT be reaped until that writer exits."""
    root = tmp_path / f"crusty-spark-local-{os.getuid()}"
    root.mkdir()
    dead = root / "999999998"
    dead.mkdir()
    held = dead / "shuffle_0_0_0.data"
    monkeypatch.setattr(S, "local_scratch_root", lambda: str(root))
    with open(held, "w") as fh:
        fh.write("x")
        # THIS process plays the surviving JVM: it holds the fd open
        assert S.cleanup_stale_scratch() == []
        assert dead.exists()
    # writer gone: now eligible
    assert S.cleanup_stale_scratch() == [str(dead)]
    assert not dead.exists()
