"""Workload scan + shard balancing of the batch asset-generation CLI
(reference hunyuan_Gen.py:98,126-137,180): every --skip'th frame of each clip
becomes a job; shards balance by clip frame count, greedy heaviest-first."""

import os
import sys

sys.path.insert(0, "scripts")

from generate_assets import greedy_shards, scan_jobs  # noqa: E402


def _make_clips(tmp_path, spec):
    for name, n in spec:
        d = tmp_path / f"{name}_processed" / "masked_rgb"
        d.mkdir(parents=True)
        for i in range(n):
            (d / f"{i:04d}.png").write_bytes(b"")


def test_scan_jobs_skip_selects_every_nth_frame(tmp_path):
    _make_clips(tmp_path, [("a", 5), ("b", 3), ("c", 1)])
    jobs = scan_jobs(str(tmp_path), skip=2)
    by_cost = {cost: paths for paths, cost in jobs}
    assert set(by_cost) == {5, 3, 1}
    assert [os.path.basename(p) for p in by_cost[5]] == \
        ["0000.png", "0002.png", "0004.png"]
    assert [os.path.basename(p) for p in by_cost[3]] == \
        ["0000.png", "0002.png"]
    assert [os.path.basename(p) for p in by_cost[1]] == ["0000.png"]


def test_scan_jobs_default_skip_is_first_frame_for_short_clips(tmp_path):
    _make_clips(tmp_path, [("a", 40)])
    (jobs,) = [scan_jobs(str(tmp_path), skip=256)]
    assert len(jobs) == 1 and len(jobs[0][0]) == 1  # frame 0 only


def test_greedy_shards_balance_with_tuple_items():
    items = [((f"clip{i}",), cost) for i, cost in
             enumerate([9, 7, 5, 3, 2, 1])]
    shards = greedy_shards(items, 2)
    # heaviest-first onto the lightest shard: loads 9+3+1=13 vs 7+5+2=14
    loads = [sum(c for item in s for (paths, c) in items if item == paths)
             for s in shards]
    assert sorted(loads) == [13, 14]
    assert sum(len(s) for s in shards) == len(items)
