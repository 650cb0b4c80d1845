"""bench.py contract pins: the headline set must stay a subset of the
declared registry (a renamed query would silently drop out of the
timed set), and the r17 load gate must not wait on a quiet machine."""

from __future__ import annotations

import __spark_entry__ as entry
import bench


def test_headline_queries_are_declared():
    qs, _ = entry._registry()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, (
        f"bench.py HEADLINE entries not in the registry: {missing}")
    assert set(bench.SMALL_OUTPUT) & set(bench.HEADLINE) <= set(qs)


def test_mem_epoch_marker_present():
    """VERDICT r17 item 8: the artifact carries a page-cache epoch
    marker (MemAvailable/Cached in MiB) so a reader can distinguish a
    cache-cold pass from engine drift. On Linux both fields must
    exist and be positive; elsewhere the marker is an empty dict."""
    import platform

    epoch = bench._mem_epoch()
    if platform.system() == "Linux":
        assert epoch.get("memavailable_mib", 0) > 0
        assert epoch.get("cached_mib", 0) > 0
    else:
        assert epoch == {}


def test_wait_for_quiet_no_wait_when_quiet():
    # threshold far above any real loadavg -> returns without sleeping
    assert bench._wait_for_quiet(threshold=1e9, max_wait=300) == 0.0


def test_wait_for_quiet_bounded_by_max_wait(monkeypatch):
    # loadavg pinned above threshold -> waits exactly to the cap,
    # sleeping in steps (sleep patched out so the test is instant)
    import os
    import time

    slept = []
    monkeypatch.setattr(os, "getloadavg", lambda: (99.0, 99.0, 99.0))
    monkeypatch.setattr(time, "sleep", lambda s: slept.append(s))
    waited = bench._wait_for_quiet(threshold=1.5, max_wait=45)
    assert waited == 50.0  # 5 steps of 10 s; first check past 45 stops
    assert slept == [10.0] * 5
