"""Tests for bench.py's machine-contention guard (r7 verdict item 1).

Three consecutive official BENCH artifacts were recorded on a loaded box
(r7: load_avg_1m before=6.08 vs clean 0.26). The guard makes the artifact
self-defending: wait-and-retry while loaded, stamp ``contended`` if it
never clears.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.fixture()
def guard_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT_SEC", "0")
    monkeypatch.setenv("SPARK_GRAFT_LOAD_RETRIES", "3")


def test_quiet_machine_passes_first_attempt(guard_env, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOAD_THRESHOLD", "1e9")
    load, attempts, contended = bench.wait_for_quiet_machine()
    assert not contended
    assert len(attempts) == 1
    assert attempts[0] == round(load, 2)


def test_loaded_machine_retries_then_stamps_contended(guard_env, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOAD_THRESHOLD", "-1")  # never clears
    load, attempts, contended = bench.wait_for_quiet_machine()
    assert contended
    assert len(attempts) == 4  # 1 initial + 3 retries
    assert load == attempts[-1] or round(load, 2) == attempts[-1]


def test_load_clears_mid_retry(guard_env, monkeypatch):
    # loads: two contended samples, then quiet — guard must stop retrying
    # at the first quiet sample and report uncontended
    samples = iter([(9.0, 0, 0), (7.0, 0, 0), (0.2, 0, 0), (99.0, 0, 0)])
    monkeypatch.setenv("SPARK_GRAFT_LOAD_THRESHOLD", "1.5")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(samples))
    load, attempts, contended = bench.wait_for_quiet_machine()
    assert not contended
    assert attempts == [9.0, 7.0, 0.2]
    assert load == 0.2
