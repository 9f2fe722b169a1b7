"""Daemon hygiene: per-key engine-build locks and live-quorum pruning.

Round-3 review findings (VERDICT weak #5): (a) the engine cache held ONE
global lock across a full build+XLA-compile, so every eval-batch job — even
pure cache hits — queued behind any cold compile; (b) the coalescer's
``_last_seen`` map grew unboundedly and disconnected clients inflated the
tick quorum for the 1 s liveness horizon.  These tests pin the fixes at the
unit level (the mechanisms, with stubbed builds — the real daemon paths are
exercised end-to-end by test_native_daemon/test_daemon_concurrent)."""

import threading
import time

from dragposer_tpu.runtime import server


def _reset_cache():
    with server._engines_lock:
        server._engines.clear()
        server._engine_builds.clear()
        server._eval_stats["building"] = []


def test_warm_key_returns_while_cold_key_builds():
    """A job with a WARM engine key must complete while another key's cold
    build is still in progress (per-key locks, not one global lock)."""
    _reset_cache()
    server.engine_cache_get("warm", lambda: "warm-engine")

    cold_started = threading.Event()
    cold_release = threading.Event()

    def cold_build():
        cold_started.set()
        assert cold_release.wait(timeout=30)
        return "cold-engine"

    t = threading.Thread(
        target=lambda: server.engine_cache_get("cold", cold_build))
    t.start()
    assert cold_started.wait(timeout=10)
    # cold build is mid-compile NOW; the warm key must not queue behind it
    t0 = time.monotonic()
    assert server.engine_cache_get("warm", lambda: "never") == "warm-engine"
    assert time.monotonic() - t0 < 5.0
    # in-flight builds are surfaced for observability (OP_STATS "building")
    with server._engines_lock:
        assert any("cold" in k for k in server._eval_stats["building"])
    cold_release.set()
    t.join(timeout=30)
    with server._engines_lock:
        assert server._engines["cold"] == "cold-engine"
        assert server._eval_stats["building"] == []


def test_same_cold_key_builds_once():
    """Two jobs racing the same cold key serialize on ITS lock and the
    build function runs exactly once."""
    _reset_cache()
    calls = []

    def build():
        calls.append(1)
        time.sleep(0.1)
        return "engine"

    results = []
    ts = [threading.Thread(
        target=lambda: results.append(server.engine_cache_get("k", build)))
        for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=30)
    assert results == ["engine"] * 4
    assert len(calls) == 1


def test_failed_build_clears_in_flight_marker():
    _reset_cache()

    def boom():
        raise RuntimeError("compile failed")

    try:
        server.engine_cache_get("bad", boom)
    except RuntimeError:
        pass
    with server._engines_lock:
        assert server._eval_stats["building"] == []
        assert "bad" not in server._engines


class _FakeSession:
    """Stands in for RealtimeSession in quorum bookkeeping tests."""


def test_coalescer_forget_removes_quorum_entry():
    c = server.DragCoalescer(window_s=0.0)
    s1, s2 = _FakeSession(), _FakeSession()
    now = time.monotonic()
    with c._cv:
        c._last_seen[id(s1)] = now
        c._last_seen[id(s2)] = now
    c.forget(s1)
    assert id(s1) not in c._last_seen
    assert id(s2) in c._last_seen
    c.forget(s1)  # idempotent


def test_coalescer_prunes_stale_sessions(monkeypatch):
    """Entries idle past the 60 s horizon are dropped on the next drag()
    bookkeeping pass — the map is bounded by the live client count, not
    daemon lifetime."""
    c = server.DragCoalescer(window_s=0.0)
    stale, live = _FakeSession(), _FakeSession()
    now = time.monotonic()
    with c._cv:
        c._last_seen[id(stale)] = now - 120.0
        c._last_seen[id(live)] = now - 0.5

    # drive just the bookkeeping prologue of drag(): patch _execute to a
    # no-op so no engine is needed
    monkeypatch.setattr(c, "_execute", lambda batch: [
        setattr(r, "result", b"") for r in batch])
    me = _FakeSession()
    me._state = object()
    c.drag(me, None, None)
    assert id(stale) not in c._last_seen
    assert id(live) in c._last_seen
    assert id(me) in c._last_seen
