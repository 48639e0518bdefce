"""bench.py driver-loop logic: per-section subprocess retry/merge and the
tunnel probe-and-wait preamble (VERDICT r4 #1 — one tunnel drop must cost one
section one retry, not the artifact; BENCH_r04 lost 7 of 8 lines to exactly
this).  Pure host-side logic: subprocess + probe are stubbed, no TPU."""

import importlib.util
import os
import subprocess

import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # never actually sleep or probe in tests
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


class TestWaitForTunnel:
    def test_cpu_mode_short_circuits(self, bench, monkeypatch):
        monkeypatch.setenv("TISE_BENCH_CPU", "1")
        monkeypatch.setattr(
            bench, "_tunnel_alive", lambda *a, **k: pytest.fail("probed in CPU mode")
        )
        assert bench._wait_for_tunnel(max_wait=0.0) is True

    def test_returns_when_alive(self, bench, monkeypatch):
        monkeypatch.delenv("TISE_BENCH_CPU", raising=False)
        monkeypatch.setattr(bench, "_tunnel_alive", lambda *a, **k: True)
        assert bench._wait_for_tunnel(max_wait=0.0) is True

    def test_gives_up_after_budget(self, bench, monkeypatch):
        monkeypatch.delenv("TISE_BENCH_CPU", raising=False)
        calls = []
        monkeypatch.setattr(bench, "_tunnel_alive", lambda *a, **k: calls.append(1) or False)
        assert bench._wait_for_tunnel(max_wait=0.0, poll=0.0) is False
        assert len(calls) == 1  # budget 0: one probe, no spin


def _completed(rc, stdout=""):
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=stdout)


class TestDrive:
    def test_retry_after_drop_then_merge(self, bench, monkeypatch):
        """Section 'a' drops once (rc!=0) then succeeds; 'b' succeeds first
        try.  The merged line carries both fragments and the retry waited for
        the tunnel exactly once."""
        waits = []
        monkeypatch.setattr(bench, "_wait_for_tunnel", lambda max_wait, **k: waits.append(max_wait) or True)
        attempts = {"a": 0}

        def fake_run(argv, **kw):
            name = argv[argv.index("--section") + 1]
            if name == "a":
                attempts["a"] += 1
                if attempts["a"] == 1:
                    return _completed(1, "UNAVAILABLE: socket closed\n")
                return _completed(0, 'noise\n{"a_line": 1.5}\n')
            return _completed(0, '{"b_line": 2.5}\n')

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        monkeypatch.setattr(bench, "_SECTION_BUDGET", {})
        line = bench.drive(sections=("a", "b"))
        assert line["a_line"] == 1.5 and line["b_line"] == 2.5
        assert attempts["a"] == 2
        # preamble wait + one pre-retry wait
        assert len(waits) == 2

    def test_failed_section_does_not_sink_later_ones(self, bench, monkeypatch):
        monkeypatch.setattr(bench, "_wait_for_tunnel", lambda *a, **k: True)

        def fake_run(argv, **kw):
            name = argv[argv.index("--section") + 1]
            if name == "a":
                return _completed(1, "")
            return _completed(0, '{"b_line": 2.5}\n')

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        monkeypatch.setattr(bench, "_SECTION_BUDGET", {})
        line = bench.drive(sections=("a", "b"))
        assert "a_line" not in line and line["b_line"] == 2.5
        # the primary-metric keys exist even when extraction never produced them
        assert line["metric"] == "inception+clip_extraction_throughput"
        assert line["value"] == 0.0

    def test_timeout_counts_as_failed_attempt(self, bench, monkeypatch):
        monkeypatch.setattr(bench, "_wait_for_tunnel", lambda *a, **k: True)
        calls = []

        def fake_run(argv, timeout=None, **kw):
            calls.append(timeout)
            raise subprocess.TimeoutExpired(cmd=argv, timeout=timeout)

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        monkeypatch.setattr(bench, "_SECTION_BUDGET", {})
        line = bench.drive(sections=("a",))
        assert len(calls) == bench._DEFAULT_BUDGET[0]
        assert line["value"] == 0.0

    def test_unparseable_fragment_retries(self, bench, monkeypatch):
        monkeypatch.setattr(bench, "_wait_for_tunnel", lambda *a, **k: True)
        outs = iter(["not json\n", '{"a_line": 3.0}\n'])

        def fake_run(argv, **kw):
            return _completed(0, next(outs))

        monkeypatch.setattr(bench.subprocess, "run", fake_run)
        monkeypatch.setattr(bench, "_SECTION_BUDGET", {})
        assert bench.drive(sections=("a",))["a_line"] == 3.0
