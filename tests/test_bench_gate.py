"""bench.py device-availability gate: the driver runs bench.py at round
end; if the remote TPU tunnel is down (observed hour-plus outages where
backend init hangs indefinitely), the gate must probe in subprocesses,
retry, and give up with exit 1 instead of hanging the whole run."""
import subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as mod

    yield mod
    sys.path.remove("/root/repo")


def test_gate_skips_on_forced_cpu(bench, monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe must not run under forced CPU")

    monkeypatch.setattr(subprocess, "run", boom)
    bench.wait_for_backend()  # returns immediately


def test_gate_skips_on_env_flag(bench, monkeypatch):
    monkeypatch.setenv("BENCH_SKIP_GATE", "1")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("no probe")),
    )
    bench.wait_for_backend()


def test_gate_passes_on_healthy_probe(bench, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("BENCH_SKIP_GATE", raising=False)
    calls = []

    def ok(cmd, **kw):
        calls.append(cmd)
        return types.SimpleNamespace(returncode=0, stderr="")

    monkeypatch.setattr(subprocess, "run", ok)
    bench.wait_for_backend()
    assert len(calls) == 1


def test_gate_retries_then_gives_up(bench, monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("BENCH_SKIP_GATE", raising=False)
    # deadline in the past after the first failed probe; sleep disabled
    monkeypatch.setenv("BENCH_WAIT_S", "0")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    attempts = []

    def down(cmd, **kw):
        attempts.append(cmd)
        return types.SimpleNamespace(
            returncode=1,
            stderr="RuntimeError: Unable to initialize backend 'axon': "
                   "UNAVAILABLE: TPU backend setup/compile error",
        )

    monkeypatch.setattr(subprocess, "run", down)
    with pytest.raises(SystemExit) as ei:
        bench.wait_for_backend()
    assert ei.value.code == 1
    assert len(attempts) >= 1


def test_gate_handles_probe_hang(bench, monkeypatch):
    """A hung init manifests as subprocess timeout, not a returncode."""
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("BENCH_SKIP_GATE", raising=False)
    monkeypatch.setenv("BENCH_WAIT_S", "0")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def hang(cmd, timeout=None, **kw):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as ei:
        bench.wait_for_backend()
    assert ei.value.code == 1
