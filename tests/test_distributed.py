"""init_distributed contract tests — env-var parsing and the
single-host no-op (the code path that first runs on a real pod; the
reference's equivalent boundary is Accelerate's process-group init,
train_unziplora.py:1129-1139). jax.distributed.initialize is
monkeypatched: actually initializing would block on a coordinator."""
import jax

from video_style_transfer_tpu.parallel.distributed import init_distributed

_ENV_VARS = ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
             "JAX_PROCESS_ID")


def _patch(monkeypatch):
    calls = []

    def fake_initialize(*args, **kwargs):
        calls.append((args, kwargs))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    for var in _ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    return calls


def test_single_host_noop(monkeypatch):
    calls = _patch(monkeypatch)
    assert init_distributed() is False
    assert calls == []


def test_num_processes_one_is_noop(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert init_distributed() is False
    assert calls == []


def test_env_var_parsing(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert init_distributed() is True
    assert calls == [((), {"coordinator_address": "10.0.0.1:1234",
                           "num_processes": 4, "process_id": 2})]


def test_explicit_args_take_precedence(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "env-host:1")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "8")
    monkeypatch.setenv("JAX_PROCESS_ID", "7")
    assert init_distributed("arg-host:2", 2, 0) is True
    assert calls == [((), {"coordinator_address": "arg-host:2",
                           "num_processes": 2, "process_id": 0})]


def test_auto_requests_pod_metadata_detection(monkeypatch):
    calls = _patch(monkeypatch)
    assert init_distributed(auto=True) is True
    # bare initialize() = Cloud TPU pod metadata auto-population
    assert calls == [((), {})]


def test_auto_defers_to_explicit_topology(monkeypatch):
    calls = _patch(monkeypatch)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.2:99")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "2")
    monkeypatch.setenv("JAX_PROCESS_ID", "1")
    assert init_distributed(auto=True) is True
    assert calls == [((), {"coordinator_address": "10.0.0.2:99",
                           "num_processes": 2, "process_id": 1})]
