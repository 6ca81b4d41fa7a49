"""maybe_initialize_distributed: the multi-host pod launch hook
(deploy/launch_pod.sh). jax.distributed.initialize is mocked — the detection
logic and argument plumbing are what's under test (a real pod is not
available; SURVEY.md §5.8)."""

import jax
import pytest

from delivr_cfos_tpu.parallel.mesh import maybe_initialize_distributed


@pytest.fixture()
def init_spy(monkeypatch):
    calls = []

    def fake_initialize(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    return calls


def test_no_env_no_init(init_spy):
    assert maybe_initialize_distributed(env={}) is False
    assert init_spy == []


def test_single_worker_hostnames_no_init(init_spy):
    env = {"TPU_WORKER_HOSTNAMES": "host0"}
    assert maybe_initialize_distributed(env=env) is False
    assert init_spy == []


def test_multi_worker_hostnames_auto_init(init_spy):
    env = {"TPU_WORKER_HOSTNAMES": "host0,host1"}
    assert maybe_initialize_distributed(env=env) is True
    assert init_spy == [{}]  # automatic TPU discovery (no explicit args)


def test_megascale_coordinator_auto_init(init_spy):
    env = {"MEGASCALE_COORDINATOR_ADDRESS": "host0:1234"}
    assert maybe_initialize_distributed(env=env) is True
    assert init_spy == [{}]


def test_disabled_overrides_pod_env(init_spy):
    env = {
        "DELIVR_DISTRIBUTED": "0",
        "TPU_WORKER_HOSTNAMES": "host0,host1",
    }
    assert maybe_initialize_distributed(env=env) is False
    assert init_spy == []


def test_forced_init(init_spy):
    env = {"DELIVR_DISTRIBUTED": "1"}
    assert maybe_initialize_distributed(env=env) is True
    assert init_spy == [{}]


def test_explicit_coordinator_args(init_spy):
    env = {
        "DELIVR_COORDINATOR": "10.0.0.2:8476",
        "DELIVR_NUM_PROCESSES": "4",
        "DELIVR_PROCESS_ID": "3",
    }
    assert maybe_initialize_distributed(env=env) is True
    assert init_spy == [
        {
            "coordinator_address": "10.0.0.2:8476",
            "num_processes": 4,
            "process_id": 3,
        }
    ]
