"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax import anywhere in the test process. Force CPU even
# if the environment points at real TPU hardware — tests exercise logic and
# multi-device sharding on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU plugin (JAX_PLATFORMS=axon in the session env) wins over the
# env var; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from coala_gnn_tpu.graph.datasets import synthetic_graph


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (reference-scale or multi-epoch)")


@pytest.fixture(scope="session")
def small_dataset():
    return synthetic_graph(num_nodes=2000, avg_degree=10, feature_dim=32,
                           num_classes=8, seed=7)


@pytest.fixture(scope="session")
def tiny_dataset():
    return synthetic_graph(num_nodes=300, avg_degree=6, feature_dim=16,
                           num_classes=4, seed=3)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
