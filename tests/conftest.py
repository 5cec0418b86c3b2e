"""Test env: 8 virtual CPU devices so DP-mesh paths are exercised without
TPU hardware (the JAX analogue of multi-device testing, SURVEY.md §4)."""

import os

# --xla_cpu_max_isa pins a portable CPU compile target so persistent-cache
# entries don't SIGILL on deserialize after a host change (see
# lctvqa/compile_cache.py).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           + " --xla_cpu_max_isa=AVX2")

import jax

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
# knob is honored. Must run before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Single-core host: persistent compilation cache makes repeated test runs
# skip XLA compiles entirely.
from lctvqa import compile_cache  # noqa: E402

compile_cache.enable()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_dir(tmp_path_factory):
    """Session-scoped synthetic mini VQA dataset."""
    from lctvqa.data.synthetic import make_dataset
    d = tmp_path_factory.mktemp("vqa_synth")
    make_dataset(str(d), num_images=8, num_questions=24, img_size=16,
                 n_answers=16)
    return str(d)


@pytest.fixture(scope="session")
def tiny_cfg():
    from lctvqa.config import small_test_config
    return small_test_config()
