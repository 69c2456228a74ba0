"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware (the fake-backend
strategy from SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def torch_cpu_patch():
    """Make the reference repo's hard-coded ``.cuda()`` calls no-ops so the
    genuine reference modules run on CPU (SURVEY.md §2.3 notes they are
    CPU-hostile).  Also exposes ``/root/reference`` on sys.path."""
    import sys
    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    orig_tensor_cuda = torch.Tensor.cuda
    orig_module_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    yield
    torch.Tensor.cuda = orig_tensor_cuda
    torch.nn.Module.cuda = orig_module_cuda
