"""Reference-API compat shim tests.

The reference's only Python surface is ``run_mmad_custom / run_mmad_rtc /
run_mmad_bench`` over torch tensors (``framework/deep_gemm_ascend/
__init__.py:1-5``, ``python_api.cpp:30-36``; exercised by
``framework/tests/test.py:80`` and ``bench_main.py:126``). These tests pin
the drop-in contract: same call shapes, torch and JAX inputs, in-place ``z``
semantics, and the bench-params tiling knob mapping
(``gemm_bench.hpp:52-57``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgemm_ascend_tpu import compat


@pytest.fixture
def problem(rng):
    a = rng.normal(size=(64, 96)).astype(np.float32)
    b = rng.normal(size=(96, 128)).astype(np.float32)
    return a, b, a @ b


def test_run_mmad_rtc_jax(problem):
    a, b, ref = problem
    out = compat.run_mmad_rtc(jnp.asarray(a, jnp.bfloat16),
                              jnp.asarray(b, jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=1e-1)


def test_run_mmad_custom_batched(rng):
    a = rng.normal(size=(2, 32, 48)).astype(np.float32)
    b = rng.normal(size=(2, 48, 64)).astype(np.float32)
    out = compat.run_mmad_custom(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-3, atol=1e-3)


def test_run_mmad_rtc_torch_inputs(problem):
    torch = pytest.importorskip("torch")
    a, b, ref = problem
    out = compat.run_mmad_rtc(torch.from_numpy(a), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_run_mmad_rtc_torch_out_buffer_inplace(problem):
    torch = pytest.importorskip("torch")
    a, b, ref = problem
    z = torch.zeros((64, 128), dtype=torch.float32)
    got = compat.run_mmad_rtc(torch.from_numpy(a), torch.from_numpy(b), z)
    assert got is z  # true in-place semantics, like the reference binding
    np.testing.assert_allclose(z.numpy(), ref, rtol=1e-3, atol=1e-3)


def test_run_mmad_bench_params_mapping(problem):
    a, b, ref = problem
    # (m_sections, n_sections, m_sec_blocks, n_sec_blocks, k_iter, db)
    params = np.asarray([1, 1, 4, 8, 6, 2], np.int64)
    out = compat.run_mmad_bench(jnp.asarray(a), jnp.asarray(b),
                                params=params)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_run_mmad_bench_torch_params(problem):
    torch = pytest.importorskip("torch")
    a, b, ref = problem
    params = torch.tensor([1, 1, 4, 8, 6, 2])
    out = compat.run_mmad_bench(torch.from_numpy(a), torch.from_numpy(b),
                                params=params)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_output_buffer_shape_mismatch_raises(problem):
    a, b, _ = problem
    z = jnp.zeros((64, 64), jnp.float32)  # wrong N
    with pytest.raises(ValueError):
        compat.run_mmad_rtc(jnp.asarray(a), jnp.asarray(b), z)
