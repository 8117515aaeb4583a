"""Block-resident branch-chain kernel (experimental/branch_chain.py):
the Pallas VMEM-resident k-block residual chain must match the XLA conv
chain it replaces, at every tested batch tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esa_pose_estimation_tpu.experimental import branch_chain as bc


@pytest.mark.parametrize('block_t', [1, 2])
def test_pallas_matches_xla(block_t):
    key = jax.random.PRNGKey(0)
    weights, biases = bc.make_test_chain(key, k=3, c=32)
    x = jax.random.normal(jax.random.fold_in(key, 1),
                          (4, 16, 16, 32)).astype(jnp.bfloat16)
    ref = bc.branch_chain_xla(x, weights, biases)
    out = bc.branch_chain_pallas(x, weights, biases, block_t=block_t)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
    # bf16 rounding aside, the two programs are the same arithmetic:
    # require near-exact agreement in f32
    xf = x.astype(jnp.float32)
    ref32 = bc.branch_chain_xla(xf, weights, biases)
    out32 = bc.branch_chain_pallas(xf, weights, biases, block_t=block_t)
    np.testing.assert_allclose(np.asarray(out32), np.asarray(ref32),
                               rtol=1e-4, atol=1e-5)


def test_zero_input_passes_bias_path():
    """x=0: block output is relu(conv(relu(b1)) + b2), a pure function of
    the biases — pins the bias add and residual wiring."""
    key = jax.random.PRNGKey(7)
    weights, biases = bc.make_test_chain(key, k=2, c=32)
    x = jnp.zeros((2, 8, 8, 32), jnp.float32)
    ref = bc.branch_chain_xla(x, weights, biases)
    out = bc.branch_chain_pallas(x, weights, biases, block_t=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(ref).max()) > 0  # the chain actually fired


def test_depth_one_is_single_block():
    key = jax.random.PRNGKey(3)
    weights, biases = bc.make_test_chain(key, k=1, c=32)
    x = jax.random.normal(jax.random.fold_in(key, 2),
                          (2, 8, 8, 32), jnp.float32)
    out = bc.branch_chain_pallas(x, weights, biases, block_t=2)
    ref = bc.branch_chain_xla(x, weights, biases)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
