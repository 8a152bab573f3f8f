"""Pallas kernel correctness vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.ops.matching import hamming_matrix
from mageslam_tpu.ops.pallas_kernels import hamming_matrix_pallas


class TestPallasHamming:
    def test_matches_reference(self, rng):
        a = jnp.asarray(rng.randint(0, 2**31, (200, 8)).astype(np.uint32))
        b = jnp.asarray(rng.randint(0, 2**31, (300, 8)).astype(np.uint32))
        ref = np.array(hamming_matrix(a, b))
        out = np.array(hamming_matrix_pallas(a, b, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_tile_boundary_sizes(self, rng):
        # exactly one block, and one element over a block boundary
        for n, m in [(128, 256), (129, 257), (1, 1)]:
            a = jnp.asarray(rng.randint(0, 2**31, (n, 8)).astype(np.uint32))
            b = jnp.asarray(rng.randint(0, 2**31, (m, 8)).astype(np.uint32))
            ref = np.array(hamming_matrix(a, b))
            out = np.array(hamming_matrix_pallas(a, b, interpret=True))
            np.testing.assert_array_equal(out, ref)
