#!/usr/bin/env python
"""A/B timing of the LDE and leaf-hash kernels: MXU vs VPU paths.

Env knobs ZKL_NO_MXU_NTT / ZKL_NO_MXU_POSEIDON select the paths; this
script must be run once per configuration (jit caches are per-process):

  for a in 0 1; do for b in 0 1; do
    ZKL_NO_MXU_NTT=$a ZKL_NO_MXU_POSEIDON=$b python scripts/exp_kernel_ab.py
  done; done
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from zklisp_tpu.prove import kernels

    n, width, blowup = 4096, 219, 16
    N = n * blowup
    rng = np.random.default_rng(7)
    cols = rng.integers(0, 1 << 16, size=(width, n, 8), dtype=np.uint32)
    cols_d = jax.device_put(jnp.asarray(cols))

    lde_fn = kernels.lde_columns_fn(n, blowup)
    leaf_fn = kernels.leaf_hash_fn(width, 16)
    tree_fn = kernels.merkle_levels_fn(N)

    tag = (f"ntt={'vpu' if os.environ.get('ZKL_NO_MXU_NTT') else 'mxu'} "
           f"pos={'vpu' if os.environ.get('ZKL_NO_MXU_POSEIDON') else 'mxu'}")

    def force(x):
        return np.asarray(jax.device_get(x)).ravel()[-1]

    t0 = time.time()
    lde = lde_fn(cols_d)
    force(lde)
    c_lde = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        lde = lde_fn(cols_d)
        force(lde[:1, :1])
    t_lde = (time.time() - t0) / 3

    rows = jnp.transpose(lde, (1, 0, 2))
    chunk = 65536
    t0 = time.time()
    leaves = leaf_fn(rows[:chunk])
    force(leaves)
    c_leaf = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        leaves = leaf_fn(rows[:chunk])
        force(leaves[:1])
    t_leaf = (time.time() - t0) / 3

    t0 = time.time()
    levels = tree_fn(leaves)
    force(levels[-1])
    c_tree = time.time() - t0
    t0 = time.time()
    for _ in range(3):
        levels = tree_fn(leaves)
        force(levels[-1])
    t_tree = (time.time() - t0) / 3

    print(f"{tag}: lde={t_lde*1e3:.0f}ms leaf={t_leaf*1e3:.0f}ms "
          f"tree={t_tree*1e3:.0f}ms  (compiles {c_lde:.0f}/{c_leaf:.0f}/"
          f"{c_tree:.0f}s)")


if __name__ == "__main__":
    main()
